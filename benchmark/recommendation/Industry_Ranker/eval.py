import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import model  # noqa: F401  (registers MMoEDINDCNv2Ranker for reflective load)
from common import eval_model

if __name__ == "__main__":
    eval_model(os.path.dirname(os.path.abspath(__file__)), "ranker",
               labels=("effective_view", "long_view"))
