import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import model  # noqa: F401
from common import infer_ranker

if __name__ == "__main__":
    infer_ranker(os.path.dirname(os.path.abspath(__file__)),
                 labels=("effective_view", "long_view"))
