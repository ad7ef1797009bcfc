import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
HERE = os.path.dirname(os.path.abspath(__file__))
from common import infer_ranker

if __name__ == "__main__":
    infer_ranker(HERE, labels=("effective_view", "long_view"))
