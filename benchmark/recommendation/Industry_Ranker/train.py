import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import train_ranker
from model import MMoEDINDCNv2Ranker

if __name__ == "__main__":
    train_ranker(MMoEDINDCNv2Ranker, os.path.dirname(os.path.abspath(__file__)),
                 labels=("effective_view", "long_view"))
