import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
HERE = os.path.dirname(os.path.abspath(__file__))
from common import train_ranker
from nexus_tpu.training.reranker.recommendation import MLPRanker

if __name__ == "__main__":
    train_ranker(MLPRanker, HERE)
