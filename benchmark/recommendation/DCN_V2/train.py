"""DCNv2 ranker training (parity: /root/reference/benchmark/recommendation/
DCN_V2/train.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
HERE = os.path.dirname(os.path.abspath(__file__))
from common import train_ranker
from nexus_tpu.training.reranker.recommendation import DCNv2Ranker

if __name__ == "__main__":
    train_ranker(DCNv2Ranker, HERE)
