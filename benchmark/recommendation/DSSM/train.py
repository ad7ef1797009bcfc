import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
HERE = os.path.dirname(os.path.abspath(__file__))
from common import train_retriever
from nexus_tpu.training.embedder.recommendation import DSSMInBatchRetriever

if __name__ == "__main__":
    train_retriever(DSSMInBatchRetriever, HERE)
