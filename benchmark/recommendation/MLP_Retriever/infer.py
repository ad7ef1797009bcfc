"""u2i serving round-trip (parity: benchmark .../infer.py + insert_redis.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
HERE = os.path.dirname(os.path.abspath(__file__))
from common import infer_retriever

if __name__ == "__main__":
    infer_retriever(HERE)
