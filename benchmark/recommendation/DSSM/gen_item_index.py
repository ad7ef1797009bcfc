"""Build + persist the IVF item index from the trained DSSM item vectors
(parity: benchmark/recommendation/DSSM/gen_fassis_index.py — Faiss
IndexIVFFlat replaced by the nexus_tpu TPU-native ItemIndex)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from nexus_tpu.inference.index import gen_item_index

CKPT = "/tmp/nexus_bench_ckpt/dssm"

if __name__ == "__main__":
    index = gen_item_index(
        os.path.join(CKPT, "item_vectors.npy"),
        index_path=os.path.join(CKPT, "item_ivf.index"),
        item_ids_path=os.path.join(CKPT, "item_ids.npy"),
        index_type="ivf", nlist=100, nprobe=10,
    )
    print("IVF index:", index.vectors.shape, "->", os.path.join(CKPT, "item_ivf.index"))
