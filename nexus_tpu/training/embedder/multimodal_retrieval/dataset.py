"""Multimodal training data (parity: Nexus/training/embedder/
multimodal_retrieval/dataset.py): jsonl records whose query/pos/neg entries
are multimodal items (text + images/videos/pages); in-dataset negative
sampling when a record has no negatives.
"""

from __future__ import annotations

import math
import random
from typing import Dict, Iterator, List, Optional

import numpy as np

from nexus_tpu.modules.multimodal import (
    MultimodalProcessorAdapter,
    apply_instruction,
    normalize_multimodal_item,
)
from nexus_tpu.training.embedder.text_retrieval.dataset import _load_jsonl


class MultimodalEmbedderTrainDataset:
    def __init__(
        self,
        train_data: List[str],
        train_group_size: int = 4,
        media_root: Optional[str] = None,
        query_instruction: Optional[str] = None,
        seed: int = 42,
    ):
        import os

        paths = []
        for p in train_data:
            if os.path.isdir(p):
                paths += [os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".jsonl")]
            else:
                paths.append(p)
        self.records = [r for p in paths for r in _load_jsonl(p)]
        self.group_size = train_group_size
        self.media_root = media_root
        self.query_instruction = query_instruction
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        return len(self.records)

    def iter_groups(self, batch_size: int) -> Iterator[List[dict]]:
        rng = random.Random(self.seed + self.epoch)
        order = list(range(len(self.records)))
        rng.shuffle(order)
        for off in range(0, len(order) - batch_size + 1, batch_size):
            group = []
            for i in order[off : off + batch_size]:
                rec = self.records[i]
                query = normalize_multimodal_item(rec["query"], self.media_root)
                query["text"] = apply_instruction(query["text"], self.query_instruction)
                pos = normalize_multimodal_item(rng.choice(rec["pos"]), self.media_root)
                n_neg = self.group_size - 1
                negs = list(rec.get("neg") or [])
                if not negs:  # in-dataset negative sampling (reference fallback)
                    others = [j for j in range(len(self.records)) if j != i]
                    negs = [rng.choice(self.records[j]["pos"]) for j in rng.sample(others, min(n_neg, len(others)))]
                if len(negs) < n_neg:
                    negs = (negs * math.ceil(n_neg / max(len(negs), 1)))[:n_neg]
                else:
                    start = rng.randrange(len(negs))
                    negs = [negs[(start + j) % len(negs)] for j in range(n_neg)]
                passages = [pos] + [normalize_multimodal_item(n, self.media_root) for n in negs]
                group.append({"query": query, "passages": passages})
            yield group


class MultimodalCollator:
    def __init__(self, processor: MultimodalProcessorAdapter):
        self.processor = processor

    def __call__(self, group: List[dict]) -> Dict[str, np.ndarray]:
        queries = [g["query"] for g in group]
        passages = [p for g in group for p in g["passages"]]
        q = self.processor(queries)
        p = self.processor(passages)
        batch = {f"query_{k}": v for k, v in q.items()}
        batch.update({f"passage_{k}": v for k, v in p.items()})
        return batch


def make_batch_iterator(dataset, collator, batch_size: int):
    class _Iter:
        def set_epoch(self, epoch):
            dataset.set_epoch(epoch)

        def __iter__(self):
            for group in dataset.iter_groups(batch_size):
                yield collator(group)

    return _Iter()
