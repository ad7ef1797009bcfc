"""Cross-encoder training data (parity: Nexus/training/reranker/
text_retrieval/dataset.py): jsonl query/pos/neg records -> flat
(query, passage) pair batches with the positive first in each group.
"""

from __future__ import annotations

import math
import random
from typing import Dict, Iterator, List

import numpy as np

from nexus_tpu.training.embedder.text_retrieval.dataset import _load_jsonl


class TextRerankerTrainDataset:
    def __init__(
        self,
        train_data: List[str],
        train_group_size: int = 8,
        seed: int = 42,
        query_instruction: str = "",
        knowledge_distillation: bool = False,
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
        self.seed = seed
        self.query_instruction = query_instruction
        self.kd = knowledge_distillation
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
                pos_idx = rng.randrange(len(rec["pos"]))
                pos = rec["pos"][pos_idx]
                n_neg = self.group_size - 1
                negs = list(rec.get("neg") or [pos])
                if len(negs) < n_neg:
                    negs = (negs * math.ceil(n_neg / len(negs)))[:n_neg]
                else:
                    start = rng.randrange(len(negs))
                    negs = [negs[(start + j) % len(negs)] for j in range(n_neg)]
                ex = {
                    "query": self.query_instruction + rec["query"],
                    "passages": [pos] + negs,
                }
                if self.kd and "pos_scores" in rec:
                    pool = rec.get("neg_scores") or [rec["pos_scores"][pos_idx]]
                    ex["teacher_scores"] = [rec["pos_scores"][pos_idx]] + (
                        pool * math.ceil(n_neg / len(pool))
                    )[:n_neg]
                group.append(ex)
            yield group


class TextRerankerCollator:
    def __init__(self, tokenizer, max_len: int = 512, pack: bool = False,
                 row_bucket: int = 8, pair_template: str = None):
        """``pack=True`` packs the (query, passage) pairs into dense
        max_len-token rows (block-diagonal segment attention, per-pair CLS
        gather) — no pad FLOPs on ragged pair lengths; scores/loss are
        parity-tested against the padded layout
        (tests/test_packing.py::test_packed_cross_encoder_scores_parity)."""
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.pack = pack
        self.row_bucket = row_bucket
        # LLM-reranker prompt: one formatted sequence per pair (must match
        # the inference engine's pair_template for train/serve consistency)
        self.pair_template = pair_template

    def __call__(self, examples: List[dict]) -> Dict[str, np.ndarray]:
        pairs_q, pairs_p = [], []
        for e in examples:
            for p in e["passages"]:
                pairs_q.append(e["query"])
                pairs_p.append(p)
        padding = "longest" if self.pack else "max_length"
        if self.pair_template:
            texts = [
                self.pair_template.format(query=q, passage=p)
                for q, p in zip(pairs_q, pairs_p)
            ]
            enc = self.tokenizer(
                texts, padding=padding, truncation=True,
                max_length=self.max_len, return_tensors="np",
            )
        else:
            enc = self.tokenizer(
                pairs_q, pairs_p, padding=padding,
                truncation=True, max_length=self.max_len, return_tensors="np",
            )
        ids = enc["input_ids"].astype(np.int32)
        mask = enc["attention_mask"].astype(np.int32)
        tt = enc.get("token_type_ids")
        if self.pack:
            from nexus_tpu.ops.packing import pack_tokenized

            extras = {} if tt is None else {"token_type_ids": tt.astype(np.int32)}
            batch = pack_tokenized(
                ids, mask, row_len=self.max_len, row_bucket=self.row_bucket,
                extras=extras,
            )
        else:
            batch = {"input_ids": ids, "attention_mask": mask}
            if tt is not None:
                batch["token_type_ids"] = tt.astype(np.int32)
        if examples[0].get("teacher_scores") is not None:
            batch["teacher_scores"] = np.asarray(
                [e["teacher_scores"] for e in examples], np.float32
            )
        return batch


def make_batch_iterator(dataset: TextRerankerTrainDataset, collator: TextRerankerCollator, batch_size: int):
    class _Iter:
        def set_epoch(self, epoch):
            dataset.set_epoch(epoch)

        def __iter__(self):
            for group in dataset.iter_groups(batch_size):
                yield collator(group)

    return _Iter()
