"""Text-embedder training data (parity: Nexus/training/embedder/
text_retrieval/dataset.py:85-591).

jsonl records: {"query": str, "pos": [str], "neg": [str],
"pos_scores": [...], "neg_scores": [...]} (BGE format). The dataset samples
one positive + (group_size-1) wrap-around negatives per query, applies
instruction templates and optional text-shuffle augmentation, and the
collator tokenizes to FIXED [B, L] shapes (always padded to max length —
static shapes for the TPU; bucketing happens at the inference layer).

Same-dataset-within-batch behavior: batches never mix source files; small
datasets below `small_threshold` are merged into one mixed bucket or dropped
below `drop_threshold` (reference dataset.py:243-504).
"""

from __future__ import annotations

import json
import math
import os
import random
from typing import Dict, Iterator, List

import numpy as np

from nexus_tpu.training.embedder.text_retrieval.arguments import TextEmbedderDataArguments


def _shuffle_text(text: str, rng: random.Random) -> str:
    """Chunk-shuffle augmentation (reference dataset.py:131-151 behavior)."""
    chunks = text.split(" ")
    if len(chunks) <= 1:
        return text
    rng2 = rng
    split = [chunks[i : i + 3] for i in range(0, len(chunks), 3)]
    rng2.shuffle(split)
    return " ".join(w for c in split for w in c)


def _load_jsonl(path: str) -> List[dict]:
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


class TextEmbedderTrainDataset:
    """Iterable over (query, passages, teacher_scores) example groups."""

    def __init__(self, args: TextEmbedderDataArguments, seed: int = 42):
        self.args = args
        self.seed = seed
        paths: List[str] = []
        for p in args.train_data or []:
            if os.path.isdir(p):
                paths += [os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith((".jsonl", ".json"))]
            else:
                paths.append(p)
        self.datasets: List[List[dict]] = []
        self.dataset_names: List[str] = []
        small: List[dict] = []
        for p in paths:
            recs = _load_jsonl(p)
            if args.same_dataset_within_batch and len(recs) < (args.small_threshold or 0):
                if len(recs) >= (args.drop_threshold or 0):
                    small += recs
                continue
            self.datasets.append(recs)
            self.dataset_names.append(os.path.basename(p))
        if small:
            self.datasets.append(small)
            self.dataset_names.append("_merged_small")
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def _make_example(self, rec: dict, rng: random.Random) -> dict:
        a = self.args
        query = rec["query"]
        if a.query_instruction_for_retrieval:
            query = a.query_instruction_format.format(a.query_instruction_for_retrieval, query)
        pos_idx = rng.randrange(len(rec["pos"]))
        pos = rec["pos"][pos_idx]
        n_neg = a.train_group_size - 1
        negs = list(rec.get("neg") or [])
        if not negs:
            negs = [pos]
        if len(negs) < n_neg:  # wrap-around sampling (reference behavior)
            negs = (negs * math.ceil(n_neg / len(negs)))[:n_neg]
        else:
            start = rng.randrange(len(negs))
            negs = [negs[(start + i) % len(negs)] for i in range(n_neg)]
        if a.shuffle_ratio > 0 and rng.random() < a.shuffle_ratio:
            pos = _shuffle_text(pos, rng)
        passages = [pos] + negs
        if a.passage_instruction_for_retrieval:
            passages = [
                a.passage_instruction_format.format(a.passage_instruction_for_retrieval, p)
                for p in passages
            ]
        scores = None
        if a.knowledge_distillation and "pos_scores" in rec:
            neg_scores = rec.get("neg_scores") or []
            pool = neg_scores if neg_scores else [rec["pos_scores"][pos_idx]]
            s_negs = (pool * math.ceil(n_neg / len(pool)))[:n_neg]
            scores = [rec["pos_scores"][pos_idx]] + s_negs
        return {"query": query, "passages": passages, "teacher_scores": scores}

    def iter_batches(self, batch_size: int) -> Iterator[List[dict]]:
        """Batch-homogeneous iteration: each batch comes from ONE dataset."""
        rng = random.Random(self.seed + self.epoch)
        buckets = []
        for ds_id, recs in enumerate(self.datasets):
            order = list(range(len(recs)))
            rng.shuffle(order)
            for off in range(0, len(order) - batch_size + 1, batch_size):
                buckets.append((ds_id, order[off : off + batch_size]))
        rng.shuffle(buckets)
        for ds_id, idxs in buckets:
            yield [self._make_example(self.datasets[ds_id][i], rng) for i in idxs]


class TextEmbedderCollator:
    """Tokenize example groups to fixed-shape numpy batches."""

    def __init__(self, tokenizer, args: TextEmbedderDataArguments):
        self.tokenizer = tokenizer
        self.args = args

    def __call__(self, examples: List[dict]) -> Dict[str, np.ndarray]:
        queries = [e["query"] for e in examples]
        passages = [p for e in examples for p in e["passages"]]
        q = self.tokenizer(
            queries, padding="max_length", truncation=True,
            max_length=self.args.query_max_len, return_tensors="np",
        )
        p = self.tokenizer(
            passages, padding="max_length", truncation=True,
            max_length=self.args.passage_max_len, return_tensors="np",
        )
        if self.args.pack_sequences:
            from nexus_tpu.ops.packing import pack_tokenized

            batch = {}
            for prefix, tok in (("query", q), ("passage", p)):
                packed = pack_tokenized(
                    tok["input_ids"].astype(np.int32),
                    tok["attention_mask"].astype(np.int32),
                    row_len=self.args.pack_row_len,
                    row_bucket=self.args.pack_row_bucket,
                )
                batch.update({f"{prefix}_{k}": v for k, v in packed.items()})
        else:
            batch = {
                "query_input_ids": q["input_ids"].astype(np.int32),
                "query_attention_mask": q["attention_mask"].astype(np.int32),
                "passage_input_ids": p["input_ids"].astype(np.int32),
                "passage_attention_mask": p["attention_mask"].astype(np.int32),
            }
        if examples[0].get("teacher_scores") is not None:
            batch["teacher_scores"] = np.asarray(
                [e["teacher_scores"] for e in examples], np.float32
            )
        return batch


def make_batch_iterator(
    dataset: TextEmbedderTrainDataset, collator: TextEmbedderCollator, batch_size: int
):
    """Factory suitable for RecTrainer's train_data argument."""

    class _Iter:
        def set_epoch(self, epoch):
            dataset.set_epoch(epoch)

        def __iter__(self):
            for group in dataset.iter_batches(batch_size):
                yield collator(group)

    return _Iter()
