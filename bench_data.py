"""Input-pipeline throughput bench (round-5: prove the data layer sustains
chip rate — the reference's industrial strength is its streaming data path,
ref training/reranker/recommendation/dataset.py:103-226).

Three modes, all host-only (the data layer runs on the host that feeds the
chip; numbers from THIS VM are the numbers that matter for its chip):

  python bench_data.py rec  [rows_per_day] [batch]
      Streaming tabular path: row-group parquet scan + side-table
      (user-sequence) joins + shuffle buffer + rank slicing, recflow-shaped
      (seq_len 50). Reports rows/s and batches/s over a full epoch.

  python bench_data.py text [batch] [group] [pack]
      Text fine-tune path: jsonl example groups -> instruction templating ->
      tokenize (seq 512) -> optional packing. Reports samples/s (sample =
      one query group, the unit of bench_train's measured 64.6 packed /
      30.1 padded samples/s consumption rows).

  python bench_data.py overlap [step_ms] [batch]
      Prefetch-hiding proof: consume the rec stream with a simulated
      device step of step_ms through the trainer's _prefetch; wall time
      must approach max(data, step), not their sum.

Each prints one JSON line; margin = data rate / consumption rate is the
number BENCH_NOTES wants (>1 means the host feeds the chip with headroom).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def _epoch_rate(ds, n_epochs: int = 3):
    """(rows/s, batches/s, rows) median over epochs (first epoch warms the
    OS page cache the way a real multi-epoch run does)."""
    rates = []
    rows = batches = 0
    for ep in range(n_epochs):
        ds.set_epoch(ep)
        t0 = time.perf_counter()
        rows = batches = 0
        for batch in ds:
            nv = batch.get("_nvalid")
            rows += int(nv) if nv is not None else len(batch[next(iter(batch))])
            batches += 1
        rates.append(rows / (time.perf_counter() - t0))
    return float(np.median(rates)), batches, rows


def rec() -> None:
    from nexus_tpu.data.dataset import ShardedDataset
    from nexus_tpu.data.processor import ConfigProcessor
    from nexus_tpu.data.synthetic import generate_synthetic_recflow

    rows_per_day = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    with tempfile.TemporaryDirectory(prefix="nx_bench_data_") as td:
        cfg = generate_synthetic_recflow(
            td, n_days=3, rows_per_day=rows_per_day, seq_len=50)
        train_cfg, _ = ConfigProcessor(cfg).split_config()
        ds = ShardedDataset(train_cfg, batch_size=bs, shuffle=True,
                            drop_last=True)
        rate, batches, rows = _epoch_rate(ds)
    print(json.dumps({
        "metric": "rec_stream_rows_per_sec",
        "value": round(rate, 1), "unit": "rows/s",
        "batch_size": bs, "rows_per_epoch": rows, "batches": batches,
        "seq_len": 50, "shuffle_buffer": ds.shuffle_buffer_batches,
        "includes": "row-group parquet scan + side-table join + shuffle "
                    "buffer + rank slicing",
    }), flush=True)


def text() -> None:
    from transformers import BertTokenizerFast

    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderDataArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.dataset import (
        TextEmbedderCollator, TextEmbedderTrainDataset,
    )

    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pack = "pack" in sys.argv[4:]
    rng = np.random.default_rng(0)
    words = [f"w{i:04d}" for i in range(8000)]
    with tempfile.TemporaryDirectory(prefix="nx_bench_text_") as td:
        # MS-MARCO-style length mix (the bench_train workload): queries ~12
        # words, passages lognormal mean ~170 capped at 510
        n = bs * 48
        with open(f"{td}/train.jsonl", "w") as f:
            for _ in range(n):
                q = " ".join(rng.choice(words, 12))
                p_lens = np.clip(rng.lognormal(np.log(170.0), 0.6, group),
                                 8, 510).astype(int)
                rec_ = {"query": q,
                        "pos": [" ".join(rng.choice(words, p_lens[0]))],
                        "neg": [" ".join(rng.choice(words, l))
                                for l in p_lens[1:]]}
                f.write(json.dumps(rec_) + "\n")
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
        with open(f"{td}/vocab.txt", "w") as f:
            f.write("\n".join(vocab))
        tok = BertTokenizerFast(vocab_file=f"{td}/vocab.txt")
        args = TextEmbedderDataArguments(
            train_data=[f"{td}/train.jsonl"], train_group_size=group,
            query_max_len=64, passage_max_len=512, pack_sequences=pack,
        )
        ds = TextEmbedderTrainDataset(args)
        collator = TextEmbedderCollator(tok, args)
        rates = []
        for ep in range(3):
            ds.set_epoch(ep)
            t0 = time.perf_counter()
            samples = 0
            for g in ds.iter_batches(bs):
                batch = collator(g)
                assert "query_input_ids" in batch
                samples += len(g)
            rates.append(samples / (time.perf_counter() - t0))
    print(json.dumps({
        "metric": "text_pipeline_samples_per_sec",
        "value": round(float(np.median(rates)), 1), "unit": "samples/s",
        "batch_size": bs, "group_size": group, "packed": pack,
        "includes": "jsonl read + group assembly + tokenize(512) "
                    + ("+ pack" if pack else "+ pad"),
    }), flush=True)


def overlap() -> None:
    from nexus_tpu.data.dataset import ShardedDataset
    from nexus_tpu.data.processor import ConfigProcessor
    from nexus_tpu.data.synthetic import generate_synthetic_recflow
    from nexus_tpu.training.trainer import _prefetch

    step_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    bs = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    with tempfile.TemporaryDirectory(prefix="nx_bench_ovl_") as td:
        cfg = generate_synthetic_recflow(td, n_days=2, rows_per_day=50_000,
                                         seq_len=50)
        train_cfg, _ = ConfigProcessor(cfg).split_config()
        ds = ShardedDataset(train_cfg, batch_size=bs, shuffle=True,
                            drop_last=True)
        list(iter(ds))  # warm the page cache

        def consume(prefetched: bool) -> tuple:
            it = _prefetch(iter(ds)) if prefetched else iter(ds)
            t0 = time.perf_counter()
            n = 0
            for _ in it:
                time.sleep(step_ms / 1e3)  # the simulated device step
                n += 1
            return time.perf_counter() - t0, n

        t_data = consume(False)[0]
        t_pref, n_batches = consume(True)
    step_total = n_batches * step_ms / 1e3
    data_total = t_data - step_total  # serial run = data + step
    print(json.dumps({
        "metric": "prefetch_overlap_efficiency",
        # 1.0 = data time fully hidden under the step; 0 = fully serial
        "value": round(
            max(0.0, min(1.0, (t_data - t_pref) / max(data_total, 1e-9))), 3),
        "unit": "fraction_of_data_time_hidden",
        "serial_s": round(t_data, 2), "prefetched_s": round(t_pref, 2),
        "pure_step_s": round(step_total, 2), "batches": n_batches,
        "step_ms": step_ms, "batch_size": bs,
    }), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "rec"
    {"rec": rec, "text": text, "overlap": overlap}[mode]()
