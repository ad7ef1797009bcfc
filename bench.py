"""Headline benchmark: BGE-base embedding throughput on one TPU chip.

Measures the inference engine's core serving path — bf16 BGE-base-architecture
encoder (scan-over-layers) with SEQUENCE PACKING + per-sequence CLS pooling +
L2 normalize, jit-compiled, static shapes — in embeddings/sec/chip.

Workload: an MS MARCO-style retrieval encode mix — token lengths drawn from
lognormal(ln 38, 0.55) clipped to [6, 128] (mean ~43: queries + passages).
Sequences are packed into dense [256, 128] rows (occupancy >97%) with
block-diagonal segment attention and per-segment restarting positions, so the
MXU sees almost no padding — the TPU answer to the reference's dynamic-shape
length-sorted batching (Nexus/inference/embedder/text_retrieval/base.py:291).
Embeddings match the unpacked path exactly (tests/test_packing.py).

Timing methodology: on this TPU relay platform `block_until_ready` does not
reliably synchronize, so every timed iteration fetches a data-dependent
SCALAR to the host (forces completion; transfer cost is negligible). Packing
itself is host-side work that overlaps device compute in a real server (like
tokenization, it is excluded from device throughput).

North star (BASELINE.json): >= 10,000 embeddings/sec/chip on v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Secondary numbers (dense-padded variants, distribution sensitivity) live in
BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 10_000.0  # embeddings/sec/chip
ROW_LEN = 128  # packed row length (also the MXU-friendly attention tile)
ROWS = 256  # rows per batch (~32.5k real tokens)
CHAIN = 8  # batches per dispatch (amortizes the relay's ~25ms dispatch cost)
ITERS = 3
MEAN_LEN, SIGMA = 38.0, 0.55  # lognormal token-length mix (mean ~43)

# secondary workload modes (argv[1]) — the VERDICT r2 long-sequence grid
MODES = {
    # headline: MS-MARCO-style short mix, 128-token packed rows, encoded
    # through the int8 W8A8 full-layer megakernel — the shipping serving
    # configuration (fused_encoder_layer_int8: per-token quantization +
    # int8 MXU GEMMs inside one Pallas program per row; embedding cosine vs
    # fp > 0.999, tests/test_quantize.py). Measured 23,845 emb/s vs 18,673
    # for the bf16 megakernel ('headline_bf16' below) — the metric name
    # carries int8_w8a8 so the number is never mistaken for the fp path
    "headline": dict(mean=38.0, sigma=0.55, row_len=128, rows=256,
                     attention_impl="fused", quantized=True),
    # the bf16 fused-layer megakernel (fp-exact path: 18.4-18.7k emb/s —
    # the round-2-comparable configuration)
    "headline_bf16": dict(mean=38.0, sigma=0.55, row_len=128, rows=256,
                          attention_impl="fused"),
    # the same workload through plain XLA attention (the pre-megakernel
    # headline: 16.2-16.5k emb/s)
    "headline_xla": dict(mean=38.0, sigma=0.55, row_len=128, rows=256),
    # passage-heavy (mean ~65 tok) in 128 rows (round-2 number: 10,973)
    "passage": dict(mean=58.0, sigma=0.55, row_len=128, rows=256),
    # same mix in 256-token rows (fewer, fatter attention tiles)
    "passage_row256": dict(mean=58.0, sigma=0.55, row_len=256, rows=128),
    # corpus encode: near-512-token passages packed into 512 rows
    "corpus512": dict(mean=420.0, sigma=0.25, row_len=512, rows=64),
    # dense fully-padded seq-512 (every row one full sequence) — the
    # apples-to-apples corpus-encode lower bound
    "dense512": dict(dense=512, rows=64),
    "dense512_b128": dict(dense=512, rows=128),
    # flash-attention variants: at L=512 the XLA path's materialized f32
    # probs ([H, 512, 512] per row per layer) are pure HBM traffic; the
    # Pallas 512-block kernel keeps them in VMEM
    "corpus512_flash": dict(mean=420.0, sigma=0.25, row_len=512, rows=64,
                            attention_impl="pallas"),
    "dense512_flash": dict(dense=512, rows=64, attention_impl="pallas"),
    # M=65536 token batches: the [65536,768]x[768,768] GEMM probes 77 TF/s
    # vs 59 at M=32768 — with flash attention the probs-memory penalty that
    # sank the XLA b128 variant is gone
    "dense512_b128_flash": dict(dense=512, rows=128, attention_impl="pallas"),
    "corpus512_b128_flash": dict(mean=420.0, sigma=0.25, row_len=512, rows=128,
                                 attention_impl="pallas"),
    # fused [768,2304] QKV projection: rejected at L=64/128 in round 2, but
    # the isolated no-attention pipeline probes 155 TF/s with the fused
    # shape — retest at L=512 where attention dominates differently
    "dense512_flash_fqkv": dict(dense=512, rows=64, attention_impl="pallas",
                                fused_qkv=True),
    "headline_fqkv": dict(mean=38.0, sigma=0.55, row_len=128, rows=256,
                          fused_qkv=True),
    "passage_flash": dict(mean=58.0, sigma=0.55, row_len=128, rows=256,
                          attention_impl="pallas"),
    # lengths fast path (flash_attention_padded): right-padded rows take the
    # per-row-length kernel whose mask is a register iota compare (no
    # segment-id loads; static masked loop — dead-block skipping measured
    # WORSE, see ops/flash_attention.py header)
    "dense512_padfast": dict(dense=512, rows=64, attention_impl="pallas",
                             padded=True),
    # realistic unpacked corpus encode: one passage per row, right-padded to
    # 512 (lognormal mean ~420); the reference's answer is length-sorted
    # dynamic batching — ours is block-skipping at static shape
    "corpus512_unpacked_padfast": dict(padded_var=(380.0, 0.35), rows=64,
                                       attention_impl="pallas"),
    "corpus512_unpacked_xla": dict(padded_var=(380.0, 0.35), rows=64),
    # megakernel (ops/fused_encoder.py): QKV+attention+O+LN in ONE Pallas
    # program per row — kills the transposes and fusion boundaries around
    # the attention custom call (isolated 12-layer stack: 151-152 TF/s vs
    # 87 flash / 78-101 XLA at both [64,512] and [256,128]).
    # ("headline" above IS the fused configuration — no separate alias.)
    "passage_fused": dict(mean=58.0, sigma=0.55, row_len=128, rows=256,
                          attention_impl="fused"),
    "corpus512_fused": dict(mean=420.0, sigma=0.25, row_len=512, rows=64,
                            attention_impl="fused"),
    "dense512_fused": dict(dense=512, rows=64, attention_impl="fused",
                           padded=True),
    "corpus512_unpacked_fused": dict(padded_var=(380.0, 0.35), rows=64,
                                     attention_impl="fused"),
    # int8 W8A8 serving path (models/quantize.py): projection/FFN GEMMs run
    # int8 on the MXU at 2x bf16 peak; attention stays flash/xla. Embedding
    # cosine vs fp > 0.999 (tests/test_quantize.py)
    "headline_int8": dict(mean=38.0, sigma=0.55, row_len=128, rows=256,
                          attention_impl="pallas", quantized=True),
    "dense512_int8": dict(dense=512, rows=64, attention_impl="pallas",
                          quantized=True),
    # int8 W8A8 + full-layer megakernel composed: the int8 GEMMs run INSIDE
    # one Pallas program per row (fused_encoder_layer_int8) at the MXU's
    # 2x int8 peak, attention/LN stay f32 in VMEM
    "headline_int8_fused": dict(mean=38.0, sigma=0.55, row_len=128, rows=256,
                                attention_impl="fused", quantized=True),
    "dense512_int8_fused": dict(dense=512, rows=64, attention_impl="fused",
                                quantized=True),
}


def _make_packed_batch(rng, pack_sequences, mean, sigma, row_len, rows):
    """Draw sequences from the workload distribution until `rows` rows fill."""
    seqs, packed = [], None
    while True:
        lens = np.clip(rng.lognormal(np.log(mean), sigma, 64), 6, row_len)
        seqs += [rng.integers(1, 30000, int(l)).astype(np.int32) for l in lens]
        packed = pack_sequences(seqs, row_len)
        if packed.n_rows >= rows:
            break
    while packed.n_rows > rows:
        seqs.pop()
        packed = pack_sequences(seqs, row_len)
    return packed.pad_rows(rows), len(seqs)


def main(mode: str = "headline") -> None:
    # persistent compile cache: first-ever run pays the slow remote compile,
    # subsequent bench invocations start hot
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from nexus_tpu.models.bert import BertConfig, BertEncoderModel
    from nexus_tpu.ops.packing import pack_sequences, pool_packed_cls

    params = MODES[mode]
    config = BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, add_pooling_layer=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        attention_impl=params.get("attention_impl", "xla"),
        fused_qkv=params.get("fused_qkv", False),
        quantized=params.get("quantized", False),
    )
    model = BertEncoderModel(config, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    use_mask = bool(params.get("padded") or "padded_var" in params)
    if "dense" in params or "padded_var" in params:
        # one sequence per row, right-padded ('dense' = every row full length;
        # 'padded_var' = lognormal lengths, the unpacked corpus-encode shape)
        from types import SimpleNamespace

        rows = params["rows"]
        L = params.get("dense", 512)
        batches = []
        for _ in range(CHAIN):
            if "padded_var" in params:
                mean, sigma = params["padded_var"]
                lens = np.clip(rng.lognormal(np.log(mean), sigma, rows), 16, L
                               ).astype(np.int32)
            else:
                lens = np.full(rows, L, np.int32)
            valid = (np.arange(L)[None, :] < lens[:, None]).astype(np.int32)
            batches.append((SimpleNamespace(
                input_ids=(rng.integers(1, 30000, (rows, L)) * valid).astype(np.int32),
                segment_ids=valid,
                position_ids=np.tile(np.arange(L, dtype=np.int32), (rows, 1)),
                pool_rows=np.arange(rows, dtype=np.int32),
                pool_cols=np.zeros(rows, np.int32),
            ), rows))
    else:
        batches = [
            _make_packed_batch(rng, pack_sequences, params["mean"], params["sigma"],
                               params["row_len"], params["rows"])
            for _ in range(CHAIN)
        ]
    n_emb = sum(n for _, n in batches)
    max_seqs = max(n for _, n in batches)
    ids = jnp.asarray(np.stack([b.input_ids for b, _ in batches]))
    seg = jnp.asarray(np.stack([b.segment_ids for b, _ in batches]))
    pos = jnp.asarray(np.stack([b.position_ids for b, _ in batches]))
    # static [max_seqs] pooling slots per batch (excess slots gather row 0)
    pool_r = jnp.asarray(np.stack([np.pad(b.pool_rows, (0, max_seqs - n)) for b, n in batches]))
    pool_c = jnp.asarray(np.stack([np.pad(b.pool_cols, (0, max_seqs - n)) for b, n in batches]))

    variables = model.init(jax.random.PRNGKey(0), ids[0, :1, :8])
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 and x.ndim >= 2 else x,
        variables,
    )

    @jax.jit
    def encode_probe(variables, ids, seg, pos, pool_r, pool_c):
        # serving-shaped pipeline: CHAIN packed batches stream through one
        # dispatch; full epilogue (per-sequence CLS pool + L2 normalize)
        def body(_, x):
            i, s, p, pr, pc = x
            if use_mask:  # padding-only masking: lengths fast path
                out = model.apply(variables, i, attention_mask=s, position_ids=p)
            else:
                out = model.apply(variables, i, position_ids=p, segment_ids=s)
            reps = pool_packed_cls(out["last_hidden_state"].astype(jnp.float32), pr, pc)
            reps = reps / jnp.clip(jnp.linalg.norm(reps, axis=-1, keepdims=True), 1e-12, None)
            return 0, jnp.sum(reps)

        _, sums = jax.lax.scan(body, 0, (ids, seg, pos, pool_r, pool_c))
        # scalar probe: data-dependent on every batch, forces real sync
        return jnp.sum(sums)

    args = (variables, ids, seg, pos, pool_r, pool_c)
    # compile + warmup (first fetch waits for compilation)
    float(encode_probe(*args))
    float(encode_probe(*args))

    # N>=5 repeat trials, median + IQR (single-run numbers are not evidence
    # on this relay — see utils/benchstats.py)
    from nexus_tpu.utils.benchstats import throughput_trials

    def run_iters(n):
        for _ in range(n):
            float(encode_probe(*args))

    stats = throughput_trials(run_iters, units_per_iter=n_emb, iters=ITERS)

    metric = (
        "bge_base_embeddings_per_sec_per_chip_packed_msmarco_mix_int8_w8a8_fused"
        if mode == "headline"
        else f"bge_base_embeddings_per_sec_per_chip_{mode}"
        + ("" if "int8" in mode else "_bf16")
    )
    print(json.dumps({
        "metric": metric,
        "value": round(stats["value"], 2),
        "unit": "embeddings/s",
        "vs_baseline": round(stats["value"] / NORTH_STAR, 4),
        "n": stats["n"],
        "iqr": round(stats["iqr"], 2),
    }))


def _run_bench(arg: str) -> None:
    if arg == "grid":
        # all workload modes in one process: pay relay/backend startup once
        for m in MODES:
            try:
                main(m)
            except Exception as e:
                print(json.dumps({"metric": f"bge_{m}", "error": str(e)[:160]}))
    else:
        main(arg)


def _watchdog(arg: str) -> None:
    """Bounded execution: the TPU relay backing this host has had multi-hour
    full outages where any device touch hangs in native code (uninterruptible
    from Python). Run the real bench in a child process under a deadline,
    retry a couple of times (stalls of minutes are routine), and if the
    device never answers print an honest machine-readable failure line
    instead of hanging the caller forever."""
    import os
    import subprocess
    import sys

    attempts = int(os.environ.get("NEXUS_BENCH_ATTEMPTS", "3"))
    # generous per-attempt budget: first-ever remote compile can take minutes
    per_attempt = float(os.environ.get("NEXUS_BENCH_TIMEOUT_S", "2400"))
    env = {**os.environ, "NEXUS_BENCH_CHILD": "1"}
    last = "unknown"
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__), arg],
                               env=env, timeout=per_attempt,
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            last = f"attempt {i + 1}: no device response in {per_attempt:.0f}s"
            print(last, file=sys.stderr)
            continue
        sys.stderr.write(r.stderr)
        json_lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode == 0 and json_lines:
            for l in json_lines:
                print(l)
            return
        last = f"attempt {i + 1}: exit={r.returncode} tail={r.stdout[-200:]!r}"
        print(last, file=sys.stderr)
    print(json.dumps({
        "metric": "bge_base_embeddings_per_sec_per_chip_packed_msmarco_mix_int8_w8a8_fused",
        "value": None, "unit": "embeddings/s", "vs_baseline": None,
        "error": f"TPU unreachable after {attempts} attempts ({last}); "
                 "see BENCH_NOTES.md for the last measured numbers",
    }))
    raise SystemExit(1)


if __name__ == "__main__":
    import os
    import sys

    arg = sys.argv[1] if len(sys.argv) > 1 else "headline"
    if os.environ.get("NEXUS_BENCH_CHILD") == "1":
        _run_bench(arg)
    else:
        _watchdog(arg)
