"""Training-throughput benchmark: BGE-base embedder AND cross-encoder
reranker fine-tune steps on one chip.

Headline config matches the reference's single-GPU logs (BASELINE.md):
- embedder: bs16/device, group_size 8, seq 512 -> 16 queries + 128 passages
  per step, contrastive in-batch loss, AdamW. Reference: 43.9 samples/s on
  one A100 (fp16 + ZeRO-1).
- reranker: bs16 groups of 8 (query,passage) pairs, seq 512, group CE.
  Reference: 39.7 samples/s on one A100 (reranker/log/single.log).
This chip has 197 bf16 TF/s peak vs the A100's 312 fp16.

Variants (argv): 'impl/remat' embedder grid
(xla|pallas|fused / full|dots|offload_dots|none|plainK),
'ragged_padded'|'ragged_packed' embedder, 'reranker_padded'|'reranker_packed'
(+ optional ':impl' suffix, e.g. reranker_packed:fused), and the LLM
(Llama-1B-shape decoder) fine-tune grid
'llm_{embed|rerank}_{lora|full}_{padded|packed}[:impl[:opt]]'
(e.g. llm_embed_lora_packed:fused, llm_rerank_full_padded:pallas:adafactor).
Every variant runs N>=5 timed trials and prints median + IQR
(utils/benchstats.py — single-run relay numbers are not evidence).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")

BS, GROUP, SEQ = 16, 8, 512


def _timed_trials(step_once, samples_per_step: int, steps: int = 6):
    """Median+IQR over N trials of `steps` chained steps (loss fetch per
    step = the real sync on the relay)."""
    from nexus_tpu.utils.benchstats import measure_trials

    def one():
        t0 = time.perf_counter()
        for _ in range(steps):
            step_once()
        return samples_per_step * steps / (time.perf_counter() - t0)

    return measure_trials(one)


def run(attention_impl: str, remat: str) -> float:
    from nexus_tpu.models.bert import BertConfig
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel
    from nexus_tpu.training.trainer import RecTrainer

    # all variants train with hidden dropout 0.1 (the reference convention;
    # the fused megakernel applies it via key-derived mask operands) and
    # attention-probs dropout 0 (the flash-attn convention). The fused
    # custom vjp saves only layer inputs (remat-grade memory), so
    # remat='none' is the natural pairing: one fused fwd + one fused bwd
    # (which recomputes in VMEM), no XLA-level recompute on top.
    config = BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, add_pooling_layer=False,
        hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.0,
    )
    plain = int(remat[5:]) if remat.startswith("plain") else 0
    margs = TextEmbedderModelArguments(
        temperature=0.02, dtype="bfloat16",
        gradient_checkpointing=remat != "none",
        remat_policy=remat if remat in ("dots", "offload_dots") else None,
        remat_plain_layers=plain,  # 'plainK': last K layers skip remat
        attention_impl=attention_impl,
    )
    model = BiTextEmbedderModel(config, margs)
    targs = TrainingArguments.from_dict(dict(
        output_dir="/tmp/nx_bench_train", num_train_epochs=1,
        per_device_train_batch_size=BS, learning_rate=1e-5,
        optimizer="adamw", logging_steps=1000, evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs)
    trainer.init_state()
    step_fn = trainer._build_train_step()

    rng = np.random.default_rng(0)
    batch = {
        "query_input_ids": jnp.asarray(rng.integers(1, 30000, (BS, SEQ)), jnp.int32),
        "query_attention_mask": jnp.ones((BS, SEQ), jnp.int32),
        "passage_input_ids": jnp.asarray(rng.integers(1, 30000, (BS * GROUP, SEQ)), jnp.int32),
        "passage_attention_mask": jnp.ones((BS * GROUP, SEQ), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    holder = {"state": trainer._state}
    # compile + warm (loss fetch = real sync on the relay)
    def step_once():
        holder["state"], m = step_fn(holder["state"], batch, key)
        holder["loss"] = float(m["loss"])

    step_once()
    step_once()
    stats = _timed_trials(step_once, BS)
    print(f"attention={attention_impl:6s} remat={remat:5s}"
          f": {stats['value']:6.1f} samples/s "
          f"median of n={stats['n']} (IQR {stats['iqr']:.1f}, "
          f"range {stats['min']:.1f}-{stats['max']:.1f}, loss {holder['loss']:.3f})",
          flush=True)
    return stats["value"]


def _ragged_batch(rng, pack: bool):
    """Realistic ragged fine-tune batch: lognormal passage lengths (mean ~170
    tok, capped at 512), short queries (mean ~16). Padded mode pads all to
    SEQ; packed mode packs into dense 512-token rows."""
    def lengths(n, mu, sigma):
        return np.clip(np.round(rng.lognormal(mu, sigma, n)).astype(int), 4, SEQ)

    q_lens = lengths(BS, 2.7, 0.4)
    p_lens = lengths(BS * GROUP, 5.0, 0.6)

    def padded(lens):
        n = len(lens)
        ids = np.zeros((n, SEQ), np.int32)
        mask = np.zeros((n, SEQ), np.int32)
        for i, l in enumerate(lens):
            ids[i, :l] = rng.integers(1, 30000, l)
            mask[i, :l] = 1
        return ids, mask

    q_ids, q_mask = padded(q_lens)
    p_ids, p_mask = padded(p_lens)
    if not pack:
        return {
            "query_input_ids": jnp.asarray(q_ids), "query_attention_mask": jnp.asarray(q_mask),
            "passage_input_ids": jnp.asarray(p_ids), "passage_attention_mask": jnp.asarray(p_mask),
        }
    from nexus_tpu.ops.packing import pack_tokenized

    batch = {}
    for prefix, (ids, mask) in (("query", (q_ids, q_mask)), ("passage", (p_ids, p_mask))):
        pk = pack_tokenized(ids, mask, row_len=SEQ, row_bucket=8)
        batch.update({f"{prefix}_{k}": jnp.asarray(v) for k, v in pk.items()})
    return batch


def run_ragged(pack: bool, impl: str = "pallas") -> float:
    """Packed-vs-padded contrastive training on a ragged length mix.
    ``impl``: attention path — pallas (flash, default) | fused (encoder
    megakernel; pairs with remat OFF since its custom vjp saves only layer
    inputs) | xla."""
    from nexus_tpu.models.bert import BertConfig
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel
    from nexus_tpu.training.trainer import RecTrainer

    config = BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, add_pooling_layer=False,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.0,
    )
    margs = TextEmbedderModelArguments(
        temperature=0.02, dtype="bfloat16",
        gradient_checkpointing=impl != "fused",
        attention_impl=impl,
    )
    model = BiTextEmbedderModel(config, margs)
    targs = TrainingArguments.from_dict(dict(
        output_dir="/tmp/nx_bench_train", num_train_epochs=1,
        per_device_train_batch_size=BS, learning_rate=1e-5,
        optimizer="adamw", logging_steps=1000, evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs)
    trainer.init_state()
    step_fn = trainer._build_train_step()

    rng = np.random.default_rng(0)
    batch = _ragged_batch(rng, pack)
    if pack:
        occ = float(batch["passage_lengths"].sum()) / batch["passage_input_ids"].size
        rows = batch["passage_input_ids"].shape[0]
        print(f"  packed: passage rows {rows} (vs {BS * GROUP} padded), occupancy {occ:.2f}")
    key = jax.random.PRNGKey(0)
    holder = {"state": trainer._state}

    def step_once():
        holder["state"], m = step_fn(holder["state"], batch, key)
        holder["loss"] = float(m["loss"])

    step_once()
    step_once()
    stats = _timed_trials(step_once, BS)
    print(f"ragged {'packed' if pack else 'padded'}: {stats['value']:6.1f} samples/s "
          f"median of n={stats['n']} (IQR {stats['iqr']:.1f}, "
          f"range {stats['min']:.1f}-{stats['max']:.1f}, loss {holder['loss']:.3f})",
          flush=True)
    return stats["value"]


def _reranker_pairs(rng):
    """Reference-shaped reranker batch: BS groups x GROUP (query,passage)
    pairs, pair length = query (~16) + passage (lognormal mean ~170),
    capped at SEQ; token_type marks the passage half."""
    n = BS * GROUP
    q_lens = np.clip(np.round(rng.lognormal(2.7, 0.4, n)).astype(int), 4, 64)
    p_lens = np.clip(np.round(rng.lognormal(5.0, 0.6, n)).astype(int), 8, SEQ - 4)
    lens = np.minimum(q_lens + p_lens, SEQ)
    ids = np.zeros((n, SEQ), np.int32)
    mask = np.zeros((n, SEQ), np.int32)
    tt = np.zeros((n, SEQ), np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(1, 30000, l)
        mask[i, :l] = 1
        tt[i, min(q_lens[i], l) : l] = 1
    return ids, mask, tt


def run_reranker(pack: bool, accum: int = 1, impl: str = "pallas") -> float:
    """Cross-encoder reranker fine-tune throughput (VERDICT r2 item 2):
    bs16, group 8, seq 512, flash attention — padded (the reference's
    layout; 39.7 samples/s on one A100) vs packed rows.

    ``accum > 1``: micro-batch the 16 groups into bs/accum chunks with
    optax.MultiSteps accumulation and REMAT OFF. The group-CE loss is
    per-group, so accumulated gradients are EXACTLY the full-batch
    gradients (unlike the embedder's in-batch-negative loss, which
    micro-batching would change) — activation memory is bounded by one
    micro-batch instead of recompute, trading the remat forward away."""
    from nexus_tpu.models.bert import BertConfig
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.reranker.text_retrieval.modeling import CrossEncoderModel
    from nexus_tpu.training.trainer import RecTrainer

    config = BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512, add_pooling_layer=True,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.0,
        attention_impl=impl,
    )
    assert BS % accum == 0, (
        f"accum={accum} must divide BS={BS}: a truncating micro-batch would "
        f"silently drop pairs and inflate the reported samples/s"
    )
    micro_bs = BS // accum
    model = CrossEncoderModel(config, train_group_size=GROUP, dtype="bfloat16",
                              remat=accum == 1 and impl != "fused")
    targs = TrainingArguments.from_dict(dict(
        output_dir="/tmp/nx_bench_rerank", num_train_epochs=1,
        per_device_train_batch_size=micro_bs, learning_rate=1e-5,
        gradient_accumulation_steps=accum,
        optimizer="adamw", logging_steps=1000, evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs)
    trainer.init_state()
    step_fn = trainer._build_train_step()

    rng = np.random.default_rng(0)
    ids, mask, tt = _reranker_pairs(rng)
    if pack:
        from nexus_tpu.ops.packing import pack_tokenized

        pk = pack_tokenized(ids, mask, row_len=SEQ, row_bucket=8,
                            extras={"token_type_ids": tt})
        batch = {k: jnp.asarray(v) for k, v in pk.items()}
        occ = float(pk["lengths"].sum()) / pk["input_ids"].size
        print(f"  packed: {pk['input_ids'].shape[0]} rows (vs {BS * GROUP} padded), "
              f"occupancy {occ:.2f}")
        micro_batches = [batch]
    else:
        rows = micro_bs * GROUP
        micro_batches = [
            {"input_ids": jnp.asarray(ids[i * rows:(i + 1) * rows]),
             "attention_mask": jnp.asarray(mask[i * rows:(i + 1) * rows]),
             "token_type_ids": jnp.asarray(tt[i * rows:(i + 1) * rows])}
            for i in range(accum)
        ]
    key = jax.random.PRNGKey(0)
    holder = {"state": trainer._state}

    def step_once():
        # one EFFECTIVE step = `accum` micro-steps (MultiSteps applies the
        # averaged gradient on the last one)
        for mb in micro_batches:
            holder["state"], m = step_fn(holder["state"], mb, key)
        holder["loss"] = float(m["loss"])

    step_once()
    step_once()
    stats = _timed_trials(step_once, BS)
    tag = "packed" if pack else ("padded" if accum == 1 else f"padded accum{accum} no-remat")
    print(f"reranker {tag}: {stats['value']:6.1f} samples/s "
          f"median of n={stats['n']} (IQR {stats['iqr']:.1f}, "
          f"range {stats['min']:.1f}-{stats['max']:.1f}, loss {holder['loss']:.3f})",
          flush=True)
    return stats["value"]


LBS = 8  # LLM fine-tune: queries (embedder) / groups (reranker) per step


def _llama1b_config(impl: str, lora: bool):
    from nexus_tpu.models.llama import LlamaConfig

    # Llama-3.2-1B shape (the serving benches' LLM shape, bench_serving.py):
    # H=2048, 16 layers, GQA 32q/8kv, d=64, FF=8192, 32k vocab ~= 1.04B params
    return LlamaConfig(
        vocab_size=32000, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=SEQ, attention_impl=impl,
        lora_rank=16 if lora else 0, lora_alpha=16.0,
    )


def run_llm_embed(lora: bool, pack: bool, impl: str = "pallas",
                  opt: str = "adamw") -> float:
    """Decoder (LLM) embedder fine-tune throughput: Llama-1B trunk,
    last-token pooling, contrastive in-batch loss at bs8 x group8, seq 512.
    (Match: ref decoder_only training, training/embedder/text_retrieval/
    decoder_only/load_model.py:13-121 — LoRA over a causal trunk.)

    ``lora``: rank-16 adapters (the reference recipe) vs full fine-tune.
    Full FT at 1B needs ``opt='adafactor'`` on 16 GB HBM: f32 params (4.2 GB)
    + AdamW's two f32 moments (8.4 GB) + f32 grads (4.2 GB) cannot fit.
    ``impl``: pallas (flash) | fused (ops/fused_decoder.py megakernel — its
    custom vjp recomputes in VMEM, so XLA remat turns off) | xla."""
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.decoder_only import (
        BiDecoderOnlyEmbedderModel,
    )
    from nexus_tpu.training.trainer import RecTrainer

    config = _llama1b_config(impl, lora)
    # NOTE: unlike the BERT megakernel (whole layer incl. FFN -> remat off),
    # the decoder megakernel covers only the attention block; the SwiGLU MLP
    # activations (16 x [72,512,8192] bf16 = 19 GB unrematted) still need
    # the layer-scan remat at 1B scale — keep it ON for every impl
    margs = TextEmbedderModelArguments(
        temperature=0.02, dtype="bfloat16",
        sentence_pooling_method="last_token",
        gradient_checkpointing=True,
        attention_impl=impl,
    )
    model = BiDecoderOnlyEmbedderModel(config, margs)
    targs = TrainingArguments.from_dict(dict(
        output_dir="/tmp/nx_bench_llm_embed", num_train_epochs=1,
        per_device_train_batch_size=LBS, learning_rate=1e-5,
        optimizer=opt, logging_steps=1000, evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs)
    trainer.init_state()
    step_fn = trainer._build_train_step()

    rng = np.random.default_rng(0)
    global BS
    bs_save, BS = BS, LBS
    try:
        batch = _ragged_batch(rng, pack)
    finally:
        BS = bs_save
    if pack:
        occ = float(batch["passage_lengths"].sum()) / batch["passage_input_ids"].size
        rows = batch["passage_input_ids"].shape[0]
        print(f"  packed: passage rows {rows} (vs {LBS * GROUP} padded), "
              f"occupancy {occ:.2f}")
    key = jax.random.PRNGKey(0)
    holder = {"state": trainer._state}

    def step_once():
        holder["state"], m = step_fn(holder["state"], batch, key)
        holder["loss"] = float(m["loss"])

    step_once()
    step_once()
    stats = _timed_trials(step_once, LBS, steps=3)
    tag = (f"{'lora' if lora else 'full'} {'packed' if pack else 'padded'} "
           f"{impl} {opt}")
    print(f"llm_embed {tag}: {stats['value']:6.2f} samples/s "
          f"median of n={stats['n']} (IQR {stats['iqr']:.2f}, "
          f"range {stats['min']:.2f}-{stats['max']:.2f}, loss {holder['loss']:.3f})",
          flush=True)
    return stats["value"]


def run_llm_rerank(lora: bool, pack: bool, impl: str = "pallas",
                   opt: str = "adamw") -> float:
    """Decoder (LLM) cross-encoder reranker fine-tune throughput: Llama-1B
    trunk + score head, group CE at bs8 groups of 8 pairs, seq 512.
    Same lora/full, padded/packed, impl grid as run_llm_embed."""
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.reranker.text_retrieval.decoder_only import (
        DecoderCrossEncoderModel,
    )
    from nexus_tpu.training.trainer import RecTrainer

    config = _llama1b_config(impl, lora)
    # remat stays ON even for 'fused': the decoder megakernel covers the
    # attention block only (see run_llm_embed note)
    model = DecoderCrossEncoderModel(
        config, train_group_size=GROUP, dtype="bfloat16", remat=True,
    )
    targs = TrainingArguments.from_dict(dict(
        output_dir="/tmp/nx_bench_llm_rerank", num_train_epochs=1,
        per_device_train_batch_size=LBS, learning_rate=1e-5,
        optimizer=opt, logging_steps=1000, evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs)
    trainer.init_state()
    step_fn = trainer._build_train_step()

    rng = np.random.default_rng(0)
    n = LBS * GROUP
    ids_all, mask_all, _ = _reranker_pairs(rng)
    ids, mask = ids_all[:n], mask_all[:n]
    if pack:
        from nexus_tpu.ops.packing import pack_tokenized

        pk = pack_tokenized(ids, mask, row_len=SEQ, row_bucket=8)
        batch = {k: jnp.asarray(v) for k, v in pk.items()}
        occ = float(pk["lengths"].sum()) / pk["input_ids"].size
        print(f"  packed: {pk['input_ids'].shape[0]} rows (vs {n} padded), "
              f"occupancy {occ:.2f}")
    else:
        batch = {"input_ids": jnp.asarray(ids),
                 "attention_mask": jnp.asarray(mask)}
    key = jax.random.PRNGKey(0)
    holder = {"state": trainer._state}

    def step_once():
        holder["state"], m = step_fn(holder["state"], batch, key)
        holder["loss"] = float(m["loss"])

    step_once()
    step_once()
    stats = _timed_trials(step_once, LBS, steps=3)
    tag = (f"{'lora' if lora else 'full'} {'packed' if pack else 'padded'} "
           f"{impl} {opt}")
    print(f"llm_rerank {tag}: {stats['value']:6.2f} samples/s "
          f"median of n={stats['n']} (IQR {stats['iqr']:.2f}, "
          f"range {stats['min']:.2f}-{stats['max']:.2f}, loss {holder['loss']:.3f})",
          flush=True)
    return stats["value"]


if __name__ == "__main__":
    # fused/none first: the recommended BERT-trunk training config (the
    # fwd+bwd megakernel pair needs no XLA remat — 30.1 samples/s vs 26.4
    # for pallas/full at bs16/seq512, BENCH_NOTES)
    variants = sys.argv[1:] or ["fused/none", "xla/full", "pallas/full",
                                "pallas/dots", "pallas/none"]
    for v in variants:
        # ragged/reranker variants take an optional ':impl' suffix
        # (e.g. reranker_packed:fused) selecting the attention path
        v, _, impl_sfx = v.partition(":")
        impl_kw = {"impl": impl_sfx} if impl_sfx else {}
        if v in ("ragged_padded", "ragged_packed"):
            try:
                run_ragged(v == "ragged_packed", **impl_kw)
            except Exception as e:
                print(f"{v}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)
            continue
        if v.startswith("llm_embed_") or v.startswith("llm_rerank_"):
            # llm_{embed|rerank}_{lora|full}_{padded|packed}[:impl[:opt]]
            toks = v.split("_")  # ['llm', 'embed', 'lora', 'padded']
            if len(toks) != 4 or toks[2] not in ("lora", "full") \
                    or toks[3] not in ("padded", "packed"):
                print(f"{v}: bad llm variant (want llm_{{embed|rerank}}_"
                      f"{{lora|full}}_{{padded|packed}}[:impl[:opt]])", flush=True)
                continue
            ft, layout = toks[2], toks[3]
            parts = (impl_sfx or "pallas").split(":")
            kw = dict(lora=ft == "lora", pack=layout == "packed",
                      impl=parts[0], **({"opt": parts[1]} if len(parts) > 1 else {}))
            fn = run_llm_embed if v.startswith("llm_embed") else run_llm_rerank
            try:
                fn(**kw)
            except Exception as e:
                print(f"{v}: FAILED ({type(e).__name__}: {str(e)[:160]})", flush=True)
            continue
        if v in ("reranker_padded", "reranker_packed") or v.startswith("reranker_accum"):
            try:
                accum = int(v[len("reranker_accum"):]) if v.startswith("reranker_accum") else 1
                run_reranker(v == "reranker_packed", accum=accum, **impl_kw)
            except Exception as e:
                print(f"{v}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)
            continue
        impl, remat = v.split("/")
        try:
            run(impl, remat)
        except Exception as e:  # OOM variants report and continue
            print(f"attention={impl:6s} remat={remat:5s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
