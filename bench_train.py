"""Training-throughput benchmark: BGE-base embedder fine-tune step on one chip.

Headline config matches the reference's single-GPU log (BASELINE.md):
bs16/device, group_size 8, seq 512 -> 16 queries + 128 passages per step,
contrastive in-batch loss, AdamW. Reference: 43.9 samples/s on one A100
(fp16 + ZeRO-1); this chip has 197 bf16 TF/s peak vs A100's 312 fp16.

Variants (argv): attention impl (xla | pallas flash fwd+blocked bwd),
remat (full | dots | none). Prints samples/s per variant.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/nexus_jax_cache")

BS, GROUP, SEQ = 16, 8, 512


def run(attention_impl: str, remat: str) -> float:
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
    plain = int(remat[5:]) if remat.startswith("plain") else 0
    margs = TextEmbedderModelArguments(
        temperature=0.02, dtype="bfloat16",
        gradient_checkpointing=remat != "none",
        remat_policy=None if remat != "dots" else "dots",
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
    state = trainer._state
    # compile + warm (loss fetch = real sync on the relay)
    state, m = step_fn(state, batch, key)
    float(m["loss"])
    state, m = step_fn(state, batch, key)
    float(m["loss"])

    steps = 6
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, batch, key)
        loss = float(m["loss"])
    dt = time.perf_counter() - t0
    sps = steps * BS / dt
    print(f"attention={attention_impl:6s} remat={remat:5s}: {sps:6.1f} samples/s "
          f"({dt / steps * 1e3:.0f} ms/step, loss {loss:.3f})", flush=True)
    return sps


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


def run_ragged(pack: bool) -> float:
    """Packed-vs-padded contrastive training on a ragged length mix."""
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
        temperature=0.02, dtype="bfloat16", gradient_checkpointing=True,
        attention_impl="pallas",
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
    state = trainer._state
    state, m = step_fn(state, batch, key)
    float(m["loss"])
    state, m = step_fn(state, batch, key)
    float(m["loss"])
    steps = 6
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, batch, key)
        loss = float(m["loss"])
    dt = time.perf_counter() - t0
    sps = steps * BS / dt
    print(f"ragged {'packed' if pack else 'padded'}: {sps:6.1f} samples/s "
          f"({dt / steps * 1e3:.0f} ms/step, loss {loss:.3f})", flush=True)
    return sps


if __name__ == "__main__":
    variants = sys.argv[1:] or ["xla/full", "pallas/full", "pallas/dots", "pallas/none"]
    for v in variants:
        if v in ("ragged_padded", "ragged_packed"):
            try:
                run_ragged(v == "ragged_packed")
            except Exception as e:
                print(f"{v}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)
            continue
        impl, remat = v.split("/")
        try:
            run(impl, remat)
        except Exception as e:  # OOM variants report and continue
            print(f"attention={impl:6s} remat={remat:5s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
