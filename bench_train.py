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
    margs = TextEmbedderModelArguments(
        temperature=0.02, dtype="bfloat16",
        gradient_checkpointing=remat != "none",
        remat_policy=None if remat != "dots" else "dots",
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


if __name__ == "__main__":
    variants = sys.argv[1:] or ["xla/full", "pallas/full", "pallas/dots", "pallas/none"]
    for v in variants:
        impl, remat = v.split("/")
        try:
            run(impl, remat)
        except Exception as e:  # OOM variants report and continue
            print(f"attention={impl:6s} remat={remat:5s}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
