import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.models.llama import LlamaConfig, LlamaModel
from nexus_tpu.models.lora import extract_lora_params, lora_param_filter, merge_lora_params

TINY = dict(
    vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
)


def test_llama_forward_shapes(key):
    cfg = LlamaConfig(**TINY)
    m = LlamaModel(cfg, dtype=jnp.float32)
    ids = jnp.ones((2, 10), jnp.int32)
    v = m.init(key, ids)
    out = m.apply(v, ids)
    assert out["last_hidden_state"].shape == (2, 10, 32)


def test_llama_matches_hf(key):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLC, LlamaModel as HFLlama

    from nexus_tpu.models.hf_convert import torch_llama_to_flax

    hf = HFLlama(HFLC(**TINY)).eval()
    cfg = LlamaConfig(**TINY)
    variables = torch_llama_to_flax(hf.state_dict(), cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 63, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[0, 9:] = 0
    ids = ids * mask
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    ours = np.asarray(
        LlamaModel(cfg, dtype=jnp.float32).apply(
            variables, jnp.asarray(ids), attention_mask=jnp.asarray(mask)
        )["last_hidden_state"]
    )
    valid = mask.astype(bool)
    assert np.abs(ours[valid] - ref[valid]).max() < 5e-4


def test_lora_zero_init_is_identity(key):
    cfg0 = LlamaConfig(**TINY)
    cfg1 = LlamaConfig(**dict(TINY, lora_rank=4))
    m1 = LlamaModel(cfg1, dtype=jnp.float32)
    ids = jnp.ones((2, 8), jnp.int32)
    v1 = m1.init(key, ids)
    # lora_B zero-init -> adapter contributes nothing initially
    out1 = m1.apply(v1, ids)["last_hidden_state"]
    merged = {"params": merge_lora_params(v1["params"], cfg1.lora_alpha)}
    m0 = LlamaModel(cfg0, dtype=jnp.float32)
    out0 = m0.apply(merged, ids)["last_hidden_state"]
    assert np.allclose(np.asarray(out1), np.asarray(out0), atol=1e-5)

    # filter marks only lora params trainable
    mask = lora_param_filter(v1["params"])
    flat = jax.tree_util.tree_leaves(mask)
    assert any(flat) and not all(flat)
    adapters = extract_lora_params(v1["params"])
    assert adapters  # non-empty


def test_decoder_only_embedder_train_and_merge(tmp_path, key):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFLC, LlamaModel as HFLlama

    # local HF llama checkpoint
    d = str(tmp_path / "llm")
    HFLlama(HFLC(**TINY)).save_pretrained(d)

    from nexus_tpu.training.embedder.text_retrieval.arguments import TextEmbedderModelArguments
    from nexus_tpu.training.embedder.text_retrieval.decoder_only import (
        BiDecoderOnlyEmbedderModel,
        find_largest_checkpoint,
    )

    margs = TextEmbedderModelArguments(dtype="float32", temperature=0.1)
    model = BiDecoderOnlyEmbedderModel.from_pretrained(d, margs, lora_rank=4)
    assert model.uses_lora
    variables = model.init_variables(key)

    # one training step with adapter-only optimizer masking
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.trainer import RecTrainer

    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / "out"), num_train_epochs=1, max_steps=2,
        per_device_train_batch_size=1, learning_rate=0.05, logging_steps=10,
        optimizer="adamw", evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs, )
    state0 = trainer.init_state()
    base_kernel_before = np.asarray(
        jax.tree_util.tree_leaves(state0.params["layers"]["layer"]["self_attn"]["q_proj"]["base"])[0]
    )
    rng = np.random.default_rng(0)
    B, G, L = 8, 2, 10
    batch = {
        "query_input_ids": rng.integers(1, 63, (B, L)).astype(np.int32),
        "query_attention_mask": np.ones((B, L), np.int32),
        "passage_input_ids": rng.integers(1, 63, (B * G, L)).astype(np.int32),
        "passage_attention_mask": np.ones((B * G, L), np.int32),
    }
    state = trainer.train([batch, batch])
    # base weights frozen, adapters moved
    base_kernel_after = np.asarray(
        jax.tree_util.tree_leaves(state.params["layers"]["layer"]["self_attn"]["q_proj"]["base"])[0]
    )
    assert np.allclose(base_kernel_before, base_kernel_after)
    lora_b = np.asarray(state.params["layers"]["layer"]["self_attn"]["q_proj"]["lora_B"])
    assert np.abs(lora_b).max() > 0  # adapters trained

    # save adapters + merged model; reload merged
    model.save(str(tmp_path / "adapters"), state.variables)
    assert os.path.exists(str(tmp_path / "adapters" / "adapter_model.msgpack"))
    model.save_merged_model(str(tmp_path / "merged"), state.variables)
    merged = BiDecoderOnlyEmbedderModel.from_pretrained(str(tmp_path / "merged"))
    assert not merged.uses_lora
    ids = jnp.asarray(batch["query_input_ids"])
    mask = jnp.asarray(batch["query_attention_mask"])
    r1 = model.encode(state.variables, ids, mask)
    r2 = merged.encode(merged.variables, ids, mask)
    assert np.allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)

    # find_largest_checkpoint helper
    os.makedirs(str(tmp_path / "cks" / "checkpoint-10"))
    os.makedirs(str(tmp_path / "cks" / "checkpoint-200"))
    assert find_largest_checkpoint(str(tmp_path / "cks")).endswith("checkpoint-200")


def test_llm_embedder_through_inference_engine(tmp_path, key):
    """LLM embedder inference parity: a decoder-only model flows through the
    standard TextEmbedder engine (last-token pooling, left-pad-safe)."""
    pytest.importorskip("torch")
    from transformers import BertTokenizerFast, LlamaConfig as HFLC, LlamaModel as HFLlama

    d = str(tmp_path / "llm")
    HFLlama(HFLC(**dict(TINY, vocab_size=32))).save_pretrained(d)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [f"w{i}" for i in range(27)]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(tmp_path / "vocab.txt"))

    from nexus_tpu.inference import TextEmbedder
    from nexus_tpu.training.embedder.text_retrieval.arguments import TextEmbedderModelArguments
    from nexus_tpu.training.embedder.text_retrieval.decoder_only import BiDecoderOnlyEmbedderModel

    model = BiDecoderOnlyEmbedderModel.from_pretrained(
        d, TextEmbedderModelArguments(dtype="float32")
    )
    assert model.args.sentence_pooling_method == "last_token"
    emb = TextEmbedder(model=model, tokenizer=tok, batch_size=2, max_length=16)
    reps = emb.encode_queries(["w1 w2 w3", "w4"])
    assert reps.shape == (2, TINY["hidden_size"])
    assert np.allclose(np.linalg.norm(reps, axis=-1), 1.0, atol=1e-3)


def test_decoder_packed_training_loss_matches_padded(key):
    """Packed contrastive TRAINING on the decoder embedder: the packed rows
    (restarting positions + segment attention, last-token pooling) must give
    the same loss and gradients as the padded layout. Covers the
    encode_packed positions= dispatch (decoder trunks take LlamaModel
    kwargs; the BERT-name position_ids= used to crash here)."""
    from nexus_tpu.ops.packing import pack_tokenized
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.decoder_only import (
        BiDecoderOnlyEmbedderModel,
    )

    cfg = LlamaConfig(**TINY)
    margs = TextEmbedderModelArguments(
        temperature=0.05, dtype="float32",
        sentence_pooling_method="last_token", normalize_embeddings=True,
    )
    model = BiDecoderOnlyEmbedderModel(cfg, margs)
    variables = model.init_variables(key)

    rng = np.random.default_rng(3)
    b, g, row = 4, 2, 32
    q_lens = rng.integers(3, 12, b)
    p_lens = rng.integers(5, 28, b * g)

    def padded(lens, n):
        ids = np.zeros((n, row), np.int32)
        for i, l in enumerate(lens):
            ids[i, :l] = rng.integers(2, 64, l)
        return ids, (ids != 0).astype(np.int32)

    q_ids, q_mask = padded(q_lens, b)
    p_ids, p_mask = padded(p_lens, b * g)
    batch_pad = {
        "query_input_ids": jnp.asarray(q_ids),
        "query_attention_mask": jnp.asarray(q_mask),
        "passage_input_ids": jnp.asarray(p_ids),
        "passage_attention_mask": jnp.asarray(p_mask),
    }
    batch_pack = {}
    for prefix, (ids, mask) in (("query", (q_ids, q_mask)),
                                ("passage", (p_ids, p_mask))):
        pk = pack_tokenized(ids, mask, row_len=row, row_bucket=2)
        batch_pack.update({f"{prefix}_{k}": jnp.asarray(v) for k, v in pk.items()})

    def loss_of(batch):
        def f(params):
            return model.loss_fn({"params": params}, batch, jax.random.PRNGKey(0))[0]
        return jax.value_and_grad(f)(variables["params"])

    l_pad, g_pad = loss_of(batch_pad)
    l_pack, g_pack = loss_of(batch_pack)
    np.testing.assert_allclose(float(l_pad), float(l_pack), rtol=1e-5)
    for a, bb in zip(jax.tree_util.tree_leaves(g_pad),
                     jax.tree_util.tree_leaves(g_pack)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=1e-6)


def test_lora_trainer_masks_optimizer_from_fresh_init(tmp_path):
    """RecTrainer must apply the LoRA trainable mask even when variables
    come from a fresh init (not from_pretrained): a silent full-tree AdamW
    used to allocate f32 moments for the frozen trunk — 8.3 GB of dead
    optimizer state at Llama-1B scale (found via an HBM compile OOM)."""
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.decoder_only import (
        BiDecoderOnlyEmbedderModel,
    )
    from nexus_tpu.training.trainer import RecTrainer

    cfg = LlamaConfig(**TINY, lora_rank=4)
    model = BiDecoderOnlyEmbedderModel(
        cfg, TextEmbedderModelArguments(dtype="float32"))
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path), num_train_epochs=1,
        per_device_train_batch_size=2, learning_rate=1e-4,
        optimizer="adamw", logging_steps=1000, evaluation_strategy="no"))
    trainer = RecTrainer(model, targs)
    state = trainer.init_state()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    n_opt = sum(x.size for x in jax.tree_util.tree_leaves(state.opt_state)
                if hasattr(x, "size"))
    assert n_opt < 0.2 * n_params, (
        f"optimizer state {n_opt} vs params {n_params}: LoRA mask not applied")
