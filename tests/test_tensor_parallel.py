"""Megatron-style tensor parallelism over the `model` mesh axis.

Beyond-reference capability (the reference's scaling story stops at ZeRO-1
data parallelism, SURVEY §2.4): `tensor_parallel_shardings` lays a
transformer trunk out column/row-parallel and GSPMD inserts the block
all-reduces. These tests prove (a) the specs land on the right leaves,
(b) forward + gradients are EXACT vs the replicated layout, and (c) the
trainer integration (`RecTrainer(shard_tensor_parallel=True)`) trains to
identical parameters on a 2x4 data x model mesh.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from nexus_tpu.parallel.mesh import MODEL_AXIS, make_mesh, tensor_parallel_shardings


def _tp_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh({"data": 2, "model": 4})


def _tiny_llama_cfg(**kw):
    from nexus_tpu.models.llama import LlamaConfig

    base = dict(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=32,
    )
    base.update(kw)
    return LlamaConfig(**base)


def test_tp_spec_assignment():
    """Column kernels shard the last dim, row kernels the input dim,
    norms/embeddings replicate, indivisible dims fall back to replicated."""
    mesh = _tp_mesh()
    from nexus_tpu.models.llama import LlamaModel

    model = LlamaModel(_tiny_llama_cfg())
    v = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    specs = tensor_parallel_shardings(v, mesh)

    def spec_of(*path):
        node = specs["params"]
        for k in path:
            node = node[k]
        return node.spec

    assert spec_of("layers", "layer", "self_attn", "q_proj", "kernel") == P(None, None, MODEL_AXIS)
    assert spec_of("layers", "layer", "self_attn", "o_proj", "kernel") == P(None, MODEL_AXIS, None)
    assert spec_of("layers", "layer", "mlp", "up_proj", "kernel") == P(None, None, MODEL_AXIS)
    assert spec_of("layers", "layer", "mlp", "down_proj", "kernel") == P(None, MODEL_AXIS, None)
    assert spec_of("layers", "layer", "input_layernorm", "weight") == P()
    assert spec_of("embed_tokens", "embedding") == P()

    # an indivisible output dim (kv out = 1 head x 6 = 6, not % 4) replicates
    odd = LlamaModel(_tiny_llama_cfg(hidden_size=24, num_attention_heads=4,
                                     num_key_value_heads=1))
    v2 = odd.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    specs2 = tensor_parallel_shardings(v2, mesh)
    kv = specs2["params"]["layers"]["layer"]["self_attn"]["k_proj"]["kernel"]
    assert kv.is_fully_replicated


def test_llama_tp_forward_and_grad_parity():
    """Loss and full gradient tree match the replicated layout exactly
    (same math, different partitioning)."""
    mesh = _tp_mesh()
    from nexus_tpu.models.llama import LlamaModel

    model = LlamaModel(_tiny_llama_cfg(), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 96, (4, 16)), jnp.int32)
    mask = jnp.asarray((rng.random((4, 16)) < 0.8), jnp.int32).at[:, 0].set(1)
    tgt = jnp.asarray(rng.standard_normal((4, 16, 32)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ids)

    def loss_fn(v):
        h = model.apply(v, ids, attention_mask=mask)["last_hidden_state"]
        return jnp.sum((h * tgt) * mask[..., None]) / ids.size

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(variables)

    tp_vars = jax.device_put(variables, tensor_parallel_shardings(variables, mesh))
    tp_loss, tp_grads = jax.jit(jax.value_and_grad(loss_fn))(tp_vars)

    np.testing.assert_allclose(float(ref_loss), float(tp_loss), rtol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_grads), jax.tree_util.tree_leaves(tp_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    d = tmp_path_factory.mktemp("tiny_bert_tp")
    words = ["the", "dog", "cat", "runs", "sits", "fast", "slow", "red", "blue", "sky"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    (d / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(d / "vocab.txt")).save_pretrained(str(d))
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    BertModel(cfg).save_pretrained(str(d))
    return str(d)


def test_trainer_tp_step_parity(tiny_bert_dir, tmp_path):
    """RecTrainer(shard_tensor_parallel=True) on a 2x4 mesh reaches the SAME
    parameters as the replicated trainer on the same batches."""
    mesh = _tp_mesh()
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval import (
        TextEmbedderDataArguments,
        TextEmbedderModelArguments,
        TextEmbedderRunner,
    )

    data = tmp_path / "train.jsonl"
    words = ["the", "dog", "cat", "runs", "sits", "fast", "slow", "red"]
    with open(data, "w") as f:
        for i in range(16):
            f.write(json.dumps({
                "query": f"{words[i % 8]} runs",
                "pos": [f"{words[i % 8]} {words[(i + 1) % 8]}"],
                "neg": [f"{words[(i + 3) % 8]} sits"],
            }) + "\n")

    def run(shard_tp, out):
        margs = TextEmbedderModelArguments(
            model_name_or_path=tiny_bert_dir, temperature=0.05, dtype="float32")
        dargs = TextEmbedderDataArguments(
            train_data=[str(data)], train_group_size=2,
            query_max_len=16, passage_max_len=16)
        targs = TrainingArguments.from_dict(dict(
            output_dir=str(tmp_path / out), num_train_epochs=1, max_steps=2,
            per_device_train_batch_size=4, learning_rate=1e-3, logging_steps=10,
            # sgd: updates stay LINEAR in the gradient, so layout parity is
            # tight (adam's rsqrt turns a sign flip of a ~0 gradient element
            # into a full ±lr divergence)
            optimizer="sgd", evaluation_strategy="no", seed=7, bf16=False,
        ))
        runner = TextEmbedderRunner(
            margs, dargs, targs, mesh=mesh,
            trainer_kwargs={"shard_tensor_parallel": shard_tp},
        )
        state = runner.run()
        if shard_tp:
            leaves = jax.tree_util.tree_leaves(state.params)
            assert any(not l.sharding.is_fully_replicated for l in leaves), (
                "TP produced no sharded parameters")
        return jax.tree_util.tree_map(np.asarray, jax.device_get(state.params))

    p_rep = run(False, "rep")
    p_tp = run(True, "tp")
    for a, b in zip(jax.tree_util.tree_leaves(p_rep), jax.tree_util.tree_leaves(p_tp)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_tp_optimizer_moments_mirror_param_specs(tiny_bert_dir, tmp_path):
    """Regression (review finding): moment shardings must mirror params
    STRUCTURALLY — shape-keyed matching collides under TP, where column
    q/k/v and row o projections share one shape."""
    mesh = _tp_mesh()
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel
    from nexus_tpu.training.trainer import RecTrainer

    model = BiTextEmbedderModel.from_pretrained(tiny_bert_dir)
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / "o"), num_train_epochs=1, max_steps=1,
        per_device_train_batch_size=4, learning_rate=1e-3, logging_steps=10,
        optimizer="adam", evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs, mesh=mesh, shard_tensor_parallel=True)
    state = trainer.init_state()

    p_leaves = jax.tree_util.tree_leaves(state.params)
    # adam: opt_state[0].mu / .nu are param-shaped trees
    mu_leaves = jax.tree_util.tree_leaves(state.opt_state[0].mu)
    nu_leaves = jax.tree_util.tree_leaves(state.opt_state[0].nu)
    assert len(mu_leaves) == len(p_leaves)
    for p, mu, nu in zip(p_leaves, mu_leaves, nu_leaves):
        assert mu.sharding.spec == p.sharding.spec, (p.shape, p.sharding.spec, mu.sharding.spec)
        assert nu.sharding.spec == p.sharding.spec
    assert any(not p.sharding.is_fully_replicated for p in p_leaves)
