"""Ring attention (sequence/context parallelism) vs a single-device oracle."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.ops.ring_attention import ring_attention
from nexus_tpu.parallel.mesh import make_mesh


def _oracle(q, k, v, seg, causal=False):
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    valid = (seg[:, None, :, None] == seg[:, None, None, :]) & (seg[:, None, :, None] > 0)
    if causal:
        L = q.shape[2]
        pos = jnp.arange(L)
        valid = valid & (pos[:, None] >= pos[None, :])[None, None]
    s = jnp.where(valid, s, -1e30)
    p = jnp.where(valid, jax.nn.softmax(s, axis=-1), 0.0)
    # fully-masked rows: softmax of all -1e30 is uniform — zero them like flash
    any_valid = jnp.any(valid, axis=-1, keepdims=True)
    p = jnp.where(any_valid, p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _mesh(s=4):
    if len(jax.devices()) < s:
        pytest.skip("needs multi-device mesh")
    return make_mesh({"sp": s}, devices=jax.devices()[:s])


def _inputs(seed, b=2, h=2, L=32, d=8):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, L, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_padded_parity(causal):
    mesh = _mesh(4)
    q, k, v = _inputs(0)
    seg = np.ones((2, 32), np.int32)
    seg[0, 25:] = 0  # padded tail crossing a chunk boundary
    seg[1, 10:] = 0  # a whole trailing chunk of padding
    seg = jnp.asarray(seg)
    ref = _oracle(q, k, v, seg, causal)
    out = ring_attention(q, k, v, seg, mesh=mesh, causal=causal)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-6)


def test_ring_attention_packed_segments():
    mesh = _mesh(4)
    q, k, v = _inputs(1)
    rng = np.random.default_rng(2)
    seg = np.zeros((2, 32), np.int32)
    for b in range(2):  # ragged packed segments, pad tail
        off = 0
        for sid in range(1, 5):
            ln = int(rng.integers(3, 10))
            seg[b, off : off + ln] = sid
            off += ln
            if off >= 30:
                break
    seg = jnp.asarray(seg)
    ref = _oracle(q, k, v, seg)
    out = ring_attention(q, k, v, seg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-6)


def test_ring_attention_grad_parity():
    mesh = _mesh(4)
    q, k, v = _inputs(3)
    seg = jnp.asarray(np.ones((2, 32), np.int32))
    tgt = jnp.asarray(np.random.default_rng(4).standard_normal(q.shape), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, seg, mesh=mesh, causal=True) * tgt)

    def loss_ref(q, k, v):
        return jnp.sum(_oracle(q, k, v, seg, causal=True) * tgt)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_ring_attention_validates_divisibility():
    mesh = _mesh(4)
    q, k, v = _inputs(5, L=30)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, jnp.ones((2, 30), jnp.int32), mesh=mesh)


def test_ring_attention_grad_parity_packed():
    """The ring custom-vjp backward (recompute off saved lse, accumulators
    riding the rotation) matches the oracle on packed segments with pad."""
    mesh = _mesh(4)
    q, k, v = _inputs(6)
    seg = np.zeros((2, 32), np.int32)
    seg[0, :12] = 1
    seg[0, 12:27] = 2
    seg[1, :9] = 1
    seg[1, 9:20] = 2
    seg[1, 20:30] = 3
    seg = jnp.asarray(seg)
    tgt = jnp.asarray(np.random.default_rng(7).standard_normal(q.shape), jnp.float32)

    g_ring = jax.grad(lambda q, k, v: jnp.sum(
        ring_attention(q, k, v, seg, mesh=mesh) * tgt), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(
        _oracle(q, k, v, seg) * tgt), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)


def test_llama_ring_attention_impl_matches_xla():
    """attention_impl='ring' + LlamaModel(ring_mesh=...): the full decoder
    stack runs with its sequence sharded over the sp axis and matches the
    xla attention path, forward and gradient."""
    import dataclasses

    from nexus_tpu.models.llama import LlamaConfig, LlamaModel

    mesh = _mesh(4)
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64)
    rng = np.random.default_rng(8)
    ids = jnp.asarray(rng.integers(2, 96, (2, 32)), jnp.int32)
    mask = np.ones((2, 32), np.int32)
    mask[0, 28:] = 0
    mask = jnp.asarray(mask)

    ref_model = LlamaModel(cfg, dtype=jnp.float32)
    variables = ref_model.init(jax.random.PRNGKey(0), ids)
    ref = ref_model.apply(variables, ids, attention_mask=mask)["last_hidden_state"]

    ring_model = LlamaModel(dataclasses.replace(cfg, attention_impl="ring"),
                            dtype=jnp.float32, ring_mesh=mesh)
    out = ring_model.apply(variables, ids, attention_mask=mask)["last_hidden_state"]
    # pad-row convention differs (ring zeroes fully-masked query rows like
    # flash; xla lets pad queries attend) — compare the valid positions
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(ref)[valid], np.asarray(out)[valid],
                               rtol=2e-5, atol=2e-6)

    tgt = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)

    def loss(model):
        return lambda v: jnp.sum(
            model.apply(v, ids, attention_mask=mask)["last_hidden_state"]
            * tgt * mask[..., None])

    g_ref = jax.grad(loss(ref_model))(variables)
    g_ring = jax.grad(loss(ring_model))(variables)
    # chunked online-softmax rescaling reorders the f32 reductions; through
    # a 2-layer stack the noise reaches ~6e-5 on grads of magnitude ~2e-2
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_ring)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_decoder_embedder_ring_loss_matches_default():
    """BiDecoderOnlyEmbedderModel(ring_mesh=...) with attention_impl='ring':
    the contrastive loss_fn matches the default (xla-attention) model on the
    same batch — the sequence-parallel trunk is transparent to the embedder
    training objective."""
    from nexus_tpu.models.llama import LlamaConfig
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.decoder_only import (
        BiDecoderOnlyEmbedderModel,
    )

    mesh = _mesh(4)
    cfg = LlamaConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=64)
    margs = TextEmbedderModelArguments(
        temperature=0.05, dtype="float32",
        sentence_pooling_method="last_token")

    ref = BiDecoderOnlyEmbedderModel(
        LlamaConfig.from_dict(cfg.to_dict()), margs)
    variables = ref.init_variables(jax.random.PRNGKey(0))

    ring_cfg = LlamaConfig.from_dict(cfg.to_dict())
    import dataclasses as _dc
    ring_margs = _dc.replace(margs, attention_impl="ring")
    ring = BiDecoderOnlyEmbedderModel(ring_cfg, ring_margs, ring_mesh=mesh)
    assert ring_cfg.attention_impl == "ring"

    rng = np.random.default_rng(11)
    b, g, L = 2, 2, 32
    batch = {}
    for side, n in (("query", b), ("passage", b * g)):
        ids = rng.integers(2, 96, (n, L)).astype(np.int32)
        mask = np.ones((n, L), np.int32)
        for i in range(n):
            mask[i, int(rng.integers(L // 2, L)):] = 0
        ids = ids * mask
        batch[f"{side}_input_ids"] = jnp.asarray(ids)
        batch[f"{side}_attention_mask"] = jnp.asarray(mask)

    key = jax.random.PRNGKey(3)
    loss_ref, _ = ref.loss_fn(variables, batch, key)
    loss_ring, _ = ring.loss_fn(variables, batch, key)
    np.testing.assert_allclose(float(loss_ref), float(loss_ring), rtol=1e-4)
