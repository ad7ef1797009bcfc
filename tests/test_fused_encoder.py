"""Fused encoder megakernel (ops/fused_encoder.py): op- and model-level
parity vs the unfused XLA path, gradient parity through the custom vjp,
and the param-tree compatibility contract of attention_impl='fused'."""

import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.models.bert import BertConfig, BertEncoderModel
from nexus_tpu.ops.fused_encoder import (
    _unfused_reference,
    fused_attention_ln,
    fused_supported,
)

H, HEADS = 128, 2
EPS = 1e-12


def _params(key, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    s = 0.05
    return dict(
        wqkv=(jax.random.normal(ks[0], (H, 3 * H)) * s).astype(dtype),
        bqkv=jax.random.normal(ks[1], (3 * H,)) * s,
        wo=(jax.random.normal(ks[2], (H, H)) * s).astype(dtype),
        bo=jax.random.normal(ks[3], (H,)) * s,
        gamma=1.0 + jax.random.normal(ks[4], (H,)) * 0.1,
        beta=jax.random.normal(ks[5], (H,)) * 0.1,
    )


def _xla_oracle(x, p, allowed):
    """Plain-einsum attention block with an explicit [B, L, L] key mask."""
    b, l, h = x.shape
    d = h // HEADS
    qkv = jnp.dot(x, p["wqkv"]) + p["bqkv"]
    q, k, v = jnp.split(qkv.astype(x.dtype), 3, axis=-1)
    to4 = lambda t: t.reshape(b, l, HEADS, d)  # noqa: E731
    s = jnp.einsum("bqhd,bkhd->bhqk", to4(q), to4(k)).astype(jnp.float32)
    s = s / np.sqrt(d)
    s = jnp.where(allowed[:, None], s, -1e30)
    pr = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", pr, to4(v)).reshape(b, l, h)
    out = jnp.dot(ctx, p["wo"]) + p["bo"]
    res = x.astype(jnp.float32) + out
    mu = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean((res - mu) ** 2, axis=-1, keepdims=True)
    y = (res - mu) * jax.lax.rsqrt(var + EPS)
    return (y * p["gamma"] + p["beta"]).astype(x.dtype)


def test_fused_padded_matches_oracle(key):
    b, l = 3, 48  # 48 exercises the lane-pad-to-128 path
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(7), (b, l, H)) * 0.5
    lengths = jnp.array([48, 30, 7], jnp.int32)
    got = fused_attention_ln(x, p["wqkv"], p["bqkv"], p["wo"], p["bo"],
                             p["gamma"], p["beta"], lengths=lengths,
                             heads=HEADS, eps=EPS)
    allowed = jnp.arange(l)[None, None, :] < lengths[:, None, None]
    want = _xla_oracle(x, p, jnp.broadcast_to(allowed, (b, l, l)))
    valid = np.asarray(jnp.arange(l)[None, :] < lengths[:, None])
    diff = np.abs(np.asarray(got) - np.asarray(want))[valid]
    assert diff.max() < 1e-4, diff.max()


def test_fused_segment_matches_oracle(key):
    b, l = 2, 64
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(8), (b, l, H)) * 0.5
    seg = np.zeros((b, l), np.int32)
    seg[0, :20] = 1
    seg[0, 20:50] = 2
    seg[1, :33] = 1
    seg = jnp.asarray(seg)
    got = fused_attention_ln(x, p["wqkv"], p["bqkv"], p["wo"], p["bo"],
                             p["gamma"], p["beta"], segment_ids=seg,
                             heads=HEADS, eps=EPS)
    allowed = (seg[:, :, None] == seg[:, None, :]) & (seg[:, None, :] > 0)
    want = _xla_oracle(x, p, allowed)
    valid = np.asarray(seg > 0)
    diff = np.abs(np.asarray(got) - np.asarray(want))[valid]
    assert diff.max() < 1e-4, diff.max()


def test_fused_unfused_reference_agrees(key):
    """The custom-vjp recompute graph computes the same function as the
    fused forward (valid rows)."""
    b, l = 2, 128
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(9), (b, l, H)) * 0.5
    lengths = jnp.array([128, 70], jnp.int32)
    got = fused_attention_ln(x, p["wqkv"], p["bqkv"], p["wo"], p["bo"],
                             p["gamma"], p["beta"], lengths=lengths,
                             heads=HEADS, eps=EPS)
    want = _unfused_reference(x, p["wqkv"], p["bqkv"], p["wo"], p["bo"],
                              p["gamma"], p["beta"], lengths, HEADS, EPS,
                              seg_mode=False)
    valid = np.asarray(jnp.arange(l)[None, :] < lengths[:, None])
    diff = np.abs(np.asarray(got) - np.asarray(want))[valid]
    assert diff.max() < 1e-4, diff.max()


def test_fused_pad_rows_match_recompute_graph(key):
    """Padded-mode fused forward must equal the flash recompute graph on
    EVERY row including pad queries (flash_attention_padded zeroes the
    attention context there; the kernel applies the same q_valid mask), so
    the custom-vjp gradient stays consistent even for losses that touch pad
    positions. A linear cotangent that HITS pad rows checks the gradient
    convention end to end: the backward megakernel zeroes masked
    probabilities and dctx at pad queries exactly like the flash backward,
    so grads agree to f32 reassociation tolerance."""
    b, l = 3, 64
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(11), (b, l, H)) * 0.5
    lengths = jnp.array([64, 31, 6], jnp.int32)
    args = (p["wqkv"], p["bqkv"], p["wo"], p["bo"], p["gamma"], p["beta"])
    got = fused_attention_ln(x, *args, lengths=lengths, heads=HEADS, eps=EPS)
    want = _unfused_reference(x, *args, lengths, HEADS, EPS, seg_mode=False)
    # FULL-tensor comparison — pad rows included
    diff = np.abs(np.asarray(got) - np.asarray(want))
    assert diff.max() < 1e-4, diff.max()
    w = jax.random.normal(jax.random.PRNGKey(12), (b, l, H))  # hits pad rows
    g_fused = jax.grad(lambda x_: jnp.sum(fused_attention_ln(
        x_, *args, lengths=lengths, heads=HEADS, eps=EPS) * w))(x)
    g_ref = jax.grad(lambda x_: jnp.sum(_unfused_reference(
        x_, *args, lengths, HEADS, EPS, seg_mode=False) * w))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=0, atol=1e-5)


def test_fused_grad_matches_xla_autodiff(key):
    """Gradients through the custom vjp (flash recompute) match plain XLA
    autodiff of the same function, for inputs AND weights."""
    b, l = 2, 128
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(10), (b, l, H)) * 0.5
    lengths = jnp.array([128, 90], jnp.int32)
    valid = (jnp.arange(l)[None, :] < lengths[:, None])[..., None]

    def loss_fused(x, p):
        y = fused_attention_ln(x, p["wqkv"], p["bqkv"], p["wo"], p["bo"],
                               p["gamma"], p["beta"], lengths=lengths,
                               heads=HEADS, eps=EPS)
        return jnp.sum(jnp.where(valid, y, 0.0) ** 2)

    def loss_xla(x, p):
        allowed = jnp.broadcast_to(
            jnp.arange(l)[None, None, :] < lengths[:, None, None], (b, l, l))
        y = _xla_oracle(x, p, allowed)
        return jnp.sum(jnp.where(valid, y, 0.0) ** 2)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx_x, gp_x = jax.grad(loss_xla, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               atol=2e-3, rtol=1e-2)
    for k in p:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_x[k]),
                                   atol=2e-3, rtol=1e-2, err_msg=k)


def test_fused_segment_grads_match_xla_autodiff(key):
    """Backward-megakernel weight/input grads in SEGMENT (packed) mode match
    XLA autodiff — includes a fully-padding (seg 0) region and multiple rows
    accumulating into the same VMEM-resident weight-grad blocks."""
    b, l = 3, 128
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(13), (b, l, H)) * 0.5
    seg = np.zeros((b, l), np.int32)
    seg[0, :50] = 1
    seg[0, 50:100] = 2
    seg[1, :128] = 1
    seg[2, :17] = 1
    seg = jnp.asarray(seg)
    valid = (seg > 0)[..., None]

    def loss_fused(x, p):
        y = fused_attention_ln(x, p["wqkv"], p["bqkv"], p["wo"], p["bo"],
                               p["gamma"], p["beta"], segment_ids=seg,
                               heads=HEADS, eps=EPS)
        return jnp.sum(jnp.where(valid, y, 0.0) ** 2)

    def loss_xla(x, p):
        allowed = (seg[:, :, None] == seg[:, None, :]) & (seg[:, None, :] > 0)
        y = _xla_oracle(x, p, allowed)
        return jnp.sum(jnp.where(valid, y, 0.0) ** 2)

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx_x, gp_x = jax.grad(loss_xla, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               atol=2e-3, rtol=1e-2)
    for k in p:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_x[k]),
                                   atol=2e-3, rtol=1e-2, err_msg=k)


FUSED_TINY = dict(
    vocab_size=130,
    hidden_size=H,
    num_hidden_layers=2,
    num_attention_heads=HEADS,
    intermediate_size=256,
    max_position_embeddings=64,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


def test_bert_fused_matches_xla_and_shares_param_tree(key):
    """attention_impl='fused' computes the same model AND creates the same
    param tree as the unfused path (the checkpoint/hf_convert contract)."""
    cfg_x = BertConfig(**FUSED_TINY)
    cfg_f = BertConfig(**dict(FUSED_TINY, attention_impl="fused"))
    ids = jnp.concatenate(
        [jnp.full((2, 10), 5, jnp.int32), jnp.zeros((2, 6), jnp.int32)], axis=1)
    mask = (ids != 0).astype(jnp.int32)
    mx = BertEncoderModel(cfg_x)
    mf = BertEncoderModel(cfg_f)
    vx = mx.init(key, ids)
    vf = mf.init(key, ids)
    assert (jax.tree_util.tree_structure(vx) == jax.tree_util.tree_structure(vf))
    shapes_x = jax.tree_util.tree_map(lambda t: t.shape, vx)
    shapes_f = jax.tree_util.tree_map(lambda t: t.shape, vf)
    assert shapes_x == shapes_f
    out_x = mx.apply(vx, ids, attention_mask=mask)["last_hidden_state"]
    out_f = mf.apply(vx, ids, attention_mask=mask)["last_hidden_state"]
    valid = np.asarray(mask).astype(bool)
    dx = np.abs(np.asarray(out_x) - np.asarray(out_f))[valid]
    assert dx.max() < 1e-4, dx.max()


def test_bert_fused_packed_segments(key):
    """Fused path with packed rows (segment_ids) matches the XLA path."""
    cfg_x = BertConfig(**FUSED_TINY)
    cfg_f = BertConfig(**dict(FUSED_TINY, attention_impl="fused"))
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 129, (2, 32)), jnp.int32)
    seg = np.zeros((2, 32), np.int32)
    seg[0, :12] = 1
    seg[0, 12:25] = 2
    seg[1, :30] = 1
    seg = jnp.asarray(seg)
    pos = jnp.where(seg > 0, jnp.arange(32)[None, :], 0)
    mx = BertEncoderModel(cfg_x)
    v = mx.init(key, ids)
    out_x = mx.apply(v, ids, segment_ids=seg, position_ids=pos)["last_hidden_state"]
    out_f = BertEncoderModel(cfg_f).apply(
        v, ids, segment_ids=seg, position_ids=pos)["last_hidden_state"]
    valid = np.asarray(seg > 0)
    dx = np.abs(np.asarray(out_x) - np.asarray(out_f))[valid]
    assert dx.max() < 1e-4, dx.max()


def test_fused_full_layer_matches_oracle_and_grads(key):
    """fused_encoder_layer (attention + FFN + both LNs in one program)
    matches the unfused reference, and its custom-vjp grads match XLA
    autodiff."""
    from nexus_tpu.ops.fused_encoder import (_unfused_layer_reference,
                                             fused_encoder_layer)

    b, l, ff = 2, 128, 256
    ks = jax.random.split(key, 7)
    s = 0.05
    p = _params(key)
    weights = (
        p["wqkv"], p["bqkv"], p["wo"], p["bo"], p["gamma"], p["beta"],
        jax.random.normal(ks[0], (H, ff)) * s,
        jax.random.normal(ks[1], (ff,)) * s,
        jax.random.normal(ks[2], (ff, H)) * s,
        jax.random.normal(ks[3], (H,)) * s,
        1.0 + jax.random.normal(ks[4], (H,)) * 0.1,
        jax.random.normal(ks[5], (H,)) * 0.1,
    )
    x = jax.random.normal(ks[6], (b, l, H)) * 0.5
    lengths = jnp.array([128, 77], jnp.int32)
    got = fused_encoder_layer(x, weights, lengths=lengths, heads=HEADS, eps=EPS)
    want = _unfused_layer_reference(x, weights, lengths, HEADS, EPS, "gelu",
                                    seg_mode=False)
    valid = np.asarray(jnp.arange(l)[None, :] < lengths[:, None])
    diff = np.abs(np.asarray(got) - np.asarray(want))[valid]
    assert diff.max() < 1e-4, diff.max()

    vmask = (jnp.arange(l)[None, :] < lengths[:, None])[..., None]

    def loss_fused(x, w):
        y = fused_encoder_layer(x, w, lengths=lengths, heads=HEADS, eps=EPS)
        return jnp.sum(jnp.where(vmask, y, 0.0) ** 2)

    def loss_ref(x, w):
        y = _unfused_layer_reference(x, w, lengths, HEADS, EPS, "gelu",
                                     seg_mode=False)
        return jnp.sum(jnp.where(vmask, y, 0.0) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, weights)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, weights)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-3, rtol=1e-2)
    for i, (a, bb) in enumerate(zip(gw_f, gw_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-3, rtol=1e-2, err_msg=f"w[{i}]")


def test_bert_fused_attn_only_fallback(key):
    """intermediate_size not a lane multiple -> the FFN stays unfused but
    the attention block still fuses; output matches xla."""
    cfg = dict(FUSED_TINY, intermediate_size=192)
    cfg_x = BertConfig(**cfg)
    cfg_f = BertConfig(**dict(cfg, attention_impl="fused"))
    ids = jnp.concatenate(
        [jnp.full((2, 9), 5, jnp.int32), jnp.zeros((2, 7), jnp.int32)], axis=1)
    mask = (ids != 0).astype(jnp.int32)
    mx = BertEncoderModel(cfg_x)
    v = mx.init(key, ids)
    out_x = mx.apply(v, ids, attention_mask=mask)["last_hidden_state"]
    out_f = BertEncoderModel(cfg_f).apply(v, ids, attention_mask=mask)["last_hidden_state"]
    valid = np.asarray(mask).astype(bool)
    dx = np.abs(np.asarray(out_x) - np.asarray(out_f))[valid]
    assert dx.max() < 1e-4, dx.max()


def test_fused_gate_and_train_dropout(key):
    """Unsupported shapes are gated off; training with HIDDEN dropout runs
    THROUGH the fused path (key-derived mask operands) and actually applies
    it — different dropout rngs change the output, and train=False matches
    the deterministic path."""
    assert not fused_supported(96, 2, 64)      # H % 128
    assert not fused_supported(256, 2, 2048)   # L too long for VMEM scores
    assert fused_supported(768, 12, 512)
    cfg = BertConfig(**dict(FUSED_TINY, attention_impl="fused",
                            hidden_dropout_prob=0.3))
    model = BertEncoderModel(cfg)
    ids = jnp.full((2, 16), 7, jnp.int32)
    v = model.init(key, ids)
    a = model.apply(v, ids, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(v, ids, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(a["last_hidden_state"])
                  - np.asarray(b["last_hidden_state"])).max() > 1e-6
    # eval mode: no dropout, matches the unfused deterministic path
    det_f = model.apply(v, ids)["last_hidden_state"]
    det_x = BertEncoderModel(BertConfig(**dict(
        FUSED_TINY, hidden_dropout_prob=0.3))).apply(v, ids)["last_hidden_state"]
    assert np.abs(np.asarray(det_f) - np.asarray(det_x)).max() < 1e-4


def test_fused_dropout_matches_oracle_with_same_masks(key):
    """Fused forward AND custom-vjp grads with dropout equal an XLA oracle
    applying the IDENTICAL key-derived multipliers (incl. the backward
    regenerating the mask from the saved key rather than storing it)."""
    from nexus_tpu.ops.fused_encoder import _gen_drops

    b, l, rate = 2, 64, 0.4
    p = _params(key)
    x = jax.random.normal(jax.random.PRNGKey(20), (b, l, H)) * 0.5
    lengths = jnp.array([64, 39], jnp.int32)
    rng = jax.random.PRNGKey(77)
    (drop1,) = _gen_drops(rng, rate, x.shape, x.dtype, 1)
    valid = (jnp.arange(l)[None, :] < lengths[:, None])[..., None]

    def fwd_fused(x, p):
        return fused_attention_ln(x, p["wqkv"], p["bqkv"], p["wo"], p["bo"],
                                  p["gamma"], p["beta"], lengths=lengths,
                                  heads=HEADS, eps=EPS, dropout_rate=rate,
                                  dropout_rng=rng)

    allowed = jnp.broadcast_to(
        jnp.arange(l)[None, None, :] < lengths[:, None, None], (b, l, l))

    def fwd_xla(x, p):
        return _xla_oracle_dropped(x, p, allowed, drop1)

    loss_fused = lambda x, p: jnp.sum(jnp.where(valid, fwd_fused(x, p), 0.0) ** 2)  # noqa: E731
    loss_xla = lambda x, p: jnp.sum(jnp.where(valid, fwd_xla(x, p), 0.0) ** 2)  # noqa: E731
    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx_x, gp_x = jax.grad(loss_xla, argnums=(0, 1))(x, p)
    vm = np.asarray(valid)[..., 0]
    y_f, y_x = fwd_fused(x, p), fwd_xla(x, p)
    assert np.abs(np.asarray(y_f) - np.asarray(y_x))[vm].max() < 1e-4
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x),
                               atol=2e-3, rtol=1e-2)
    for k in p:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_x[k]),
                                   atol=2e-3, rtol=1e-2, err_msg=k)


def _xla_oracle_dropped(x, p, allowed, drop1):
    """_xla_oracle with an explicit dropout multiplier at the attention
    output (before the residual), matching the fused kernel's site."""
    b, l, h = x.shape
    d = h // HEADS
    qkv = jnp.dot(x, p["wqkv"]) + p["bqkv"]
    q, k, v = jnp.split(qkv.astype(x.dtype), 3, axis=-1)
    to4 = lambda t: t.reshape(b, l, HEADS, d)  # noqa: E731
    s = jnp.einsum("bqhd,bkhd->bhqk", to4(q), to4(k)).astype(jnp.float32)
    s = s / np.sqrt(d)
    s = jnp.where(allowed[:, None], s, -1e30)
    pr = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", pr, to4(v)).reshape(b, l, h)
    out = (jnp.dot(ctx, p["wo"]) + p["bo"]) * drop1.astype(jnp.float32)
    res = x.astype(jnp.float32) + out
    mu = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean((res - mu) ** 2, axis=-1, keepdims=True)
    y = (res - mu) * jax.lax.rsqrt(var + EPS)
    return (y * p["gamma"] + p["beta"]).astype(x.dtype)


def test_fused_layer_dropout_grads(key):
    """Full-layer fused path with dropout: grads match the unfused layer
    reference given the SAME two masks."""
    from nexus_tpu.ops.fused_encoder import (_gen_drops,
                                             _unfused_layer_reference,
                                             fused_encoder_layer)

    b, l, ff, rate = 2, 64, 256, 0.25
    ks = jax.random.split(key, 7)
    s = 0.05
    p = _params(key)
    weights = (
        p["wqkv"], p["bqkv"], p["wo"], p["bo"], p["gamma"], p["beta"],
        jax.random.normal(ks[0], (H, ff)) * s,
        jax.random.normal(ks[1], (ff,)) * s,
        jax.random.normal(ks[2], (ff, H)) * s,
        jax.random.normal(ks[3], (H,)) * s,
        1.0 + jax.random.normal(ks[4], (H,)) * 0.1,
        jax.random.normal(ks[5], (H,)) * 0.1,
    )
    x = jax.random.normal(ks[6], (b, l, H)) * 0.5
    lengths = jnp.array([64, 41], jnp.int32)
    rng = jax.random.PRNGKey(5)
    drops = _gen_drops(rng, rate, x.shape, x.dtype, 2)
    vmask = (jnp.arange(l)[None, :] < lengths[:, None])[..., None]

    def loss_fused(x, w):
        y = fused_encoder_layer(x, w, lengths=lengths, heads=HEADS, eps=EPS,
                                dropout_rate=rate, dropout_rng=rng)
        return jnp.sum(jnp.where(vmask, y, 0.0) ** 2)

    def loss_ref(x, w):
        y = _unfused_layer_reference(x, w, lengths, HEADS, EPS, "gelu",
                                     seg_mode=False, drops=drops)
        return jnp.sum(jnp.where(vmask, y, 0.0) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, weights)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, weights)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-3, rtol=1e-2)
    for i, (a, bb) in enumerate(zip(gw_f, gw_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-3, rtol=1e-2, err_msg=f"w[{i}]")


def test_left_padded_masks_knob(key):
    """right_padded_masks=False routes pallas/fused attention through the
    full mask (segment ids) instead of the lengths reduction — LEFT-padded
    batches then match the xla path on valid rows."""
    ids = np.zeros((2, 48), np.int32)
    rng = np.random.default_rng(6)
    ids[0, :] = rng.integers(1, 90, 48)
    ids[1, 48 - 11:] = rng.integers(1, 90, 11)  # LEFT-padded row
    mask = (ids != 0).astype(np.int32)
    outs = {}
    for impl in ("xla", "pallas", "fused"):
        cfg = BertConfig(vocab_size=97, hidden_size=H, num_hidden_layers=1,
                         num_attention_heads=HEADS, intermediate_size=256,
                         max_position_embeddings=64, hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0,
                         attention_impl=impl, right_padded_masks=False)
        net = BertEncoderModel(cfg, dtype=jnp.float32)
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
        outs[impl] = np.asarray(net.apply(
            v, jnp.asarray(ids), jnp.asarray(mask))["last_hidden_state"])
    valid = mask.astype(bool)
    for impl in ("pallas", "fused"):
        diff = np.abs(outs["xla"] - outs[impl])[valid].max()
        assert diff < 2e-4, (impl, diff)
