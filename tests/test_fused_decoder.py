"""Fused decoder megakernel (ops/fused_decoder.py): op-level parity vs an
einsum oracle (GQA + RoPE + causal + right-padding, bias and qk-norm
variants), pad-row/custom-vjp consistency, and the param-tree compatibility
contract of LlamaConfig(attention_impl='fused')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.models.llama import LlamaConfig, LlamaModel
from nexus_tpu.ops.fused_decoder import (
    _unfused_reference,
    fused_decoder_attention,
    fused_decoder_supported,
    iota_rope_tables,
)

H, NQ, NKV, D = 128, 4, 2, 32
THETA, EPS = 10000.0, 1e-6


def _weights(key, bias=False, qk_norm=False):
    ks = jax.random.split(key, 7)
    s = 0.05
    qw = (NQ + 2 * NKV) * D
    w = dict(
        wqkv=(jax.random.normal(ks[0], (H, qw)) * s).astype(jnp.float32),
        wo=(jax.random.normal(ks[1], (NQ * D, H)) * s).astype(jnp.float32),
        rms_w=1.0 + jax.random.normal(ks[2], (H,)) * 0.1,
        bqkv=(jax.random.normal(ks[3], (qw,)) * s) if bias else None,
        q_norm_w=(1.0 + jax.random.normal(ks[4], (D,)) * 0.1) if qk_norm else None,
        k_norm_w=(1.0 + jax.random.normal(ks[5], (D,)) * 0.1) if qk_norm else None,
    )
    return w


def _oracle(x, w, lengths):
    """Plain-einsum decoder attention block with explicit masks."""
    b, l, h = x.shape
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(var + EPS) * w["rms_w"]
    qkv = xn @ w["wqkv"]
    if w["bqkv"] is not None:
        qkv = qkv + w["bqkv"]
    q = qkv[..., : NQ * D].reshape(b, l, NQ, D)
    k = qkv[..., NQ * D:(NQ + NKV) * D].reshape(b, l, NKV, D)
    v = qkv[..., (NQ + NKV) * D:].reshape(b, l, NKV, D)
    if w["q_norm_w"] is not None:
        q = q * jax.lax.rsqrt(jnp.mean(q * q, -1, keepdims=True) + EPS) * w["q_norm_w"]
        k = k * jax.lax.rsqrt(jnp.mean(k * k, -1, keepdims=True) + EPS) * w["k_norm_w"]
    pos = jnp.arange(l, dtype=jnp.float32)
    freqs = 1.0 / (THETA ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    ang = pos[:, None] * freqs[None, :]
    cos, sin = jnp.cos(ang)[None, :, None, :], jnp.sin(ang)[None, :, None, :]

    def rope(t):
        t1, t2 = t[..., : D // 2], t[..., D // 2:]
        return jnp.concatenate([t1 * cos - t2 * sin, t2 * cos + t1 * sin], -1)

    q, k = rope(q), rope(k)
    k = jnp.repeat(k, NQ // NKV, axis=2)
    v = jnp.repeat(v, NQ // NKV, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
    qpos, kpos = jnp.arange(l)[:, None], jnp.arange(l)[None, :]
    allowed = (kpos <= qpos)[None, None] & (
        kpos[None, None] < lengths[:, None, None, None])
    s = jnp.where(allowed, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, l, NQ * D)
    ctx = jnp.where((jnp.arange(l)[None, :] < lengths[:, None])[..., None], ctx, 0)
    return xf + ctx @ w["wo"]


def _call(x, w, lengths):
    return fused_decoder_attention(
        x, w["wqkv"], w["wo"], w["rms_w"], lengths, num_q_heads=NQ,
        num_kv_heads=NKV, head_dim=D, rope_theta=THETA, eps=EPS,
        bqkv=w["bqkv"], q_norm_w=w["q_norm_w"], k_norm_w=w["k_norm_w"])


@pytest.mark.parametrize("bias,qk_norm", [(False, False), (True, False),
                                          (False, True)])
def test_fused_decoder_matches_oracle(key, bias, qk_norm):
    b, l = 3, 48  # 48 exercises the lane-pad-to-128 path
    w = _weights(key, bias=bias, qk_norm=qk_norm)
    x = jax.random.normal(jax.random.PRNGKey(7), (b, l, H)) * 0.5
    lengths = jnp.array([48, 30, 7], jnp.int32)
    got = np.asarray(_call(x, w, lengths))
    want = np.asarray(_oracle(x, w, lengths))
    valid = np.asarray(jnp.arange(l)[None, :] < lengths[:, None])
    assert np.abs(got - want)[valid].max() < 1e-4
    # pad query rows return x unchanged
    pad = ~valid
    assert np.abs(got - np.asarray(x, np.float32))[pad].max() < 1e-5


def test_fused_decoder_pad_rows_match_recompute_graph(key):
    """Forward equals the flash recompute graph on EVERY row (incl. pads);
    a linear pad-touching cotangent then gives bit-identical gradients."""
    b, l = 2, 128
    w = _weights(key)
    x = jax.random.normal(jax.random.PRNGKey(8), (b, l, H)) * 0.5
    lengths = jnp.array([128, 61], jnp.int32)
    qw_zeros = jnp.zeros_like(w["wqkv"][0])
    ones = jnp.ones((D,), jnp.float32)
    cos, sin = iota_rope_tables(l, D, THETA)
    got = np.asarray(_call(x, w, lengths))
    want = np.asarray(_unfused_reference(
        x, w["wqkv"], qw_zeros, w["wo"], w["rms_w"], ones, ones, cos, sin,
        lengths, NQ, NKV, D, EPS, False))
    assert np.abs(got - want).max() < 1e-4
    cot = jax.random.normal(jax.random.PRNGKey(9), (b, l, H))
    g_fused = jax.grad(lambda x_: jnp.sum(_call(x_, w, lengths) * cot))(x)
    g_ref = jax.grad(lambda x_: jnp.sum(_unfused_reference(
        x_, w["wqkv"], qw_zeros, w["wo"], w["rms_w"], ones, ones, cos, sin,
        lengths, NQ, NKV, D, EPS, False) * cot))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=0, atol=1e-5)


def test_llama_fused_matches_xla_and_shares_param_tree(key):
    """attention_impl='fused' through the public LlamaModel surface: same
    param tree as 'xla' (checkpoint compatibility) and same hidden states
    on valid rows of a right-padded batch. GQA + qk-norm (Qwen3 shape)."""
    kw = dict(vocab_size=211, hidden_size=H, intermediate_size=256,
              num_hidden_layers=2, num_attention_heads=NQ,
              num_key_value_heads=NKV, max_position_embeddings=64,
              qk_norm=True, attention_bias=True)
    ids = np.zeros((2, 48), np.int32)
    lens = [48, 17]
    rng = np.random.default_rng(0)
    for i, n in enumerate(lens):
        ids[i, :n] = rng.integers(1, 211, n)
    mask = (ids != 0).astype(np.int32)
    outs, trees = {}, {}
    for impl in ("xla", "fused"):
        cfg = LlamaConfig(attention_impl=impl, **kw)
        net = LlamaModel(cfg, dtype=jnp.float32)
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
        trees[impl] = jax.tree_util.tree_structure(v)
        outs[impl] = np.asarray(
            net.apply(v, jnp.asarray(ids), jnp.asarray(mask))["last_hidden_state"])
    assert trees["xla"] == trees["fused"]
    valid = mask.astype(bool)
    assert np.abs(outs["xla"] - outs["fused"])[valid].max() < 2e-3


def _vl_text_cfg(**over):
    cfg = LlamaConfig(vocab_size=211, hidden_size=H, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=NQ,
                      num_key_value_heads=NKV, max_position_embeddings=64,
                      **over)
    return cfg


def _mrope_positions3(b, l, rng):
    """Synthetic M-RoPE ids: row 0 text-like (iota on all components), row 1
    an image-like span where the three components DIVERGE (t/h/w grid) —
    exercises the per-row rotary tables through the kernel."""
    pos = np.tile(np.arange(l, dtype=np.int64)[None], (b, 1))
    pos3 = np.tile(pos[None], (3, 1, 1))
    pos3[1, 1, 8:24] = np.repeat(np.arange(4), 4) + 8   # h component
    pos3[2, 1, 8:24] = np.tile(np.arange(4), 4) + 8     # w component
    return pos3


@pytest.mark.parametrize("family", ["qwen2_vl", "qwen3_vl"])
def test_vl_trunk_fused_matches_xla(key, family):
    """Qwen-VL text trunks with attention_impl='fused': the megakernel with
    per-row M-RoPE tables matches the XLA path on valid rows of a ragged
    right-padded batch, with an identical param tree."""
    b, l = 2, 48
    ids = np.zeros((b, l), np.int64)
    rng = np.random.default_rng(3)
    for i, n in enumerate([48, 30]):
        ids[i, :n] = rng.integers(10, 200, n)
    mask = (ids != 0).astype(np.int32)
    pos3 = _mrope_positions3(b, l, rng)
    outs, trees = {}, {}
    for impl in ("xla", "fused"):
        if family == "qwen2_vl":
            from nexus_tpu.models.qwen2_vl import Qwen2VLBackbone, Qwen2VLConfig

            cfg = Qwen2VLConfig(
                text=_vl_text_cfg(attention_bias=True, attention_impl=impl),
                mrope_section=[4, 6, 6],  # sums to head_dim/2 = 16
                image_token_id=7, video_token_id=8)
            net = Qwen2VLBackbone(cfg, dtype=jnp.float32)
        else:
            from nexus_tpu.models.qwen3_vl import (
                Qwen3VLBackbone, Qwen3VLConfig, Qwen3VLVisionConfig)

            cfg = Qwen3VLConfig(
                # vision unused (no pixel_patches); no deepstack so the
                # 2-layer test trunk scans cleanly
                vision=Qwen3VLVisionConfig(deepstack_visual_indexes=[]),
                text=_vl_text_cfg(qk_norm=True, attention_impl=impl),
                mrope_section=[4, 6, 6],
                image_token_id=7, video_token_id=8)
            net = Qwen3VLBackbone(cfg, dtype=jnp.float32)
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(ids.astype(np.int32)),
                     attention_mask=jnp.asarray(mask),
                     positions3=jnp.asarray(pos3))
        trees[impl] = jax.tree_util.tree_structure(v)
        outs[impl] = np.asarray(net.apply(
            v, jnp.asarray(ids.astype(np.int32)),
            attention_mask=jnp.asarray(mask),
            positions3=jnp.asarray(pos3))["last_hidden_state"])
    assert trees["xla"] == trees["fused"]
    valid = mask.astype(bool)
    assert np.abs(outs["xla"] - outs["fused"])[valid].max() < 2e-3


def test_llama_fused_left_padded_matches_xla(key):
    """attention_impl='fused' must be padding-side agnostic: the model-level
    fused path uses the segment flavor (mask as segments) with rope tables
    gathered from the real cumsum positions, so LEFT-padded batches (the
    common decoder-tokenizer convention) match the xla path exactly."""
    kw = dict(vocab_size=211, hidden_size=H, intermediate_size=256,
              num_hidden_layers=2, num_attention_heads=NQ,
              num_key_value_heads=NKV, max_position_embeddings=64)
    rng = np.random.default_rng(4)
    b, l = 2, 48
    ids = np.zeros((b, l), np.int32)
    ids[0, :] = rng.integers(1, 211, l)       # full row
    ids[1, l - 17:] = rng.integers(1, 211, 17)  # LEFT-padded row
    mask = (ids != 0).astype(np.int32)
    outs = {}
    for impl in ("xla", "fused"):
        net = LlamaModel(LlamaConfig(attention_impl=impl, **kw),
                         dtype=jnp.float32)
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
        outs[impl] = np.asarray(net.apply(
            v, jnp.asarray(ids), jnp.asarray(mask))["last_hidden_state"])
    valid = mask.astype(bool)
    assert np.abs(outs["xla"] - outs["fused"])[valid].max() < 2e-3


def test_fused_decoder_segment_mode_matches_flash_reference(key):
    """Packed-rows flavor: causal attention within segments + per-segment
    rope tables equals the flash recompute graph on every row."""
    b, l = 2, 64
    w = _weights(key)
    x = jax.random.normal(jax.random.PRNGKey(10), (b, l, H)) * 0.5
    seg = np.zeros((b, l), np.int32)
    pos = np.zeros((b, l), np.int32)
    for (r, spans) in [(0, [(0, 20), (20, 50)]), (1, [(0, 33)])]:
        for s_no, (a, z) in enumerate(spans, start=1):
            seg[r, a:z] = s_no
            pos[r, a:z] = np.arange(z - a)
    seg_j = jnp.asarray(seg)
    base_c, base_s = iota_rope_tables(l, D, THETA)
    cos = jnp.asarray(np.asarray(base_c[0])[pos])
    sin = jnp.asarray(np.asarray(base_s[0])[pos])
    got = fused_decoder_attention(
        x, w["wqkv"], w["wo"], w["rms_w"], segment_ids=seg_j,
        num_q_heads=NQ, num_kv_heads=NKV, head_dim=D, eps=EPS,
        rope_cos=cos, rope_sin=sin)
    qw_zeros = jnp.zeros(((NQ + 2 * NKV) * D,), jnp.float32)
    ones = jnp.ones((D,), jnp.float32)
    want = _unfused_reference(
        x, w["wqkv"], qw_zeros, w["wo"], w["rms_w"], ones, ones, cos, sin,
        seg_j, NQ, NKV, D, EPS, False, seg_mode=True)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-4
    # each segment must score exactly as the same sequence scored alone in
    # a right-padded row (the packed == padded contract)
    alone = jnp.zeros((3, l, H), x.dtype)
    alone = alone.at[0, :20].set(x[0, :20])
    alone = alone.at[1, :30].set(x[0, 20:50])
    alone = alone.at[2, :33].set(x[1, :33])
    y_alone = fused_decoder_attention(
        alone, w["wqkv"], w["wo"], w["rms_w"], jnp.array([20, 30, 33]),
        num_q_heads=NQ, num_kv_heads=NKV, head_dim=D, eps=EPS,
        rope_theta=THETA)
    got = np.asarray(got)
    np.testing.assert_allclose(got[0, :20], np.asarray(y_alone)[0, :20],
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(got[0, 20:50], np.asarray(y_alone)[1, :30],
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(got[1, :33], np.asarray(y_alone)[2, :33],
                               rtol=0, atol=1e-4)


def test_packed_reranker_scores_with_fused_kernel(key):
    """TextReranker(packing=True) on a fused-attention decoder cross-encoder
    equals the padded XLA path — the packed megakernel serving combination."""
    from nexus_tpu.training.reranker.text_retrieval.decoder_only import (
        DecoderCrossEncoderModel,
    )

    cfg_kw = dict(vocab_size=64, hidden_size=H, intermediate_size=128,
                  num_hidden_layers=2, num_attention_heads=NQ,
                  num_key_value_heads=NKV, max_position_embeddings=64)
    rng = np.random.default_rng(5)
    n, lens = 5, [30, 9, 22, 4, 15]
    ids = np.zeros((n, 32), np.int32)
    for i, ln in enumerate(lens):
        ids[i, :ln] = rng.integers(2, 63, ln)
    mask = (ids != 0).astype(np.int32)

    from nexus_tpu.ops.packing import pack_tokenized

    scores = {}
    for impl in ("xla", "fused"):
        model = DecoderCrossEncoderModel(LlamaConfig(attention_impl=impl,
                                                     **cfg_kw),
                                         dtype="float32")
        model.variables = model.init_variables(jax.random.PRNGKey(0))
        padded = model.scores(model.variables, {
            "input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)})
        pk = pack_tokenized(ids, mask, row_len=32, row_bucket=2)
        packed = model.scores(model.variables, {
            k: jnp.asarray(v) for k, v in pk.items()})
        np.testing.assert_allclose(np.asarray(packed), np.asarray(padded),
                                   rtol=1e-4, atol=1e-4)
        scores[impl] = np.asarray(packed)
    np.testing.assert_allclose(scores["fused"], scores["xla"],
                               rtol=1e-3, atol=1e-3)


def test_llama_fused_with_lora_adapters(key):
    """attention_impl='fused' with lora_rank > 0: the adapters merge into
    the effective kernels OUTSIDE the megakernel — same param tree as the
    unfused LoRA net, same outputs, and adapter gradients match xla."""
    kw = dict(vocab_size=211, hidden_size=H, intermediate_size=256,
              num_hidden_layers=2, num_attention_heads=NQ,
              num_key_value_heads=NKV, max_position_embeddings=64,
              lora_rank=4)
    rng = np.random.default_rng(8)
    ids = np.zeros((2, 48), np.int32)
    for i, n in enumerate([48, 21]):
        ids[i, :n] = rng.integers(1, 211, n)
    mask = (ids != 0).astype(np.int32)

    def randomize_lora(v):
        # lora_B inits to zeros (effective == base); give it real values so
        # the parity check actually exercises the merge
        def walk(tree, path=()):
            if isinstance(tree, dict):
                return {k: walk(x, path + (k,)) for k, x in tree.items()}
            if path and path[-1] == "lora_B":
                k = jax.random.fold_in(jax.random.PRNGKey(3), hash(path) % 2**31)
                return jax.random.normal(k, tree.shape) * 0.05
            return tree
        return walk(v)

    outs, trees, grads = {}, {}, {}
    for impl in ("xla", "fused"):
        net = LlamaModel(LlamaConfig(attention_impl=impl, **kw),
                         dtype=jnp.float32)
        v = net.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
        v = randomize_lora(v)
        trees[impl] = jax.tree_util.tree_structure(v)
        outs[impl] = np.asarray(net.apply(
            v, jnp.asarray(ids), jnp.asarray(mask))["last_hidden_state"])
        m = jnp.asarray(mask, jnp.float32)[..., None]

        def loss(vv):
            y = net.apply(vv, jnp.asarray(ids), jnp.asarray(mask))["last_hidden_state"]
            return jnp.sum((y * m) ** 2)

        g = jax.grad(loss)(v)
        from nexus_tpu.models.lora import lora_param_filter

        lmask = lora_param_filter(g["params"])
        grads[impl] = np.concatenate([
            np.asarray(leaf).ravel()
            for leaf, keep in zip(jax.tree_util.tree_leaves(g["params"]),
                                  jax.tree_util.tree_leaves(lmask)) if keep
        ])
    assert trees["xla"] == trees["fused"]
    valid = mask.astype(bool)
    assert np.abs(outs["xla"] - outs["fused"])[valid].max() < 2e-3
    # squared loss => value-dependent cotangents amplify kernel-vs-einsum
    # forward noise; the adapter grads are tiny (max ~7e-4 here), so check
    # a combined absolute+relative tolerance
    np.testing.assert_allclose(grads["fused"], grads["xla"],
                               rtol=0.1, atol=5e-5)


def test_fused_decoder_gate():
    assert fused_decoder_supported(2048, 16, 8, 128, 512)
    assert not fused_decoder_supported(2048, 16, 8, 128, 2048)  # L too long
    assert not fused_decoder_supported(4096, 32, 8, 128, 1024)  # VMEM
    assert not fused_decoder_supported(2048, 16, 3, 128, 512)   # ragged GQA
    # LoRA + fused: adapters merge into the effective kernels (see
    # test_llama_fused_with_lora_adapters for the parity check)
    cfg = LlamaConfig(vocab_size=97, hidden_size=H, intermediate_size=256,
                      num_hidden_layers=1, num_attention_heads=NQ,
                      num_key_value_heads=NKV, attention_impl="fused",
                      lora_rank=4)
    net = LlamaModel(cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(1, 97, (2, 16)), jnp.int32)
    v = net.init(jax.random.PRNGKey(0), ids)
    out = net.apply(v, ids)["last_hidden_state"]
    assert np.isfinite(np.asarray(out)).all()
