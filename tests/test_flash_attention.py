import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.ops.flash_attention import _reference_attention, flash_attention


@pytest.mark.parametrize("l,block", [(128, 64), (256, 128), (200, 128)])
def test_flash_matches_reference(key, l, block):
    b, h, d = 2, 4, 32
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, l, d))
    k = jax.random.normal(k2, (b, h, l, d))
    v = jax.random.normal(k3, (b, h, l, d))
    # row 0 has padding at the tail
    mask = np.ones((b, l), bool)
    mask[0, l // 2 :] = False
    mask = jnp.asarray(mask)

    out = flash_attention(q, k, v, mask, block, block)
    ref = _reference_attention(q, k, v, mask)
    # compare only valid query positions (padded queries are don't-care)
    valid = np.asarray(mask)
    diff = np.abs(np.asarray(out) - np.asarray(ref))[np.broadcast_to(valid[:, None, :, None], out.shape)]
    assert diff.max() < 2e-5, diff.max()


def test_flash_gradients_match(key):
    b, h, l, d = 1, 2, 128, 16
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, l, d))
    kk = jax.random.normal(k2, (b, h, l, d))
    v = jax.random.normal(k3, (b, h, l, d))
    mask = jnp.ones((b, l), bool)

    def loss_flash(q, kk, v):
        return jnp.sum(flash_attention(q, kk, v, mask, 64, 64) ** 2)

    def loss_ref(q, kk, v):
        return jnp.sum(_reference_attention(q, kk, v, mask) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, kk, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kk, v)
    for a, b_ in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_bf16(key):
    b, h, l, d = 1, 2, 128, 32
    q = jax.random.normal(key, (b, h, l, d), jnp.bfloat16)
    mask = jnp.ones((b, l), bool)
    out = flash_attention(q, q, q, mask, 64, 64)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_flash_gradients_with_padding(key):
    """Blocked Pallas backward vs XLA-vjp oracle under ragged padding."""
    b, h, l, d = 2, 2, 192, 16
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, l, d))
    kk = jax.random.normal(k2, (b, h, l, d))
    v = jax.random.normal(k3, (b, h, l, d))
    mask = np.ones((b, l), bool)
    mask[0, 100:] = False
    mask[1, 37:] = False
    mask = jnp.asarray(mask)
    # weights zero at padded queries so don't-care rows drop from the loss
    w = mask[:, None, :, None].astype(jnp.float32)

    def loss_flash(q, kk, v):
        return jnp.sum((flash_attention(q, kk, v, mask, 64, 64) * w) ** 2)

    def loss_ref(q, kk, v):
        return jnp.sum((_reference_attention(q, kk, v, mask) * w) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, kk, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kk, v)
    for a, b_ in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_gradients_causal(key):
    b, h, l, d = 1, 2, 128, 16
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, l, d))
    kk = jax.random.normal(k2, (b, h, l, d))
    v = jax.random.normal(k3, (b, h, l, d))
    mask = jnp.ones((b, l), bool)

    def loss_flash(q, kk, v):
        return jnp.sum(flash_attention(q, kk, v, mask, 64, 64, True) ** 2)

    def loss_ref(q, kk, v):
        return jnp.sum(_reference_attention(q, kk, v, mask, causal=True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, kk, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kk, v)
    for a, b_ in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_segments_match_reference(key):
    """Packed rows: segment ids restrict attention to same-segment tokens."""
    b, h, l, d = 2, 2, 128, 32
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, l, d))
    k = jax.random.normal(k2, (b, h, l, d))
    v = jax.random.normal(k3, (b, h, l, d))
    seg = np.zeros((b, l), np.int32)
    seg[0, :40] = 1
    seg[0, 40:90] = 2
    seg[0, 90:120] = 3
    seg[1, :64] = 1
    seg[1, 64:80] = 2
    seg = jnp.asarray(seg)
    out = flash_attention(q, k, v, seg, 64, 64)
    ref = _reference_attention(q, k, v, seg)
    valid = np.asarray(seg) > 0
    diff = np.abs(np.asarray(out) - np.asarray(ref))[np.broadcast_to(valid[:, None, :, None], out.shape)]
    assert diff.max() < 2e-5, diff.max()

    # gradients under segment masking
    w = (seg > 0)[:, None, :, None].astype(jnp.float32)
    g1 = jax.grad(lambda a, b_, c: jnp.sum((flash_attention(a, b_, c, seg, 64, 64) * w) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda a, b_, c: jnp.sum((_reference_attention(a, b_, c, seg) * w) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_causal_matches_reference(key):
    b, h, l, d = 2, 2, 128, 32
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, l, d))
    k = jax.random.normal(k2, (b, h, l, d))
    v = jax.random.normal(k3, (b, h, l, d))
    mask = np.ones((b, l), bool)
    mask[1, 100:] = False
    mask = jnp.asarray(mask)
    out = flash_attention(q, k, v, mask, 64, 64, True)
    ref = _reference_attention(q, k, v, mask, causal=True)
    valid = np.asarray(mask)
    diff = np.abs(np.asarray(out) - np.asarray(ref))[np.broadcast_to(valid[:, None, :, None], out.shape)]
    assert diff.max() < 2e-5, diff.max()



@pytest.mark.parametrize("block", [64, 128])
def test_flash_padded_matches_reference(key, block):
    """Lengths fast path == segment path with a prefix mask (incl. zeroed
    padded query rows), across full/partial/dead-block lengths."""
    from nexus_tpu.ops.flash_attention import flash_attention_padded

    b, h, l, d = 4, 2, 256, 32
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, l, d))
    k = jax.random.normal(k2, (b, h, l, d))
    v = jax.random.normal(k3, (b, h, l, d))
    lengths = jnp.array([l, 100, block + 1, 1], jnp.int32)
    seg = (jnp.arange(l)[None, :] < lengths[:, None]).astype(jnp.int32)

    out = flash_attention_padded(q, k, v, lengths, block, block)
    ref = _reference_attention(q, k, v, seg)
    ref = jnp.where(seg[:, None, :, None] != 0, ref, 0.0)  # padded q rows -> 0
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 2e-5


def test_flash_padded_gradients(key):
    """Padded-path vjp (segment-kernel backward off the fast forward's lse)
    matches the XLA oracle when the loss masks padding (as every pooling
    path does)."""
    from nexus_tpu.ops.flash_attention import flash_attention_padded

    b, h, l, d = 2, 2, 192, 16
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, h, l, d))
    kk = jax.random.normal(k2, (b, h, l, d))
    v = jax.random.normal(k3, (b, h, l, d))
    lengths = jnp.array([l, 77], jnp.int32)
    seg = (jnp.arange(l)[None, :] < lengths[:, None]).astype(jnp.int32)
    w = seg[:, None, :, None].astype(q.dtype)

    def loss_fast(q, kk, v):
        return jnp.sum((flash_attention_padded(q, kk, v, lengths, 64, 64) * w) ** 2)

    def loss_ref(q, kk, v):
        return jnp.sum((_reference_attention(q, kk, v, seg) * w) ** 2)

    g1 = jax.grad(loss_fast, argnums=(0, 1, 2))(q, kk, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kk, v)
    for a, b_ in zip(g1, g2):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-4)
