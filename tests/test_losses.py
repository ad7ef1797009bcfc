import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.modules import loss as L


def test_bpr_matches_manual():
    pos = jnp.array([1.0, 2.0])
    neg = jnp.array([[0.5, 0.0], [1.0, -1.0]])
    got = L.BPRLoss()(pos, neg)
    expected = -np.mean(np.log(jax.nn.sigmoid(pos[:, None] - neg)))
    assert np.allclose(got, expected, atol=1e-6)


def test_bpr_dns_uses_hardest_negative():
    pos = jnp.array([1.0])
    neg = jnp.array([[0.0, 3.0]])
    got = L.BPRLoss(dns=True)(pos, neg)
    expected = -np.log(jax.nn.sigmoid(1.0 - 3.0))
    assert np.allclose(got, expected, atol=1e-6)


def test_sampled_softmax_uniform_equals_softmax():
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (4,))
    neg = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    zeros_p = jnp.zeros_like(pos)
    zeros_n = jnp.zeros_like(neg)
    got = L.SampledSoftmaxLoss()(pos, zeros_p, neg, zeros_n)
    allsc = jnp.concatenate([pos[:, None], neg], axis=-1)
    expected = jnp.mean(jax.nn.logsumexp(allsc, axis=-1) - pos)
    assert np.allclose(got, expected, atol=1e-5)


def test_in_batch_softmax_uniform_ips():
    q = jnp.eye(3)
    loss_fn = L.InBatchSoftmaxLoss(num_items=10, temperature=1.0)
    got = loss_fn(q, q, jnp.array([0, 1, 2]))
    logits = q @ q.T
    expected = -jnp.mean(jnp.diagonal(jax.nn.log_softmax(logits, axis=-1)))
    assert np.allclose(got, expected, atol=1e-5)


def test_in_batch_softmax_with_popularity():
    loss_fn = L.InBatchSoftmaxLoss(num_items=5, temperature=1.0)
    loss_fn = loss_fn.with_item_popularity([0, 1, 2], [10.0, 1.0, 1.0], mode=0)
    assert loss_fn.ips is not None and loss_fn.ips.shape == (5,)
    # popular item 0 gets smaller IPS weight than rare item 1
    assert loss_fn.ips[0] < loss_fn.ips[1]


def test_bce_with_logits_matches_manual():
    scores = jnp.array([0.5, -1.0, 2.0])
    label = jnp.array([1.0, 0.0, 1.0])
    got = L.BCEWithLogitLoss()(label, scores)
    p = jax.nn.sigmoid(scores)
    expected = -np.mean(label * np.log(p) + (1 - label) * np.log(1 - p))
    assert np.allclose(got, expected, atol=1e-5)


def test_cross_entropy_with_int_targets():
    logits = jnp.array([[2.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    got = L.CrossEntropyLoss()(logits, jnp.array([0, 1]))
    expected = -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(2), jnp.array([0, 1])])
    assert np.allclose(got, expected, atol=1e-6)


def test_kl_div():
    s = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    t = jax.nn.softmax(s, axis=-1)
    got = L.KLDivLoss()(s, t)
    expected = -jnp.mean(jnp.sum(jax.nn.log_softmax(s, -1) * t, -1))
    assert np.allclose(got, expected)


def test_m3_kd_loss_runs_and_is_positive():
    b, g = 4, 2
    scores = jax.random.normal(jax.random.PRNGKey(0), (b, b * g))
    teacher = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (b, g)))
    got = L.M3KDLoss()(scores, teacher, g)
    assert np.isfinite(got) and got > 0


@pytest.mark.parametrize(
    "loss_fn,kwargs",
    [
        (L.Top1Loss(), {}),
        (L.HingeLoss(), {}),
        (L.HingeLoss(num_items=100), {}),
        (L.CCLLoss(), {}),
    ],
)
def test_pairwise_losses_finite(loss_fn, kwargs):
    pos = jax.random.normal(jax.random.PRNGKey(0), (8,))
    neg = jax.random.normal(jax.random.PRNGKey(1), (8, 5))
    assert np.isfinite(loss_fn(pos, neg, **kwargs))


def test_nce_weighted_losses_finite():
    pos = jax.random.normal(jax.random.PRNGKey(0), (8,))
    neg = jax.random.normal(jax.random.PRNGKey(1), (8, 5))
    lp = jnp.full((8,), -2.0)
    ln = jnp.full((8, 5), -2.0)
    assert np.isfinite(L.NCELoss()(pos, lp, neg, ln))
    assert np.isfinite(L.WeightedBPRLoss()(pos, neg, ln))
    assert np.isfinite(L.BinaryCrossEntropyLoss()(pos, neg, ln))
    assert np.isfinite(L.WeightedBinaryCrossEntropyLoss()(pos, neg, ln))


def test_l2_reg():
    x = jnp.ones((4, 3))
    assert np.allclose(L.l2_reg_loss_fn(x, x), 6.0)


def test_get_loss_registry():
    assert isinstance(L.get_loss("BPRLoss"), L.BPRLoss)
    assert isinstance(L.get_loss("bpr"), L.BPRLoss)
    assert isinstance(L.get_loss("in_batch_softmax", num_items=5), L.InBatchSoftmaxLoss)
    with pytest.raises(ValueError):
        L.get_loss("nope")


def test_losses_jit_compatible():
    pos = jnp.ones((4,))
    neg = jnp.zeros((4, 3))
    fn = jax.jit(lambda p, n: L.BPRLoss()(p, n))
    assert np.isfinite(fn(pos, neg))
