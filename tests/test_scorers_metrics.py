import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.modules import metrics as M
from nexus_tpu.modules import score as S


def test_inner_product_shapes():
    sc = S.InnerProductScorer()
    q = jnp.ones((2, 4))
    assert sc(q, jnp.ones((2, 4))).shape == (2,)
    assert sc(q, jnp.ones((2, 3, 4))).shape == (2, 3)
    assert sc(q, jnp.ones((5, 4))).shape == (2, 5)
    ql = jnp.ones((2, 7, 4))
    assert sc(ql, jnp.ones((2, 7, 4))).shape == (2, 7)
    assert sc(ql, jnp.ones((2, 7, 3, 4))).shape == (2, 7, 3)


def test_cosine_scorer_unit_vectors():
    q = jnp.array([[1.0, 0.0]])
    i = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    out = S.CosineScorer()(q, i)
    assert np.allclose(out, [[1.0, 0.0]], atol=1e-6)


def test_euclidean_scorer():
    q = jnp.array([[0.0, 0.0]])
    i = jnp.array([[3.0, 4.0]])
    # [1,D]x[1,D] -> elementwise: -(sq distance) = -25
    out = S.EuclideanScorer()(q, i)
    assert np.allclose(out, [-25.0], atol=1e-5)


def test_ip_text_retrieval():
    q = jnp.ones((2, 4))
    p = jnp.ones((3, 4))
    assert S.IPTextRetrievalScorer()(q, p).shape == (2, 3)


def test_topk_metrics():
    # batch of 2, top-4 predictions; row 0 hits at rank 1, row 1 at rank 3
    pred = jnp.array([[1, 0, 0, 0], [0, 0, 1, 0]], dtype=bool)
    target = jnp.array([[1.0, 0.0], [1.0, 1.0]])
    assert np.allclose(M.recall(pred, target, 4), (1 / 1 + 1 / 2) / 2)
    assert np.allclose(M.precision(pred, target, 4), (1 / 4 + 1 / 4) / 2)
    assert np.allclose(M.hits(pred, target, 4), 1.0)
    assert np.allclose(M.mrr(pred, target, 4), (1.0 + 1 / 3) / 2)
    nd = M.ndcg(pred, target, 4)
    assert 0 < nd < 1


def test_auc_perfect_and_random():
    pred = jnp.array([0.9, 0.8, 0.1, 0.2])
    target = jnp.array([1, 1, 0, 0])
    assert np.allclose(M.auc(pred, target), 1.0)
    pred2 = jnp.array([0.1, 0.2, 0.8, 0.9])
    assert np.allclose(M.auc(pred2, target), 0.0)
    # ties -> 0.5
    pred3 = jnp.array([0.5, 0.5, 0.5, 0.5])
    assert np.allclose(M.auc(pred3, target), 0.5)


def test_auc_against_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(0)
    pred = rng.normal(size=200)
    target = (rng.uniform(size=200) > 0.6).astype(np.int32)
    ours = float(M.auc(jnp.asarray(pred), jnp.asarray(target)))
    ref = roc_auc_score(target, pred)
    assert np.allclose(ours, ref, atol=1e-5)


def test_metric_registry():
    ms = M.get_eval_metrics(["ndcg", "recall", "auc"], "retriever")
    assert [name for name, _ in ms] == ["ndcg", "recall"]
    ms = M.get_eval_metrics(["auc", "logloss", "ndcg"], "ranker")
    assert [name for name, _ in ms] == ["auc", "logloss"]


def test_auc_jit():
    f = jax.jit(M.auc)
    assert np.isfinite(f(jnp.array([0.1, 0.9]), jnp.array([0, 1])))
