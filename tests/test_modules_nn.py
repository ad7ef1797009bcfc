import jax
import jax.numpy as jnp
import numpy as np

from nexus_tpu.data.attrs import DataAttr4Model, Statistics
from nexus_tpu.modules.aggregate import (
    AverageAggregator,
    DeepInterestAggregator,
    LastItemAggregator,
    SelfAttentiveAggregator,
)
from nexus_tpu.modules.embedding import MultiFeatEmbedding
from nexus_tpu.modules.encoders import MLPItemEncoder, MLPQueryEncoder, SASRecEncoder
from nexus_tpu.modules.feature_interaction import (
    CrossNetwork,
    FactorizationMachine,
    MultiExperts,
)
from nexus_tpu.modules.layers import ActivationUnit, MLPModule, SENet


def make_attr():
    stats = Statistics.from_dict({"uid": 100, "city": 10, "iid": 50, "cat": 7})
    return DataAttr4Model(
        fiid="iid",
        flabels=["click"],
        features=["uid", "city", "iid", "cat"],
        context_features=["uid", "city"],
        item_features=["iid", "cat"],
        seq_features={"seq": ["iid", "cat"]},
        seq_lengths={"seq": 5},
        num_items=50,
        stats=stats,
    )


def test_multifeat_embedding_concat_stack_dict(key):
    m = MultiFeatEmbedding(features=("a", "b"), feat_nums=(10, 20), embedding_dim=8)
    batch = {"a": jnp.array([1, 2]), "b": jnp.array([0, 3])}
    params = m.init(key, batch)
    out = m.apply(params, batch)
    assert out.shape == (2, 16)
    # zero padding: feature b index 0 embeds to zeros
    m2 = MultiFeatEmbedding(features=("a", "b"), feat_nums=(10, 20), embedding_dim=8,
                            concat_embeddings=False, stack_embeddings=True)
    params2 = m2.init(key, batch)
    out2 = m2.apply(params2, batch)
    assert out2.shape == (2, 2, 8)
    assert np.allclose(out2[0, 1], 0.0)  # b=0 -> padding


def test_multifeat_embedding_single_gather_for_seq(key):
    m = MultiFeatEmbedding(features=("iid", "cat"), feat_nums=(50, 7), embedding_dim=4)
    batch = {"iid": jnp.ones((2, 5), jnp.int32), "cat": jnp.ones((2, 5), jnp.int32)}
    params = m.init(key, batch)
    assert m.apply(params, batch).shape == (2, 5, 8)


def test_mlp_module_shapes(key):
    m = MLPModule(mlp_layers=[16, 32, 8], activation_func="relu", dropout=0.1, batch_norm=True)
    x = jnp.ones((4, 3, 16))
    variables = m.init(key, x)
    out = m.apply(variables, x)
    assert out.shape == (4, 3, 8)
    # train mode needs dropout rng + batch_stats mutable
    out_t, _ = m.apply(variables, x, train=True, rngs={"dropout": key}, mutable=["batch_stats"])
    assert out_t.shape == (4, 3, 8)


def test_senet_and_activation_unit(key):
    se = SENet(input_dim=8)
    x = jnp.ones((4, 8))
    v = se.init(key, x)
    assert se.apply(v, x).shape == (4, 8)

    au = ActivationUnit(hidden_size=16)
    q = jnp.ones((4, 8))
    k = jnp.ones((4, 6, 8))
    v = au.init(key, q, k)
    assert au.apply(v, q, k).shape == (4, 6, 1)


def test_cross_network_and_fm(key):
    cn = CrossNetwork(input_dim=12, n_layers=3)
    x = jnp.ones((4, 12))
    v = cn.init(key, x)
    assert cn.apply(v, x).shape == (4, 12)

    fm = FactorizationMachine()
    e = jnp.ones((4, 5, 8))
    v = fm.init(key, e)
    assert fm.apply(v, e).shape == (4, 1)


def test_multi_experts_vmapped(key):
    me = MultiExperts(n_experts=3, expert_module=lambda: MLPModule(mlp_layers=[8, 16]))
    x = jnp.ones((4, 8))
    v = me.init(key, x)
    out = me.apply(v, x)
    assert out.shape == (4, 3, 16)
    # experts have independent params -> different outputs
    assert not np.allclose(out[:, 0], out[:, 1])


def test_aggregators(key):
    seq = jax.random.normal(key, (3, 5, 8))
    mask = jnp.array([[False] * 3 + [True] * 2, [False] * 5, [True] * 5])

    avg = AverageAggregator()
    out = avg.apply(avg.init(key, seq, mask), seq, mask)
    assert out.shape == (3, 8)
    assert np.allclose(out[0], np.mean(np.asarray(seq[0, :3]), axis=0), atol=1e-5)

    last = LastItemAggregator()
    out = last.apply(last.init(key, seq, mask), seq, mask)
    assert np.allclose(out[0], seq[0, 2])
    assert np.allclose(out[1], seq[1, 4])

    sa = SelfAttentiveAggregator(input_dim=8, max_seq_len=5, n_layers=1, n_heads=2, hidden_size=16, dropout=0.0)
    v = sa.init(key, seq, mask)
    assert sa.apply(v, seq, mask).shape == (3, 8)

    din = DeepInterestAggregator(input_dim=8, hidden_size=16)
    target = jnp.ones((3, 8))
    v = din.init(key, seq, mask, target)
    assert din.apply(v, seq, mask, target).shape == (3, 8)


def test_encoders_end_to_end(key):
    attr = make_attr()
    batch = {
        "uid": jnp.array([1, 2]),
        "city": jnp.array([3, 4]),
        "iid": jnp.array([5, 6]),
        "cat": jnp.array([1, 2]),
        "seq": {"iid": jnp.ones((2, 5), jnp.int32), "cat": jnp.ones((2, 5), jnp.int32)},
    }
    item_enc = MLPItemEncoder(data_attr=attr, embedding_dim=8, mlp_layers=(16,))
    v = item_enc.init(key, batch)
    assert item_enc.apply(v, batch).shape == (2, 16)

    q_enc = MLPQueryEncoder(data_attr=attr, embedding_dim=8, mlp_layers=(16,))
    v = q_enc.init(key, batch)
    assert q_enc.apply(v, batch).shape == (2, 16)

    sas = SASRecEncoder(
        data_attr=attr, embedding_dim=8,
        item_encoder=MLPItemEncoder(data_attr=attr, embedding_dim=8, mlp_layers=(16,)),
        n_heads=2, hidden_size=32, dropout=0.0, seq_item_dim=16,
    )
    v = sas.init(key, batch)
    out = sas.apply(v, batch)
    # seq agg (16) + context emb (2 feats * 8)
    assert out.shape == (2, 16 + 16)
