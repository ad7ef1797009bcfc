"""GPipe pipeline parallelism (parallel/pipeline.py) on the virtual mesh.

Parity contract: pipeline_layers over S stages == plain lax.scan over the
same stacked layer params, for forward AND gradients, including real flax
transformer layers with per-microbatch attention masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nexus_tpu.parallel.mesh import make_mesh
from nexus_tpu.parallel.pipeline import pipeline_layers, stage_shardings


def _mesh(s=4):
    if len(jax.devices()) < s:
        pytest.skip("needs multi-device mesh")
    return make_mesh({"stage": s}, devices=jax.devices()[:s])


def _mlp_stack(n_layers=8, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.standard_normal((n_layers, d, d)) * 0.1, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((n_layers, d)) * 0.1, jnp.float32),
    }


def _mlp_layer(p, h, ex):
    return h + jnp.tanh(h @ p["w"] + p["b"]) * ex["gate"][:, None]


def _sequential(layer, params, x, ex):
    def body(h, p):
        return layer(p, h, ex), None

    return jax.lax.scan(body, x, params)[0]


def test_pipeline_mlp_forward_and_grad_parity():
    mesh = _mesh(4)
    params = _mlp_stack()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    gate = jnp.asarray(rng.random(8), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)

    ref = _sequential(_mlp_layer, params, x, {"gate": gate})
    out = pipeline_layers(_mlp_layer, params, x, {"gate": gate},
                          mesh=mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-6, atol=1e-6)

    def loss_pipe(p):
        y = pipeline_layers(_mlp_layer, p, x, {"gate": gate},
                            mesh=mesh, n_microbatches=4)
        return jnp.sum(y * tgt)

    def loss_ref(p):
        return jnp.sum(_sequential(_mlp_layer, p, x, {"gate": gate}) * tgt)

    g_pipe = jax.grad(loss_pipe)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_pipeline_bert_layer_stack_parity():
    """The real scan-over-layers BERT trunk layout runs pipelined: stacked
    ['layers']['layer'] params + per-microbatch attention masks."""
    mesh = _mesh(4)
    from nexus_tpu.models.bert import BertConfig, BertEncoderModel, BertLayer

    cfg = BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        add_pooling_layer=False,
    )
    model = BertEncoderModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(1, 64, (8, 12)), jnp.int32)
    mask = jnp.asarray((rng.random((8, 12)) < 0.8), jnp.int32).at[:, 0].set(1)
    variables = model.init(jax.random.PRNGKey(0), ids[:1, :8])
    stacked = variables["params"]["layers"]["layer"]

    h0 = jnp.asarray(rng.standard_normal((8, 12, 16)), jnp.float32)
    layer = BertLayer(cfg, dtype=jnp.float32)

    def layer_apply(p, h, ex):
        return layer.apply({"params": p}, h, ex["attention_mask"], False, None)

    ref = _sequential(layer_apply, stacked, h0, {"attention_mask": mask})
    # params pre-placed with stage shardings, the way a real run would hold
    # only one stage's weights per chip
    placed = jax.device_put(stacked, stage_shardings(stacked, mesh))
    out = pipeline_layers(layer_apply, placed, h0, {"attention_mask": mask},
                          mesh=mesh, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-5, atol=2e-6)


def test_pipeline_validates_divisibility():
    mesh = _mesh(4)
    params = _mlp_stack(n_layers=6)  # 6 % 4 != 0
    x = jnp.zeros((8, 16), jnp.float32)
    with pytest.raises(ValueError, match="split over"):
        pipeline_layers(_mlp_layer, params, x, {"gate": jnp.ones(8)},
                        mesh=mesh, n_microbatches=4)
    params = _mlp_stack(n_layers=8)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_layers(_mlp_layer, params, x, {"gate": jnp.ones(8)},
                        mesh=mesh, n_microbatches=3)
