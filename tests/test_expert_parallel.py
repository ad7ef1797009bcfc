"""Expert parallelism: MMoE expert stacks sharded over the `model` axis.

The vmapped MultiExperts layout carries the expert axis first, so
expert_parallel_shardings puts n_experts/tp experts per chip; training on a
2x4 data x model mesh must follow the replicated trajectory exactly.
"""

import jax
import numpy as np
import pytest

from nexus_tpu.data.dataset import ShardedDataset
from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.data.synthetic import generate_synthetic_recflow
from nexus_tpu.parallel.mesh import make_mesh
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.reranker.recommendation import MMoERanker
from nexus_tpu.training.trainer import RecTrainer


def test_mmoe_expert_parallel_training_parity(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh({"data": 2, "model": 4})

    cfg = generate_synthetic_recflow(
        str(tmp_path / "d"), n_days=2, rows_per_day=256, seq_len=4,
        labels=("effective_view", "long_view"),
    )
    train_cfg, _ = ConfigProcessor(cfg).split_config()
    mcfg = {"embedding_dim": 8, "mlp_layers": [16], "n_experts": 4,
            "gate_layers": [8], "tower_layers": [8], "activation": "relu",
            "dropout": 0.0, "batch_norm": False}

    def run(shard):
        model = MMoERanker(train_cfg.to_attr(), dict(mcfg))
        targs = TrainingArguments.from_dict(dict(
            output_dir=str(tmp_path / ("ep" if shard else "rep")),
            num_train_epochs=1, max_steps=2, per_device_train_batch_size=8,
            learning_rate=0.01, logging_steps=10, optimizer="sgd",
            evaluation_strategy="no", seed=3,
        ))
        trainer = RecTrainer(model, targs, mesh=mesh, shard_experts=shard)
        state = trainer.init_state()
        if shard:
            expert_leaves = [
                (path, l)
                for path, l in jax.tree_util.tree_flatten_with_path(state.params)[0]
                if any(getattr(k, "key", None) == "experts" for k in path)
                and hasattr(l, "sharding")
            ]
            assert expert_leaves, "no expert params found"
            sharded = [l for _, l in expert_leaves if not l.sharding.is_fully_replicated]
            assert sharded, "expert parallelism produced no sharded leaves"
            assert all("model" in str(l.sharding.spec) for l in sharded)
        ds = ShardedDataset(train_cfg, batch_size=8 * 2, drop_last=True)
        final = trainer.train(lambda: iter(ds))
        assert int(final.step) == 2
        return jax.tree_util.tree_map(np.asarray, jax.device_get(final.params))

    p_rep = run(False)
    p_ep = run(True)
    for a, b in zip(jax.tree_util.tree_leaves(p_rep), jax.tree_util.tree_leaves(p_ep)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
