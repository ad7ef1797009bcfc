"""ZeRO-1 optimizer-state sharding over the 8-device mesh."""

import jax
import numpy as np
import pytest

from nexus_tpu.data.synthetic import generate_synthetic_recflow
from nexus_tpu.parallel.mesh import DATA_AXIS, get_default_mesh
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.reranker.recommendation import MLPRanker
from nexus_tpu.training.trainer import RecTrainer


def test_zero1_shards_opt_state_and_trains(tmp_path):
    mesh = get_default_mesh()
    n = mesh.shape[DATA_AXIS]
    if n < 2:
        pytest.skip("needs multi-device mesh")
    cfg = generate_synthetic_recflow(str(tmp_path / "d"), n_days=2, rows_per_day=256, seq_len=4)
    from nexus_tpu.data.processor import ConfigProcessor
    from nexus_tpu.data.dataset import ShardedDataset

    train_cfg, _ = ConfigProcessor(cfg).split_config()
    model = MLPRanker(train_cfg.to_attr(),
                      {"embedding_dim": 8, "mlp_layers": [32], "dropout": 0.0, "batch_norm": False})
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / "ckpt"), num_train_epochs=1, max_steps=3,
        per_device_train_batch_size=8, learning_rate=0.01, logging_steps=10,
        optimizer="adam", evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs, mesh=mesh, shard_opt_state=True)
    state = trainer.init_state()

    # optimizer moments for the big embedding table are sharded over devices
    leaves = jax.tree_util.tree_leaves(state.opt_state)
    big = [l for l in leaves if hasattr(l, "shape") and l.size > n]
    assert big, "no shardable optimizer leaves found"
    sharded = [l for l in big if not l.sharding.is_fully_replicated]
    assert sharded, "ZeRO-1 produced no sharded optimizer state"
    # params stay replicated
    p_leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.sharding.is_fully_replicated for l in p_leaves)

    ds = ShardedDataset(train_cfg, batch_size=8 * n, drop_last=True)
    final = trainer.train(lambda: iter(ds))
    assert int(final.step) == 3
    # training preserved the sharded layout
    leaves2 = jax.tree_util.tree_leaves(final.opt_state)
    assert any(
        hasattr(l, "sharding") and not l.sharding.is_fully_replicated
        for l in leaves2 if hasattr(l, "shape") and l.size > n
    )


def test_resume_restores_optimizer_state(tmp_path):
    """Exact-resume parity: step + optimizer moments round-trip."""
    import jax
    from nexus_tpu.data.processor import ConfigProcessor
    from nexus_tpu.data.dataset import ShardedDataset

    cfg = generate_synthetic_recflow(str(tmp_path / "d"), n_days=2, rows_per_day=256, seq_len=4)
    train_cfg, _ = ConfigProcessor(cfg).split_config()
    model = MLPRanker(train_cfg.to_attr(),
                      {"embedding_dim": 8, "mlp_layers": [16], "dropout": 0.0, "batch_norm": False})
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / "ckpt"), num_train_epochs=1, max_steps=3,
        per_device_train_batch_size=8, learning_rate=0.01, logging_steps=10,
        optimizer="adam", evaluation_strategy="no",
    ))
    mesh = get_default_mesh()
    n = mesh.shape[DATA_AXIS]
    trainer = RecTrainer(model, targs, mesh=mesh)
    ds = ShardedDataset(train_cfg, batch_size=8 * n, drop_last=True)
    state = trainer.train(lambda: iter(ds))
    trainer.save_model(str(tmp_path / "ckpt"))
    mu_before = jax.tree_util.tree_leaves(state.opt_state)[1]

    model2 = MLPRanker(train_cfg.to_attr(),
                       {"embedding_dim": 8, "mlp_layers": [16], "dropout": 0.0, "batch_norm": False})
    trainer2 = RecTrainer(model2, targs, mesh=mesh)
    trainer2.init_state()
    trainer2.load_model(str(tmp_path / "ckpt"))
    assert int(trainer2._state.step) == 3
    mu_after = jax.tree_util.tree_leaves(trainer2._state.opt_state)[1]
    assert np.allclose(np.asarray(mu_before), np.asarray(mu_after))


def test_trainer_plumbs_metrics_from_args(tmp_path):
    cfg = generate_synthetic_recflow(str(tmp_path / "d2"), n_days=2, rows_per_day=128, seq_len=4)
    from nexus_tpu.data.processor import ConfigProcessor
    from nexus_tpu.training.embedder.recommendation import MLPRetriever

    train_cfg, _ = ConfigProcessor(cfg).split_config()
    model = MLPRetriever(train_cfg.to_attr(),
                         {"embedding_dim": 8, "mlp_layers": [16], "num_neg": 2,
                          "dropout": 0.0, "batch_norm": False})
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / "c"), metrics=["recall"], cutoffs=[2, 7],
        evaluation_strategy="no",
    ))
    RecTrainer(model, targs)
    assert model.cutoffs == [2, 7]


def test_gradient_accumulation(tmp_path):
    """MultiSteps: params update every k micro-batches only."""
    import jax
    from nexus_tpu.data.processor import ConfigProcessor
    from nexus_tpu.data.dataset import ShardedDataset

    cfg = generate_synthetic_recflow(str(tmp_path / "d"), n_days=2, rows_per_day=256, seq_len=4)
    train_cfg, _ = ConfigProcessor(cfg).split_config()
    model = MLPRanker(train_cfg.to_attr(),
                      {"embedding_dim": 8, "mlp_layers": [16], "dropout": 0.0, "batch_norm": False})
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / "c"), num_train_epochs=1, max_steps=2,
        per_device_train_batch_size=8, gradient_accumulation_steps=2,
        learning_rate=0.1, logging_steps=10, evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs)
    state0 = trainer.init_state()
    p0 = jax.tree_util.tree_leaves(state0.params)[0].copy()
    n = trainer.mesh.shape[DATA_AXIS]
    ds = ShardedDataset(train_cfg, batch_size=8 * n, drop_last=True)
    it = iter(ds)
    b1, b2 = next(it), next(it)
    state1 = trainer.train([b1])  # first micro-batch: accumulating, no update
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    assert np.allclose(np.asarray(p0), np.asarray(p1))
    trainer.args.max_steps = 4
    trainer.should_stop = False
    state2 = trainer.train([b2])  # second micro-batch completes the step
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))
