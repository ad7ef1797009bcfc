"""Model-parallel embedding-table sharding over a 2D (data, model) mesh."""

import jax
import numpy as np
import pytest

from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.data.dataset import ShardedDataset
from nexus_tpu.data.synthetic import generate_synthetic_recflow
from nexus_tpu.parallel.mesh import make_mesh
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.reranker.recommendation import MLPRanker
from nexus_tpu.training.trainer import RecTrainer


def test_embedding_tables_row_sharded(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh({"data": 2, "model": 4})
    cfg = generate_synthetic_recflow(str(tmp_path / "d"), n_days=2, rows_per_day=256, seq_len=4)
    train_cfg, _ = ConfigProcessor(cfg).split_config()
    model = MLPRanker(train_cfg.to_attr(),
                      {"embedding_dim": 8, "mlp_layers": [16], "dropout": 0.0, "batch_norm": False})
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / "c"), num_train_epochs=1, max_steps=2,
        per_device_train_batch_size=8, learning_rate=0.01, logging_steps=10,
        evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs, mesh=mesh, shard_embedding_tables=True)
    state = trainer.init_state()

    # the fused table (sum of all cardinalities = 3548 rows) is row-sharded
    def find_table(tree):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            if any(getattr(k, "key", None) == "embedding" for k in path):
                return leaf
        return None

    table = find_table(state.params)
    assert table is not None and table.shape[0] >= 1024
    assert not table.sharding.is_fully_replicated
    # optimizer moments for the table carry the same layout
    mu_table = [
        l for l in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(l, "shape") and tuple(l.shape) == tuple(table.shape)
    ]
    assert mu_table and all(not l.sharding.is_fully_replicated for l in mu_table)

    # the compiled step trains and preserves the layout (XLA inserts the
    # collectives for the sharded gathers)
    ds = ShardedDataset(train_cfg, batch_size=16, drop_last=True)
    final = trainer.train(lambda: iter(ds))
    assert int(final.step) == 2
    table2 = find_table(final.params)
    assert not table2.sharding.is_fully_replicated
