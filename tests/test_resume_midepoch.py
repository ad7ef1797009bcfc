"""Mid-epoch deterministic resume: a run interrupted inside an epoch and
resumed from its checkpoint reaches EXACTLY the same final state as an
uninterrupted run (file+offset data cursor saved with trainer_state;
the pipeline replays deterministically from seed+epoch and fast-forwards).
Reference counterpart: HF resume_from_checkpoint skips only whole epochs —
this is strictly stronger."""

import jax
from jax.flatten_util import ravel_pytree as _ravel_pytree
import numpy as np

from nexus_tpu.data.dataset import ShardedDataset
from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.data.synthetic import generate_synthetic_recflow
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.reranker.recommendation import MLPRanker
from nexus_tpu.training.trainer import RecTrainer


def _make(tmp_path, name, **targ_kw):
    cfg = generate_synthetic_recflow(
        str(tmp_path / "data"), n_days=2, rows_per_day=128, seq_len=4
    )
    train_cfg, _ = ConfigProcessor(cfg).split_config()
    model = MLPRanker(
        train_cfg.to_attr(),
        {"embedding_dim": 8, "mlp_layers": [16], "dropout": 0.0, "batch_norm": False},
    )
    targs = TrainingArguments.from_dict(dict(
        output_dir=str(tmp_path / name), num_train_epochs=2,
        per_device_train_batch_size=16, learning_rate=0.01, logging_steps=100,
        optimizer="adam", evaluation_strategy="no", seed=7, **targ_kw,
    ))
    trainer = RecTrainer(model, targs)
    ds = ShardedDataset(train_cfg, batch_size=16, drop_last=True, shuffle=True, seed=7)
    return trainer, ds


def test_midepoch_resume_exact(tmp_path):
    # uninterrupted reference run
    t_full, ds = _make(tmp_path, "full")
    final_full = t_full.train(ds)
    ref_params = jax.tree_util.tree_map(np.asarray, final_full.params)
    total_steps = int(final_full.step)
    assert total_steps > 4

    # interrupted run: stop mid-epoch-0, checkpoint (cursor included)
    stop_at = total_steps // 3  # inside epoch 0
    t_a, ds_a = _make(tmp_path, "part_a", max_steps=stop_at)
    state_a = t_a.train(ds_a)
    assert int(state_a.step) == stop_at
    ckpt = str(tmp_path / "ckpt_mid")
    t_a.save_model(ckpt)
    import os
    assert os.path.exists(os.path.join(ckpt, "data_cursor.json"))

    # resumed run: fast-forwards past the first stop_at batches of epoch 0
    t_b, ds_b = _make(tmp_path, "part_b")
    final_b = t_b.train(ds_b, resume_from_checkpoint=ckpt)
    assert int(final_b.step) == total_steps, (int(final_b.step), total_steps)
    got = jax.tree_util.tree_map(np.asarray, final_b.params)
    flat_ref, _ = _ravel_pytree(ref_params)
    flat_got, _ = _ravel_pytree(got)
    np.testing.assert_allclose(np.asarray(flat_got), np.asarray(flat_ref), atol=1e-6)


def test_cursor_seed_mismatch_ignored(tmp_path):
    """A cursor written under a different seed is ignored (the replay would
    not reproduce the same batches) instead of silently misresuming."""
    t_a, ds_a = _make(tmp_path, "a", max_steps=2)
    t_a.train(ds_a)
    ckpt = str(tmp_path / "ckpt")
    t_a.save_model(ckpt)

    import json, os
    cur_path = os.path.join(ckpt, "data_cursor.json")
    cur = json.load(open(cur_path))
    cur["seed"] = cur["seed"] + 1
    json.dump(cur, open(cur_path, "w"))

    t_b, ds_b = _make(tmp_path, "b", max_steps=3)
    t_b.load_model(ckpt)
    assert getattr(t_b, "_resume_cursor", (0, 0)) == (0, 0)
