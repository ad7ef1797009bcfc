"""Async checkpointing (training/async_checkpoint.py): background writes
produce byte-identical checkpoints to the synchronous path, overlap
training, apply back-pressure (one save in flight) and re-raise background
errors on the training thread. No reference counterpart (HF Trainer saves
are synchronous)."""

import os
import threading
import time

import jax
import numpy as np
import pytest
from flax import serialization

from nexus_tpu.data.dataset import ShardedDataset
from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.data.synthetic import generate_synthetic_recflow
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.async_checkpoint import AsyncCheckpointer
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
        output_dir=str(tmp_path / name), num_train_epochs=1,
        per_device_train_batch_size=16, learning_rate=0.01, logging_steps=100,
        optimizer="adam", evaluation_strategy="no", seed=7, **targ_kw,
    ))
    trainer = RecTrainer(model, targs, callbacks=[])
    ds = ShardedDataset(train_cfg, batch_size=16, drop_last=True, shuffle=True, seed=7)
    return trainer, ds


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def test_async_checkpoint_bytes_match_sync(tmp_path):
    """Same trained state saved async and sync -> identical model.msgpack +
    trainer_state.msgpack, and the async files restore exactly."""
    trainer, ds = _make(tmp_path, "run", max_steps=4, async_checkpoint=True)
    trainer.train(ds)

    sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
    trainer.save_model(sync_dir, blocking=True)
    trainer.save_model(async_dir)           # async path (args flag on)
    trainer._checkpointer.wait()
    for fname in ("model.msgpack", "trainer_state.msgpack", "data_cursor.json"):
        assert _read(os.path.join(sync_dir, fname)) == _read(
            os.path.join(async_dir, fname)), fname
    # model_config.json embeds its own checkpoint dir (model_name_or_path,
    # reference schema) — compare everything else
    import json
    cfgs = []
    for d in (sync_dir, async_dir):
        with open(os.path.join(d, "model_config.json")) as f:
            c = json.load(f)
        c.pop("model_name_or_path")
        cfgs.append(c)
    assert cfgs[0] == cfgs[1]

    # and a fresh trainer restores the async checkpoint to the exact state
    t2, _ = _make(tmp_path, "restore")
    t2.load_model(async_dir)
    a = jax.tree_util.tree_map(np.asarray, trainer._state.params)
    b = jax.tree_util.tree_map(np.asarray, t2._state.params)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(x, y)
    assert int(t2._state.step) == int(trainer._state.step)


def test_checkpoint_during_training_with_donated_buffers(tmp_path):
    """checkpoint_steps + async: the device->host snapshot happens before the
    next step donates the state, so mid-train async saves are safe and all
    land by the time train() returns."""
    trainer, ds = _make(tmp_path, "mid", max_steps=6,
                        checkpoint_steps=2, async_checkpoint=True)
    trainer.train(ds)
    out = trainer.args.output_dir
    for step in (2, 4, 6):
        d = os.path.join(out, f"checkpoint-{step}")
        assert os.path.exists(os.path.join(d, "model.msgpack")), d
        # trainer state carries the right step
        raw = _read(os.path.join(d, "trainer_state.msgpack"))
        restored = serialization.msgpack_restore(raw)
        assert int(restored["step"]) == step


def test_one_save_in_flight_and_overlap():
    ck = AsyncCheckpointer()
    order = []
    gate = threading.Event()

    def slow():
        gate.wait(5.0)
        order.append("slow")

    t0 = time.monotonic()
    ck.submit(slow, target="slow")
    assert time.monotonic() - t0 < 1.0  # returned immediately
    assert ck.in_flight
    order.append("train-step")          # training overlaps the save
    gate.set()
    ck.submit(lambda: order.append("second"), target="second")  # joins first
    ck.wait()
    assert order == ["train-step", "slow", "second"]


def test_background_error_reraised_on_next_wait():
    ck = AsyncCheckpointer()
    ck.submit(lambda: (_ for _ in ()).throw(OSError("disk full")), target="/nope")
    with pytest.raises(RuntimeError, match="async checkpoint save to '/nope'"):
        ck.wait()
    # the error is consumed: the checkpointer is reusable afterwards
    ck.submit(lambda: None)
    ck.wait()
