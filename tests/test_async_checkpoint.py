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


def test_inflight_save_lands_when_training_loop_raises(tmp_path):
    """Review fix: an exception aborting the train loop must not abandon an
    in-flight background write (daemon threads die with the process — a
    truncated checkpoint would poison resume). The loop drains the
    checkpointer on the exception path, so the files are complete."""
    trainer, ds = _make(tmp_path, "run", async_checkpoint=True)

    release = threading.Event()
    real_save = trainer.model.save

    def slow_save(*a, **kw):
        release.wait(10.0)
        return real_save(*a, **kw)

    trainer.model.save = slow_save
    ckpt = str(tmp_path / "mid")

    class Boom(RuntimeError):
        pass

    class SaveThenRaise:
        def __init__(self):
            self.fired = False

        def on_log(self, *a):
            pass

        def on_train_begin(self, *a):
            pass

        def on_train_end(self, *a):
            pass

        def on_epoch_end(self, *a):
            pass

        def on_step_end(self, trainer_, step):
            if not self.fired:
                self.fired = True
                trainer_.save_model(ckpt)        # async submit (slow writer)
                release.set()
                raise Boom("mid-training failure")

    trainer.callbacks = [SaveThenRaise()]
    with pytest.raises(Boom):
        trainer.train(ds)
    # the background write landed before train() propagated the exception
    assert not trainer._checkpointer.in_flight
    state = _read(os.path.join(ckpt, "model.msgpack"))
    assert len(state) > 0
    from flax import serialization as ser

    ser.msgpack_restore(state)  # parses -> not truncated


def test_async_save_snapshots_item_vectors(tmp_path):
    """Review fix: the background writer must serialize the item vectors as
    they were at submit time, not whatever the live attribute mutates to
    while the write is in flight."""
    trainer, _ = _make(tmp_path, "run", async_checkpoint=True)
    trainer.init_state(jax.random.PRNGKey(0))

    release = threading.Event()
    import nexus_tpu.training.checkpoint as ckpt_mod

    real = ckpt_mod.save_checkpoint

    def slow(*a, **kw):
        release.wait(10.0)
        return real(*a, **kw)

    snap = np.ones((4, 8), np.float32)
    trainer.model.item_vectors = snap.copy()
    out = str(tmp_path / "iv")
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(ckpt_mod, "save_checkpoint", slow)
        trainer.save_model(out)  # async submit
        # mutate the live attribute while the writer is blocked
        trainer.model.item_vectors = np.zeros((4, 8), np.float32)
        release.set()
        trainer._checkpointer.wait()
    vecs = np.load(os.path.join(out, "item_vectors.npy"))
    np.testing.assert_array_equal(vecs, snap)


def test_preempt_save_survives_stale_async_error(tmp_path):
    """Review fix: a failed EARLIER background save must not forfeit the
    last-chance preemption checkpoint — the guard retries the synchronous
    save after the stale error re-raises."""
    import json

    from nexus_tpu.training.preemption import MARKER, PreemptionGuard

    trainer, ds = _make(tmp_path, "run", max_steps=2, async_checkpoint=True)
    trainer.train(ds)

    # plant a stale background failure
    trainer._checkpointer.submit(
        lambda: (_ for _ in ()).throw(IOError("disk full")), target="old")
    trainer._checkpointer._thread.join()

    guard = PreemptionGuard(str(tmp_path / "run"))
    guard._flag.set()
    guard.on_step_end(trainer, step=2)
    marker = os.path.join(str(tmp_path / "run"), MARKER)
    assert os.path.exists(marker), "preempt checkpoint was forfeited"
    info = json.load(open(marker))
    assert os.path.exists(os.path.join(info["checkpoint"], "model.msgpack"))
