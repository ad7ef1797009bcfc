"""Preemption-safe training (training/preemption.py): a real SIGTERM
mid-epoch saves a full resume checkpoint + marker and stops the loop; the
restarted run picks it up via find_preemption_checkpoint and reaches
EXACTLY the uninterrupted run's final state. No reference counterpart
(SURVEY §5: failure detection absent there) — TPU spot-capacity
infrastructure."""

import json
import os
import signal

import jax
import numpy as np
from jax.flatten_util import ravel_pytree as _ravel_pytree

from nexus_tpu.data.dataset import ShardedDataset
from nexus_tpu.data.processor import ConfigProcessor
from nexus_tpu.data.synthetic import generate_synthetic_recflow
from nexus_tpu.training.arguments import TrainingArguments
from nexus_tpu.training.callback import Callback
from nexus_tpu.training.preemption import (
    MARKER,
    PreemptionGuard,
    find_preemption_checkpoint,
)
from nexus_tpu.training.reranker.recommendation import MLPRanker
from nexus_tpu.training.trainer import RecTrainer


def _make(tmp_path, name, callbacks=(), **targ_kw):
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
    trainer = RecTrainer(model, targs, callbacks=list(callbacks))
    ds = ShardedDataset(train_cfg, batch_size=16, drop_last=True, shuffle=True, seed=7)
    return trainer, ds


class _SendSigterm(Callback):
    """Delivers a REAL SIGTERM to this process at a chosen step (the
    handler the guard installed runs before the guard's on_step_end)."""

    def __init__(self, at_step: int):
        self.at_step = at_step

    def on_step_end(self, trainer, step):
        if step == self.at_step:
            os.kill(os.getpid(), signal.SIGTERM)


def test_sigterm_checkpoints_and_resume_is_exact(tmp_path):
    # uninterrupted reference run
    t_full, ds = _make(tmp_path, "full")
    final_full = t_full.train(ds)
    ref_params = jax.tree_util.tree_map(np.asarray, final_full.params)
    total_steps = int(final_full.step)
    assert total_steps > 4

    out = str(tmp_path / "preempt_run")
    stop_at = total_steps // 3  # inside epoch 0
    guard = PreemptionGuard(out)
    # killer BEFORE guard: the signal lands within the same on_step_end round
    t_a, ds_a = _make(tmp_path, "preempt_run",
                      callbacks=[_SendSigterm(stop_at), guard])
    state_a = t_a.train(ds_a)
    assert guard.preempted
    assert int(state_a.step) == stop_at  # stopped right at the signal step
    assert guard.checkpoint_dir is not None
    marker = json.load(open(os.path.join(out, MARKER)))
    assert marker["step"] == stop_at
    assert os.path.exists(os.path.join(guard.checkpoint_dir, "data_cursor.json"))
    # handlers restored after train()
    assert signal.getsignal(signal.SIGTERM) is not guard._handler

    # replacement-VM run: discover + exact resume
    resume = find_preemption_checkpoint(out)
    assert resume == guard.checkpoint_dir
    assert not os.path.exists(os.path.join(out, MARKER))  # marker consumed
    t_b, ds_b = _make(tmp_path, "resumed")
    final_b = t_b.train(ds_b, resume_from_checkpoint=resume)
    assert int(final_b.step) == total_steps

    flat_ref, _ = _ravel_pytree(ref_params)
    flat_got, _ = _ravel_pytree(jax.tree_util.tree_map(np.asarray, final_b.params))
    np.testing.assert_allclose(np.asarray(flat_got), np.asarray(flat_ref), atol=1e-6)


def test_no_marker_means_no_resume(tmp_path):
    assert find_preemption_checkpoint(str(tmp_path)) is None


def test_auto_resume_via_preemption_safe_default(tmp_path):
    """With preemption_safe=True (the default), train() installs the guard
    itself and a rerun with NO resume argument picks up the marker."""
    t_full, ds = _make(tmp_path, "full2")
    ref = t_full.train(ds)
    total_steps = int(ref.step)

    out_name = "auto"
    guard_probe = {}

    class _Kill(Callback):
        def on_step_end(self, trainer, step):
            if step == 3:
                os.kill(os.getpid(), signal.SIGTERM)

    t_a, ds_a = _make(tmp_path, out_name, callbacks=[_Kill()])
    state_a = t_a.train(ds_a)
    assert int(state_a.step) == 3
    # guard was auto-installed by the trainer (not passed by the user)
    assert any(type(cb).__name__ == "PreemptionGuard" for cb in t_a.callbacks)
    assert os.path.exists(os.path.join(t_a.args.output_dir, MARKER))

    # replacement run: same command, no resume argument
    t_b, ds_b = _make(tmp_path, out_name)
    final_b = t_b.train(ds_b)
    assert int(final_b.step) == total_steps
    assert not os.path.exists(os.path.join(t_b.args.output_dir, MARKER))

    flat_ref, _ = _ravel_pytree(jax.tree_util.tree_map(np.asarray, ref.params))
    flat_got, _ = _ravel_pytree(jax.tree_util.tree_map(np.asarray, final_b.params))
    np.testing.assert_allclose(np.asarray(flat_got), np.asarray(flat_ref), atol=1e-6)


def test_prefetch_worker_exits_on_abandonment():
    """An early-stopped training loop (preemption, early-stop, exception)
    abandons the _prefetch generator mid-stream; the worker thread must
    exit instead of blocking in queue.put forever holding batch memory."""
    import threading
    import time

    from nexus_tpu.training.trainer import _prefetch

    before = set(threading.enumerate())

    def infinite():
        i = 0
        while True:
            yield np.zeros(1024) + i
            i += 1

    gen = _prefetch(infinite(), size=2)
    assert float(next(gen)[0]) == 0.0
    assert float(next(gen)[0]) == 1.0
    gen.close()  # what GC does when the loop breaks

    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before if t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"prefetch worker leaked: {leaked}"

    # normal completion still delivers everything + propagates errors
    def short():
        yield 1
        yield 2
        raise RuntimeError("boom")

    got = []
    try:
        for x in _prefetch(short(), size=2):
            got.append(x)
    except RuntimeError as e:
        assert str(e) == "boom"
    else:  # pragma: no cover
        raise AssertionError("error was not propagated")
    assert got == [1, 2]


def test_batch_stream_is_hash_salt_independent(tmp_path):
    """Cross-process exactness: the shuffled batch stream must not depend on
    PYTHONHASHSEED (a resumed run lives in a NEW process on a NEW VM).
    Regression for dataset.py seeding per-file shuffles with str hash()."""
    import subprocess
    import sys

    from nexus_tpu.data.synthetic import generate_synthetic_recflow

    data_dir = str(tmp_path / "hashdata")
    generate_synthetic_recflow(data_dir, n_days=1, rows_per_day=64, seq_len=4)
    snippet = (
        "import json, numpy as np\n"
        "from nexus_tpu.data.processor import ConfigProcessor\n"
        "from nexus_tpu.data.dataset import ShardedDataset\n"
        "from nexus_tpu.data.synthetic import generate_synthetic_recflow\n"
        f"cfg = generate_synthetic_recflow({data_dir!r}, n_days=1, rows_per_day=64, seq_len=4)\n"
        "train_cfg, _ = ConfigProcessor(cfg).split_config()\n"
        "ds = ShardedDataset(train_cfg, batch_size=16, drop_last=True, shuffle=True, seed=3)\n"
        "b = next(iter(ds))\n"
        "print(json.dumps(sorted((k, float(np.sum(v))) for k, v in b.items()"
        " if isinstance(v, np.ndarray))))\n"
    )
    outs = []
    for salt in ("1", "2"):
        env = {**os.environ, "PYTHONHASHSEED": salt, "JAX_PLATFORMS": "cpu",
               "PYTHONPATH": os.pathsep.join(
                   [p for p in (os.environ.get("PYTHONPATH", ""),) if p] + ["/root/repo"])}
        r = subprocess.run([sys.executable, "-c", snippet], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(r.stdout.strip().splitlines()[-1])
    assert outs[0] == outs[1]


def test_programmatic_trigger_saves_once(tmp_path):
    """request_preemption() (worker-thread/cluster-agent path) saves exactly
    one checkpoint even though on_step_end keeps firing until the loop
    checks should_stop."""
    out = str(tmp_path / "prog")
    guard = PreemptionGuard(out)

    class _Trigger(Callback):
        def on_step_end(self, trainer, step):
            if step >= 2:
                guard.request_preemption()

    t, ds = _make(tmp_path, "prog", callbacks=[_Trigger(), guard])
    state = t.train(ds)
    assert int(state.step) == 2
    assert guard.checkpoint_dir and os.path.isdir(guard.checkpoint_dir)
