"""Multi-process (multi-host) contrastive training example — the analog of
the reference's accelerate multi_node run scripts
(examples/text_retrieval/training/embedder/run_multi_node.sh + the static
rdzv multi_node.json), redesigned for jax.distributed.

Run N processes, each seeing its local chips, with the same command:

    # host 0 (the coordinator):
    python run_multiprocess.py --coord HOST0:12355 --num_processes 2 --pid 0 ...
    # host 1:
    python run_multiprocess.py --coord HOST0:12355 --num_processes 2 --pid 1 ...

With no --coord it runs single-process (same script both ways — the
reference needs separate accelerate configs per topology). Offline demo on
one machine (2 processes x 2 virtual CPU devices each):

    python run_multiprocess.py --demo

The bring-up goes through `initialize_distributed` (health-checked: bounded
coordinator probe, post-init device-count validation, one smoke psum over
every device) instead of a bare jax.distributed.initialize that hangs
forever on a bad address.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))


def train(coord, num_processes, pid, steps):
    from nexus_tpu.parallel.bootstrap import initialize_distributed
    from nexus_tpu.parallel.mesh import make_mesh

    report = initialize_distributed(
        coordinator_address=coord, num_processes=num_processes, process_id=pid
    )
    print(f"[proc {report['process_id']}] bring-up: {report}")

    import jax
    import numpy as np

    from nexus_tpu.models.bert import BertConfig
    from nexus_tpu.parallel.mesh import shard_batch
    from nexus_tpu.training.arguments import TrainingArguments
    from nexus_tpu.training.embedder.text_retrieval.arguments import (
        TextEmbedderModelArguments,
    )
    from nexus_tpu.training.embedder.text_retrieval.modeling import BiTextEmbedderModel
    from nexus_tpu.training.trainer import RecTrainer

    mesh = make_mesh({"data": jax.device_count()})
    config = BertConfig(
        vocab_size=1024, hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, max_position_embeddings=64, add_pooling_layer=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    margs = TextEmbedderModelArguments(
        temperature=0.05, dtype="float32", negatives_cross_device=True
    )
    model = BiTextEmbedderModel(config, margs)
    targs = TrainingArguments.from_dict(dict(
        output_dir="/tmp/nx_multiproc", num_train_epochs=1,
        per_device_train_batch_size=2, learning_rate=1e-3, logging_steps=1,
        evaluation_strategy="no",
    ))
    trainer = RecTrainer(model, targs, mesh=mesh)
    trainer.init_state()
    step_fn = trainer._build_train_step()

    b, group, seq = 2 * jax.device_count(), 2, 16
    rng = np.random.default_rng(0)  # same seed -> identical global batch
    batch = shard_batch({
        "query_input_ids": rng.integers(1, 1000, (b, seq)).astype(np.int32),
        "query_attention_mask": np.ones((b, seq), np.int32),
        "passage_input_ids": rng.integers(1, 1000, (b * group, seq)).astype(np.int32),
        "passage_attention_mask": np.ones((b * group, seq), np.int32),
    }, mesh)
    from nexus_tpu.parallel.mesh import data_parallel_shardings

    _, rep = data_parallel_shardings(mesh)
    key = jax.device_put(jax.random.PRNGKey(0), rep)
    state = trainer._state
    for i in range(steps):
        state, metrics = step_fn(state, batch, key)
        print(f"[proc {pid or 0}] step {i}: loss={float(metrics['loss']):.4f}")
    return float(metrics["loss"])


def demo():
    """2 local processes x 2 virtual CPU devices, loopback coordination."""
    import socket
    import subprocess

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ, XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_PLATFORMS="cpu", NEXUS_FORCE_CPU="1")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--coord", coord,
             "--num_processes", "2", "--pid", str(i)],
            env=env,
        )
        for i in range(2)
    ]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0, 0], rcs
    print("demo OK: 2-process x 2-device training ran to completion")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", default=None, help="coordinator host:port (process 0's host)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--demo", action="store_true")
    args = ap.parse_args()
    if args.demo:
        demo()
        return
    if os.environ.get("NEXUS_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    train(args.coord, args.num_processes, args.pid, args.steps)


if __name__ == "__main__":
    main()
