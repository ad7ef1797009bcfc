"""Multi-host runtime simulation: 2 jax processes over TCP coordination
(the CPU stand-in for a multi-host TPU pod — SURVEY §4.7's 'multi-node
without a cluster' gap in the reference, closed here)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 local x 2 processes

    sys.path.insert(0, %r)
    from nexus_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"data": 4})
    # global array from per-process shards + a compiled all-reduce
    sh = NamedSharding(mesh, P("data"))
    import numpy as np
    local = np.full((2, 4), pid + 1.0, np.float32)
    garr = jax.make_array_from_process_local_data(sh, local, (4, 4))
    total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(garr)
    expected = 8 * 1.0 + 8 * 2.0
    assert float(total) == expected, float(total)
    print(f"proc {pid} OK total={float(total)}")
    """
)


def test_two_process_mesh_collective(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER % repo)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out


BOOT_WORKER = textwrap.dedent(
    """
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord, pid = sys.argv[1], int(sys.argv[2])
    sys.path.insert(0, %r)
    from nexus_tpu.parallel.bootstrap import initialize_distributed

    report = initialize_distributed(
        coordinator_address=coord, num_processes=2, process_id=pid,
        timeout_s=120, expected_local_devices=2,
    )
    assert report["process_count"] == 2
    assert report["global_devices"] == 4
    assert report["collective_ok"] is True
    print(f"proc {pid} BOOTSTRAP-OK " + json.dumps(report))
    """
)


def test_bootstrap_two_process_healthcheck(tmp_path):
    """initialize_distributed: reachability probe + init + device-count
    validation + psum smoke over both processes' devices."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "boot.py"
    script.write_text(BOOT_WORKER % repo)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=150)
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} BOOTSTRAP-OK" in out


def test_bootstrap_unreachable_coordinator_fails_fast():
    """A wrong coordinator address raises a diagnosed BootstrapError within
    the timeout instead of hanging forever (the reference's failure mode)."""
    import time

    from nexus_tpu.parallel.bootstrap import BootstrapError, _probe_coordinator

    t0 = time.monotonic()
    with pytest.raises(BootstrapError, match="unreachable"):
        _probe_coordinator("127.0.0.1:1", time.monotonic() + 2.0, process_id=1)
    assert time.monotonic() - t0 < 10

    with pytest.raises(BootstrapError, match="host:port"):
        _probe_coordinator("not-an-address", time.monotonic() + 1.0, process_id=1)


def test_bootstrap_single_process_validation():
    """Without a coordinator the same entry point validates the local
    runtime (device count + collective smoke) — 1-host/N-host symmetric."""
    from nexus_tpu.parallel.bootstrap import initialize_distributed

    report = initialize_distributed()
    assert report["process_count"] == 1
    assert report["collective_ok"] is True
    assert report["global_devices"] >= 1
