"""Multi-host bootstrap path (BASELINE configs 3/5; SURVEY.md 2.4 P4):
``jax.distributed.initialize()`` loopback — a 1-process "cluster" on CPU —
so the coordinator/client runtime the multi-host CLIs enter via
``--multihost`` actually executes somewhere before a real pod slice does.

Runs in a subprocess: distributed init is global, irreversible state that
must not leak into the other tests' jax runtime.
"""

import os
import subprocess
import sys

_LOOPBACK = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:12399", num_processes=1, process_id=0
)
import jax.numpy as jnp
assert jax.process_count() == 1, jax.process_count()
assert jax.process_index() == 0, jax.process_index()
out = jax.jit(lambda x: x * 2)(jnp.ones((4,)))
assert float(out.sum()) == 8.0
# the per-host sharding helper the input pipeline uses must agree
from ecm_tpu.data.pipeline import _host_slice
host_bs, shard = _host_slice(8)
assert (host_bs, shard) == (8, 0), (host_bs, shard)
jax.distributed.shutdown()
print("LOOPBACK-OK")
"""


def test_distributed_loopback_initialize():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _LOOPBACK],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert "LOOPBACK-OK" in r.stdout


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse(stdout: str) -> tuple[float, float]:
    for line in stdout.splitlines():
        if line.startswith("LOSS "):
            parts = line.split()
            return float(parts[1]), float(parts[3])
    raise AssertionError(f"no LOSS line in {stdout[-500:]!r}")


def _launch_cluster(nproc: int, timeout: int = 600) -> list[tuple[float, float]]:
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_distributed_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4/process)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(worker))
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (stdout[-1000:], stderr[-2000:])
        outs.append(_parse(stdout))
    return outs


def test_two_process_sharded_train_step_matches_single():
    """REAL multi-process coordination (round-3 verdict ask #4): two OS
    processes with 4 fake CPU devices each join one jax.distributed cluster,
    shard a global batch per host (the grain-pipeline `_host_slice` pattern),
    and run one full sharded train step over the global 8-device mesh —
    cross-process grad psum + sync-BN collectives execute for real. Loss/D1
    must agree across the two processes (replicated outputs) AND match a
    1-process run of the same global program."""
    two = _launch_cluster(2)
    assert abs(two[0][0] - two[1][0]) < 1e-6, two  # replicated loss agrees
    assert abs(two[0][1] - two[1][1]) < 1e-6, two

    one = _launch_cluster(1)
    # same global batch, same init, same global program: loss must match the
    # single-process run to partitioning-reduction noise
    assert abs(two[0][0] - one[0][0]) / max(abs(one[0][0]), 1e-9) < 1e-4, (two, one)
    assert abs(two[0][1] - one[0][1]) < 1e-3, (two, one)
