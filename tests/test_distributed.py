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
