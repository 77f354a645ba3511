"""Worker for the REAL multi-process loopback test (BASELINE configs 3/5;
SURVEY.md 2.4 P4): N CPU processes, 4 fake devices each, join one
``jax.distributed`` cluster, build the GLOBAL (4*N)-device data mesh, shard
the synthetic global batch per host exactly like the grain pipeline
(``_host_slice``), and run ONE full sharded train step (grads + Adam +
sync-BN) — executing coordinated cross-process collectives for real.

    python tests/_distributed_worker.py <pid> <nproc> <port>

Prints ``LOSS <loss> D1 <d1>`` — the parent test asserts both processes
agree and that a 1-process run of the same global program matches.
"""

import os
import sys

PID, NPROC, PORT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{PORT}", num_processes=NPROC, process_id=PID
)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecm_tpu.data.pipeline import _host_slice  # noqa: E402
from ecm_tpu.data.synthetic import make_batch  # noqa: E402
from ecm_tpu.models import build_model  # noqa: E402
from ecm_tpu.parallel.sharding import (  # noqa: E402
    batch_sharding,
    make_mesh,
    replicate,
    use_mesh,
)
from ecm_tpu.train.state import create_train_state, make_optimizer  # noqa: E402
from ecm_tpu.train.steps import make_train_step  # noqa: E402

MAXD, H, W, FEAT = 32, 64, 96, 8
GLOBAL_BATCH = 8

assert jax.process_count() == NPROC, jax.process_count()
assert jax.process_index() == PID, jax.process_index()
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * NPROC

# per-host pipeline sharding contract (data/pipeline.py:_host_slice)
host_bs, shard = _host_slice(GLOBAL_BATCH)
assert (host_bs, shard) == (GLOBAL_BATCH // NPROC, PID), (host_bs, shard)

model = build_model("stackhourglass", max_disp=MAXD, feature_channels=FEAT)
state = create_train_state(
    model, jax.random.PRNGKey(0), (H, W, 3), make_optimizer(1e-3), batch_size=1
)
step = make_train_step(model, MAXD)

# deterministic GLOBAL batch (same seed on every process); this host
# contributes only its _host_slice rows — the per-host pipeline pattern
full = make_batch(0, GLOBAL_BATCH, H, W, max_disp=MAXD - 8)
local = {k: v[shard * host_bs : (shard + 1) * host_bs] for k, v in full.items()}

mesh = make_mesh(data=4 * NPROC, disp=1)
rep = replicate(mesh)
bsh = batch_sharding(mesh)
with use_mesh(mesh):
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state,
    )
    batch = {
        k: jax.make_array_from_process_local_data(bsh, v) for k, v in local.items()
    }
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])  # scalar -> fully replicated
    d1 = float(metrics["d1_all"])

print(f"LOSS {loss:.6f} D1 {d1:.6f}", flush=True)
jax.distributed.shutdown()
