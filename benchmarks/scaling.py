"""Scaling harness (BASELINE.json:5 "scaling efficiency >= 0.85 at 1 chip /
1 host / N hosts"; round-1 verdict ask #5).

Sweep of the FULL jitted train step (forward + loss + grads + Adam +
sync-BN) over meshes (1,1), (2,1), (4,1), (8,1), (4,2) on the
8-fake-CPU-device mesh. Real multi-chip ICI cannot be measured here (single
physical chip via the axon relay — SURVEY.md section 0), and the 8 fake
devices timeshare the SAME physical cores, so throughput-vs-devices is
meaningless. The meaningful, resource-normalized number this harness
reports is **partitioning efficiency**: for each mesh, the same GLOBAL
batch is stepped unsharded on 1 device and sharded over the mesh —
efficiency = t_unsharded / t_sharded. The sharded program executes every
collective the real slice would (grad psum, sync-BN reductions, disp-axis
halos), so this isolates the overhead GSPMD partitioning adds, with the
compute held constant. ICI bandwidth itself remains unmeasurable until a
real multi-chip slice is attached.

    python benchmarks/scaling.py          # writes benchmarks/SCALING.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ECM_TPU_COMPILE_CACHE", "/tmp/ecm_tpu_jax_cache"),
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# small model: the point is collective/partitioning overhead, not FLOPs
MAXD, H, W, FEAT = 32, 64, 128, 8
PER_DEVICE_BATCH = 2
STEPS = 4  # timed steps per mesh after warmup


def git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__),
        ).stdout.strip()
    except Exception:
        return "unknown"


def _make_batch(batch: int, seed: int):
    r = np.random.default_rng(seed)
    return {
        "left": r.normal(size=(batch, H, W, 3)).astype(np.float32),
        "right": r.normal(size=(batch, H, W, 3)).astype(np.float32),
        "disparity": r.uniform(1.0, MAXD - 1, size=(batch, H, W)).astype(
            np.float32
        ),
    }


def _timed_steps(step, state, batches) -> float:
    state, m = step(state, batches[0])  # warmup/compile
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for b in batches:
        state, m = step(state, b)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / len(batches)


_baseline_cache: dict[int, float] = {}


def run_mesh(data: int, disp: int) -> dict:
    """Time the same global batch unsharded (1 device) and sharded over the
    (data, disp) mesh; efficiency = unsharded / sharded step time."""
    from ecm_tpu.models import build_model
    from ecm_tpu.parallel.sharding import (
        batch_sharding,
        make_mesh,
        replicate,
        use_mesh,
    )
    from ecm_tpu.train.state import create_train_state, make_optimizer
    from ecm_tpu.train.steps import make_train_step

    n = data * disp
    batch = PER_DEVICE_BATCH * max(data, 1)
    model = build_model(
        "stackhourglass", max_disp=MAXD, feature_channels=FEAT, remat=True
    )

    def fresh_state():
        return create_train_state(
            model, jax.random.PRNGKey(0), (H, W, 3), make_optimizer(1e-3),
            batch_size=1,
        )

    step = make_train_step(model, MAXD)
    batches = [_make_batch(batch, s) for s in range(STEPS)]

    if batch not in _baseline_cache:
        _baseline_cache[batch] = _timed_steps(
            step,
            fresh_state(),
            [{k: jnp.asarray(v) for k, v in b.items()} for b in batches],
        )
    t_single = _baseline_cache[batch]

    mesh = make_mesh(data=data, disp=disp, devices=jax.devices()[:n])
    with use_mesh(mesh):
        state = jax.device_put(fresh_state(), replicate(mesh))
        sharded = [jax.device_put(b, batch_sharding(mesh)) for b in batches]
        t_sharded = _timed_steps(step, state, sharded)
    return {
        "mesh": [data, disp],
        "devices": n,
        "global_batch": batch,
        "unsharded_step_ms": round(1e3 * t_single, 2),
        "sharded_step_ms": round(1e3 * t_sharded, 2),
        "partition_efficiency": round(t_single / t_sharded, 3),
    }


def main() -> None:
    meshes = [(1, 1), (2, 1), (4, 1), (8, 1), (4, 2)]
    points = [run_mesh(d, p) for d, p in meshes]
    for p in points:
        print(
            f"mesh {tuple(p['mesh'])}: unsharded {p['unsharded_step_ms']:7.1f} "
            f"ms -> sharded {p['sharded_step_ms']:7.1f} ms, partition "
            f"efficiency {p['partition_efficiency']:.3f}"
        )
    out = {
        "git": git_sha(),
        "note": (
            "8 fake CPU devices timesharing one set of physical cores: "
            "throughput-vs-devices is meaningless here, so each point "
            "compares the SAME global batch unsharded (1 device) vs sharded "
            "over the mesh — partition_efficiency isolates GSPMD "
            "partitioning/collective overhead at constant compute. ICI "
            "bandwidth needs a real multi-chip slice."
        ),
        "target_efficiency": 0.85,
        "points": points,
    }
    path = os.path.join(os.path.dirname(__file__), "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
