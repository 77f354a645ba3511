"""Scaling harness (BASELINE.json:5 "scaling efficiency >= 0.85 at 1 chip /
1 host / N hosts"; round-1 verdict ask #5).

Sweep of the FULL jitted train step (forward + loss + grads + Adam +
sync-BN) over meshes (1,1), (2,1), (4,1), (8,1), (4,2) on the
8-fake-CPU-device mesh. Real multi-chip ICI cannot be measured here (single
physical chip via the axon relay — SURVEY.md section 0), and the 8 fake
devices timeshare the SAME physical cores, so throughput-vs-devices is
meaningless. The meaningful, resource-normalized number this harness
reports is **partitioning efficiency** against a pinned (1,1) baseline:
the (1,1) mesh point is timed once at the constant per-device batch, giving
a stable per-sample step time; every other mesh's ideal step time is
(per-sample baseline) x (its global batch) — correct for timesharing fake
devices, where total physical compute scales with global batch regardless
of sharding — and efficiency = ideal / measured, capped at 1.0. (Round-3
verdict: the previous same-global-batch-unsharded-on-1-device baseline hit
memory pressure at batch 8+ and reported nonsense efficiencies up to 1.76;
a small pinned baseline can't.) The sharded program executes every
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


def run_mesh(data: int, disp: int, t_per_sample_base: float | None) -> dict:
    """Time the sharded train step over the (data, disp) mesh at constant
    per-device batch; efficiency vs the pinned (1,1) per-sample baseline
    (module docstring). ``t_per_sample_base=None`` marks the baseline point
    itself."""
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

    mesh = make_mesh(data=data, disp=disp, devices=jax.devices()[:n])
    with use_mesh(mesh):
        state = jax.device_put(fresh_state(), replicate(mesh))
        sharded = [jax.device_put(b, batch_sharding(mesh)) for b in batches]
        t_sharded = _timed_steps(step, state, sharded)
    point = {
        "mesh": [data, disp],
        "devices": n,
        "global_batch": batch,
        "sharded_step_ms": round(1e3 * t_sharded, 2),
        "per_sample_ms": round(1e3 * t_sharded / batch, 2),
    }
    if t_per_sample_base is not None:
        ideal = t_per_sample_base * batch
        eff = ideal / t_sharded
        point["partition_efficiency"] = round(min(eff, 1.0), 3)
        if eff > 1.0:
            point["efficiency_uncapped"] = round(eff, 3)
    else:
        point["partition_efficiency"] = 1.0  # baseline by definition
    return point


def main() -> None:
    # the (1,1) baseline is the flaky number on a time-shared box (observed
    # 2x run-to-run flapping at batch 2 while the 8-device points stayed
    # within 1%) — take the MIN of 3 repeats (min is robust to transient
    # contention; the fastest observed run is the machine's true rate)
    bases = [run_mesh(1, 1, None) for _ in range(3)]
    base = min(bases, key=lambda p: p["sharded_step_ms"])
    t_per_sample_base = base["sharded_step_ms"] / 1e3 / base["global_batch"]
    points = [base] + [
        run_mesh(d, p, t_per_sample_base)
        for d, p in [(2, 1), (4, 1), (8, 1), (4, 2)]
    ]
    # cross-normalized control: (4,2) vs (8,1) per-sample time in the SAME
    # run — both 8-device, so machine-wide noise cancels; this isolates what
    # the disp axis costs relative to pure DP
    per = {tuple(p["mesh"]): p["sharded_step_ms"] / p["global_batch"] for p in points}
    disp_ratio = round(per[(4, 2)] / per[(8, 1)], 3)
    for p in points:
        print(
            f"mesh {tuple(p['mesh'])}: sharded {p['sharded_step_ms']:7.1f} ms "
            f"(global batch {p['global_batch']}), partition efficiency "
            f"{p['partition_efficiency']:.3f}"
        )
    out = {
        "git": git_sha(),
        "note": (
            "8 fake CPU devices timesharing one set of physical cores: "
            "throughput-vs-devices is meaningless here, so every point runs "
            "constant per-device batch and is normalized by the pinned (1,1) "
            "per-sample step time (ideal step = per-sample x global batch, "
            "exact under timesharing) — partition_efficiency isolates GSPMD "
            "partitioning/collective overhead, capped at 1.0. ICI bandwidth "
            "needs a real multi-chip slice."
        ),
        "target_efficiency": 0.85,
        "baseline_repeats_ms": [p["sharded_step_ms"] for p in bases],
        "disp42_vs_dp81_per_sample_ratio": disp_ratio,
        "points": points,
    }
    path = os.path.join(os.path.dirname(__file__), "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
