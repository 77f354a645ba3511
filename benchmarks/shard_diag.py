"""Diagnose the (4,2) disp-mesh partition-efficiency collapse (round-4
verdict ask #5: SCALING.json showed 0.449 at mesh (4,2) vs 1.0 pure-DP,
with nothing identifying which GSPMD-inserted collectives eat the 2.2x).

Lowers the SAME jitted train step benchmarks/scaling.py times, on the same
8-fake-CPU-device meshes, and parses the partitioned HLO: every collective
op (all-reduce / all-gather / all-to-all / collective-permute / reduce-
scatter) is counted with its result bytes, plus the total sharded-program
byte volume moved, per mesh. Comparing (8,1) vs (4,2) shows what the disp
axis ADDS. Writes benchmarks/SHARD_DIAG.json.

    python benchmarks/shard_diag.py
"""

from __future__ import annotations

import collections
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

MAXD, H, W, FEAT = 32, 64, 128, 8
PER_DEVICE_BATCH = 2

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f64": 8, "s8": 1, "u8": 1, "s64": 8, "u64": 8}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _result_bytes(shape_str: str) -> int:
    """Total bytes of an HLO result type string (handles tuples)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_COLL_RE = re.compile(
    r"^\s*(?:\S+\s*=\s*)?((?:\([^)]*\)|\S+))\s+"
    r"(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-start)?\(",
)


def census(hlo: str) -> dict:
    counts: dict = collections.defaultdict(lambda: {"n": 0, "bytes": 0})
    for line in hlo.splitlines():
        m = _COLL_RE.match(line)
        if not m:
            continue
        shape_str, op = m.group(1), m.group(2)
        c = counts[op]
        c["n"] += 1
        c["bytes"] += _result_bytes(shape_str)
    return {
        op: {"n": c["n"], "mb": round(c["bytes"] / 2**20, 2)}
        for op, c in sorted(counts.items())
    }


def lower_mesh(data: int, disp: int) -> dict:
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
    state = create_train_state(
        model, jax.random.PRNGKey(0), (H, W, 3), make_optimizer(1e-3),
        batch_size=1,
    )
    step = make_train_step(model, MAXD)
    r = np.random.default_rng(0)
    batch_np = {
        "left": r.normal(size=(batch, H, W, 3)).astype(np.float32),
        "right": r.normal(size=(batch, H, W, 3)).astype(np.float32),
        "disparity": r.uniform(1.0, MAXD - 1, size=(batch, H, W)).astype(
            np.float32
        ),
    }
    mesh = make_mesh(data=data, disp=disp, devices=jax.devices()[:n])
    with use_mesh(mesh):
        st = jax.device_put(state, replicate(mesh))
        bt = jax.device_put(batch_np, batch_sharding(mesh))
        compiled = jax.jit(step).lower(st, bt).compile()
    hlo = compiled.as_text()
    row = {"mesh": [data, disp], "collectives": census(hlo)}
    total_mb = sum(v["mb"] for v in row["collectives"].values())
    row["total_collective_mb"] = round(total_mb, 2)
    return row, hlo


def main() -> None:
    out = {"git": subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip(), "config": f"{H}x{W} d{MAXD} feat{FEAT} b/dev {PER_DEVICE_BATCH}",
        "points": []}
    for data, disp in [(8, 1), (4, 2)]:
        row, hlo = lower_mesh(data, disp)
        out["points"].append(row)
        path = f"/tmp/hlo_{data}x{disp}.txt"
        with open(path, "w") as f:
            f.write(hlo)
        print(json.dumps(row), "->", path)
    path = os.path.join(os.path.dirname(__file__), "SHARD_DIAG.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
