"""Training-equivalence evidence for the grouped (disparity-folded) layout
(round-3 verdict ask #3b): grouped is the default TPU training layout, but
its BN/conv reordering was only CPU-unit-tested at init scale. This runs
REAL training — N synthetic steps in BOTH layouts from IDENTICAL init and
identical data — and commits the loss/EPE trajectories side by side.

Param trees are layout-agnostic by construction (models/grouped_layers.py),
so both runs share one init exactly. Divergence beyond bf16 reduction-order
noise would mean the grouped math drifts under optimization; the artifact
quantifies it.

Writes benchmarks/LAYOUT_EQUIV.json (git-stamped).

    timeout 1500 python benchmarks/layout_equiv.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ECM_TPU_COMPILE_CACHE", "/tmp/ecm_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

STEPS = int(os.environ.get("ECM_TPU_EQUIV_STEPS", "500"))
LOG_EVERY = 25
H, W, MAXD, BATCH = 128, 256, 64, 2


def run_layout(layout: str) -> list[dict]:
    from ecm_tpu.data.synthetic import make_batch
    from ecm_tpu.models import build_model
    from ecm_tpu.train.state import create_train_state, make_optimizer
    from ecm_tpu.train.steps import make_train_step

    model = build_model("stackhourglass", max_disp=MAXD, agg_layout=layout)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (H, W, 3), make_optimizer(1e-3)
    )
    step_fn = make_train_step(model, MAXD)
    rows = []
    for i in range(STEPS):
        batch = make_batch(i, BATCH, H, W, max_disp=MAXD * 0.8)
        state, metrics = step_fn(state, batch)
        if (i + 1) % LOG_EVERY == 0 or i + 1 == STEPS:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            rows.append({"step": i + 1, "loss": m["loss"], "epe": m["epe"]})
            print(layout, rows[-1], flush=True)
    return rows


def main() -> None:
    traj = {layout: run_layout(layout) for layout in ("standard", "grouped")}
    finals = {k: v[-1] for k, v in traj.items()}
    rel_final_loss_gap = abs(
        finals["standard"]["loss"] - finals["grouped"]["loss"]
    ) / max(abs(finals["standard"]["loss"]), 1e-9)
    epe_gap = abs(finals["standard"]["epe"] - finals["grouped"]["epe"])
    out = {
        "git": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
        ).stdout.strip(),
        "backend": jax.default_backend(),
        "config": f"synthetic {H}x{W} d{MAXD} b{BATCH}, {STEPS} steps, shared init",
        "trajectories": traj,
        "final_rel_loss_gap": round(rel_final_loss_gap, 4),
        "final_epe_gap_px": round(epe_gap, 3),
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "LAYOUT_EQUIV.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"final loss std={finals['standard']['loss']:.4f} "
        f"grp={finals['grouped']['loss']:.4f} rel gap {rel_final_loss_gap:.4f}; "
        f"EPE gap {epe_gap:.3f} px"
    )
    print("wrote", path)


if __name__ == "__main__":
    main()
