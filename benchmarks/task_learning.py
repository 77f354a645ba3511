"""Held-out-synthetic task-learning curve (round-4 verdict ask #6a: the
overfit gate memorizes 4 fixed batches — this artifact shows the model
LEARNING the task: trained on an unbounded fresh synthetic stream, evaluated
on a fixed held-out synthetic set it never trains on, in the PRODUCTION
layout (grouped aggregation, bf16, max_disp 64 so D/4 % 16 == 0).

Gate: held-out EPE at the last eval < 0.15x the UNTRAINED (step-0) eval —
improving held-out error is evidence of generalizing optimization, which
memorization cannot produce. (A first run with constant lr=1e-3 reached
1.23 px held-out by step 100 and then oscillated around ~3 px — classic
too-hot LR after convergence — so the harness uses the cosine decay any
real schedule would.) Writes benchmarks/TASK_LEARNING.json.

    timeout 1800 python benchmarks/task_learning.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ECM_TPU_COMPILE_CACHE", "/tmp/ecm_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W, MAXD, BATCH = 128, 256, 64, 4
STEPS, EVAL_EVERY = 800, 100
HELDOUT_BATCHES = 4
HELDOUT_SEED0 = 900_000  # far from the training stream's seed space


def main() -> None:
    from ecm_tpu.data.synthetic import make_batch
    from ecm_tpu.models import build_model
    from ecm_tpu.train.state import create_train_state, make_optimizer
    from ecm_tpu.train.steps import make_eval_step, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    model = build_model(
        "stackhourglass",
        max_disp=MAXD,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        agg_layout="grouped" if on_tpu else "standard",
    )
    import optax

    # peak 4e-4: at 1e-3 the model reached ~1.1 px held-out by step 100 and
    # then degraded to ~2.8 (committed in the first TASK_LEARNING runs) —
    # this tiny-crop regime converges in <100 steps, so the production LR
    # is past its stability edge here
    lr = optax.warmup_cosine_decay_schedule(0.0, 4e-4, 50, STEPS, 1e-5)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (H, W, 3), make_optimizer(lr), BATCH
    )
    train_step = make_train_step(model, MAXD)
    eval_step = make_eval_step(model, MAXD)

    heldout = [
        make_batch(HELDOUT_SEED0 + i, BATCH, H, W, max_disp=MAXD * 0.8)
        for i in range(HELDOUT_BATCHES)
    ]

    def eval_epe(state) -> float:
        epes = [float(eval_step(state, b)[1]["epe"]) for b in heldout]
        return sum(epes) / len(epes)

    curve = []
    t0 = time.time()
    for step in range(STEPS + 1):
        if step % EVAL_EVERY == 0:
            epe = eval_epe(state)
            curve.append({"step": step, "heldout_epe": round(epe, 4)})
            print(f"step {step:4d}: held-out EPE {epe:.3f} px "
                  f"({time.time() - t0:.0f}s)")
        if step == STEPS:
            break
        batch = make_batch(step, BATCH, H, W, max_disp=MAXD * 0.8)
        state, m = train_step(state, batch)
    untrained = curve[0]["heldout_epe"]
    first = curve[1]["heldout_epe"]  # post-warmup (step EVAL_EVERY)
    last = curve[-1]["heldout_epe"]
    out = {
        "git": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True,
        ).stdout.strip(),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "config": (
            f"{H}x{W} b{BATCH} d{MAXD} "
            + ("bf16 grouped" if on_tpu else "f32 standard")
            + f", fresh synthetic stream, {HELDOUT_BATCHES} held-out batches"
        ),
        "curve": curve,
        "untrained_epe": untrained,
        "first_eval_epe": first,
        "last_eval_epe": last,
        "gate": "last < 0.15 * untrained",
        "pass": last < 0.15 * untrained,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "TASK_LEARNING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("first_eval_epe", "last_eval_epe",
                                          "pass")}))
    print("->", path)


if __name__ == "__main__":
    main()
