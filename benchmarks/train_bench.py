"""Config-2 training-step throughput on the real chip (round-2 verdict ask
#6): SceneFlow training shape — batch 4, 256x512 crop, max-disp 192, bf16
activations, remat off (the measured config-2 preset setting,
TRAIN_BREAKDOWN_ON.json) — full train step (3-head masked smooth-L1 loss,
backward, Adam update, BN stat update).

Writes benchmarks/TRAIN_BENCH.json (git-stamped): per-layout step time,
train pairs/s/chip, useful-FLOPs MFU (fwd + ~2x bwd), and HBM high-water
where the runtime reports it.

Timing: ITERS distinct batches scanned inside ONE jit (state carried
through), so per-dispatch RPC overhead and dispatch dedup don't pollute the
numbers (see bench.py).
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

H, W, MAXD, BATCH = 256, 512, 192, 4
WARMUP, ITERS = 2, 4
PEAK_TFLOPS = float(os.environ.get("ECM_TPU_PEAK_TFLOPS", "197"))


def bench_layout(layout: str, batches: list) -> dict:
    from ecm_tpu.models import build_model
    from ecm_tpu.train.loss import stereo_loss
    from ecm_tpu.train.state import create_train_state, make_optimizer

    model = build_model(
        "stackhourglass",
        max_disp=MAXD,
        dtype=jnp.bfloat16,
        agg_layout=layout,
        # config-2 preset setting: remat off by measurement at this shape
        # (TRAIN_BREAKDOWN_ON.json; activations fit the v5e at batch 4)
        remat=False,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), (H, W, 3), make_optimizer(1e-3), BATCH
    )

    @jax.jit
    def steps_many(state, batches):
        def body(st, batch):
            def loss_fn(params):
                preds, mutated = st.apply_fn(
                    {"params": params, "batch_stats": st.batch_stats},
                    batch["left"],
                    batch["right"],
                    train=True,
                    mutable=["batch_stats"],
                )
                return stereo_loss(preds, batch["disparity"], MAXD), mutated
            (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                st.params
            )
            st = st.apply_gradients(
                grads=grads, batch_stats=mutated["batch_stats"]
            )
            return st, loss

        state, losses = jax.lax.scan(body, state, batches)
        return state, losses

    # every dispatch gets a DISTINCT host-generated batch set (belt &
    # braces against the relay runtime's dispatch dedup, see bench.py)
    # NOTE: jax.block_until_ready returns early on this relay-attached TPU
    # (async futures) — fetching the value to host is the only reliable
    # completion barrier (measured: block_until_ready "times" a 510 ms step
    # at 1.4 ms; np.asarray times it truthfully)
    for i in range(WARMUP):
        st, losses = steps_many(state, batches[i])
        np.asarray(losses)
    timed = batches[WARMUP]
    t0 = time.perf_counter()
    st, losses = steps_many(state, timed)
    final_loss = float(np.asarray(losses)[-1])
    dt = (time.perf_counter() - t0) / ITERS

    from ecm_tpu.utils.profiling import flops_stereo_parts

    fwd_flops = sum(
        flops_stereo_parts(H, W, MAXD, num_heads=3, regress_mode="fullres").values()
    )
    train_flops = 3.0 * fwd_flops  # fwd + ~2x bwd (remat recompute excluded)
    row = {
        "step_ms": round(1e3 * dt, 2),
        "train_pairs_per_s": round(BATCH / dt, 3),
        "mfu_useful": round(train_flops * BATCH / dt / (PEAK_TFLOPS * 1e12), 4),
        "final_loss": round(final_loss, 4),
    }
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    if stats and "peak_bytes_in_use" in stats:
        row["hbm_peak_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    return row


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    batches = [
        {
            "left": jnp.asarray(
                rng.normal(size=(ITERS, BATCH, H, W, 3)).astype(np.float32)
            ),
            "right": jnp.asarray(
                rng.normal(size=(ITERS, BATCH, H, W, 3)).astype(np.float32)
            ),
            "disparity": jnp.asarray(
                (rng.random(size=(ITERS, BATCH, H, W)) * MAXD * 0.9).astype(
                    np.float32
                )
            ),
        }
        for _ in range(WARMUP + 1)
    ]
    results = {
        "config": f"sceneflow-train {H}x{W} d{MAXD} b{BATCH} bf16+remat",
        "device": str(jax.devices()[0]),
    }
    for layout in ("grouped", "standard"):
        results[layout] = bench_layout(layout, batches)
        print(layout, results[layout], flush=True)
    results["git"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "TRAIN_BENCH.json"
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
