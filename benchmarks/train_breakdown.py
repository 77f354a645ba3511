"""Train-step time breakdown on the real chip (round-4 verdict ask #1:
"commit a train-step time breakdown (fwd/bwd/opt) first so the effort lands
where the time is").

Config-2 shape (SceneFlow crop 256x512, batch 4, max-disp 192, bf16,
grouped layout). Measures, each as ITERS distinct dispatches scanned inside
ONE jit (same on-device timing discipline as bench.py / train_bench.py):

- ``fwd``        — train=True forward + loss only (no grad)
- ``fwd_bwd``    — value_and_grad (no optimizer/BN-stat state update)
- ``full``       — the real train step (grad + Adam + BN stat carry)
- each of the above with remat on AND off, plus HBM peak — remat trades
  ~1x extra forward FLOPs for activation memory; at config-2 shapes the
  activations may well fit the v5e's 16 GB, making remat pure overhead.

Writes benchmarks/TRAIN_BREAKDOWN.json (git-stamped).

    timeout 1800 python benchmarks/train_breakdown.py
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

H, W, MAXD, BATCH = 256, 512, 192, 4
WARMUP, ITERS = 2, 4
PEAK_TFLOPS = float(os.environ.get("ECM_TPU_PEAK_TFLOPS", "197"))


def _time(fn, state, batches) -> float:
    """Median per-step seconds over 3 repeats of an ITERS-step scan."""
    for i in range(WARMUP):
        out = fn(state, batches[i])
        np.asarray(jax.tree_util.tree_leaves(out)[-1])  # true barrier (relay)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(state, batches[WARMUP + i])
        np.asarray(jax.tree_util.tree_leaves(out)[-1])
        ts.append((time.perf_counter() - t0) / ITERS)
    return sorted(ts)[1]


def bench_variant(remat: bool, batches: list) -> dict:
    from ecm_tpu.models import build_model
    from ecm_tpu.train.loss import stereo_loss
    from ecm_tpu.train.state import create_train_state, make_optimizer

    model = build_model(
        "stackhourglass",
        max_disp=MAXD,
        dtype=jnp.bfloat16,
        agg_layout="grouped",
        remat=remat,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), (H, W, 3), make_optimizer(1e-3), BATCH
    )

    def loss_of(st, params, batch):
        preds, mutated = st.apply_fn(
            {"params": params, "batch_stats": st.batch_stats},
            batch["left"],
            batch["right"],
            train=True,
            mutable=["batch_stats"],
        )
        return stereo_loss(preds, batch["disparity"], MAXD), mutated

    @jax.jit
    def fwd_many(state, batches):
        def body(acc, batch):
            (loss, _), = (loss_of(state, state.params, batch),)
            return acc + loss, None

        total, _ = jax.lax.scan(body, 0.0, batches)
        return total

    @jax.jit
    def fwd_bwd_many(state, batches):
        def body(acc, batch):
            def lf(params):
                return loss_of(state, params, batch)

            (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
            gsum = sum(
                jnp.sum(g.astype(jnp.float32)) for g in jax.tree_util.tree_leaves(grads)
            )
            return acc + loss + 0.0 * gsum, None

        total, _ = jax.lax.scan(body, 0.0, batches)
        return total

    @jax.jit
    def full_many(state, batches):
        def body(st, batch):
            def lf(params):
                return loss_of(st, params, batch)

            (loss, mutated), grads = jax.value_and_grad(lf, has_aux=True)(st.params)
            st = st.apply_gradients(grads=grads, batch_stats=mutated["batch_stats"])
            return st, loss

        state, losses = jax.lax.scan(body, state, batches)
        return losses

    row = {}
    for name, fn in (("fwd", fwd_many), ("fwd_bwd", fwd_bwd_many), ("full", full_many)):
        dt = _time(fn, state, batches)
        row[f"{name}_ms"] = round(1e3 * dt, 2)
        stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
        if stats and "peak_bytes_in_use" in stats:
            row[f"{name}_hbm_peak_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    row["bwd_minus_fwd_ms"] = round(row["fwd_bwd_ms"] - row["fwd_ms"], 2)
    row["opt_bn_ms"] = round(row["full_ms"] - row["fwd_bwd_ms"], 2)
    row["train_pairs_per_s"] = round(BATCH / (row["full_ms"] / 1e3), 2)

    from ecm_tpu.utils.profiling import flops_stereo_parts

    fwd_flops = BATCH * sum(
        flops_stereo_parts(H, W, MAXD, num_heads=3, regress_mode="fullres").values()
    )
    row["mfu_fwd_only"] = round(
        fwd_flops / (row["fwd_ms"] / 1e3) / (PEAK_TFLOPS * 1e12), 4
    )
    row["mfu_useful_full"] = round(
        3.0 * fwd_flops / (row["full_ms"] / 1e3) / (PEAK_TFLOPS * 1e12), 4
    )
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
                (rng.random(size=(ITERS, BATCH, H, W)) * MAXD * 0.9).astype(np.float32)
            ),
        }
        for _ in range(WARMUP + 3)
    ]
    gband = os.environ.get("ECM_TPU_GBAND_TRAIN", "off")
    out = {
        "git": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
        ).stdout.strip(),
        "config": f"{H}x{W} b{BATCH} d{MAXD} bf16 grouped",
        "gband_train": gband,
        "device": str(jax.devices()[0]),
    }
    for remat in (True, False):
        key = "remat" if remat else "no_remat"
        out[key] = bench_variant(remat, batches)
        print(key, json.dumps(out[key]))
    suffix = "" if gband in ("off", "") else f"_{gband.upper()}"
    path = os.path.join(os.path.dirname(__file__), f"TRAIN_BREAKDOWN{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
