"""Headline benchmark: stereo pairs/s/chip, eval forward of the flagship ECM
stacked-hourglass model at the reference inference config (BASELINE.json
config 1: 384x1248, max-disp 192 — the KITTI submission path, SURVEY.md 3.3).

Prints ONE JSON line. Driver contract fields: {"metric", "value", "unit",
"vs_baseline"}; self-reporting extras (round-2 verdict ask #2):

- ``ms_per_pair``  — serving latency at the batch-4 throughput point
- ``mfu``          — achieved useful-FLOPs / peak (peak from
  ``ECM_TPU_PEAK_TFLOPS``, default 197 bf16-TF/s for the v5e; "useful" =
  canonical model FLOPs, so layout tricks that inflate dense FLOPs — e.g.
  the grouped aggregation layout — don't flatter this number)
- ``batch1_ms``    — single-pair latency (BASELINE config 1 is a one-pair
  inference config; serving batch amortization doesn't apply there)

``vs_baseline`` compares against 2.4 pairs/s — the canonical PSMNet-class
reference throughput for this config (~0.41 s/pair on the 1080Ti-era GPUs the
reference repo family reports; the reference's own published runtime was not
recoverable — BASELINE.json "published": {}, SURVEY.md section 6).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (same policy as ecm_tpu.cli.common): full-model
# compiles take minutes through the relay; re-runs start in seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ECM_TPU_COMPILE_CACHE", "/tmp/ecm_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_PAIRS_PER_S = 2.4
PEAK_TFLOPS = float(os.environ.get("ECM_TPU_PEAK_TFLOPS", "197"))
H, W, MAXD = 384, 1248, 192
# serving batch: amortizes per-launch overhead, fills the MXU. Overridable
# for batch-sweep probes; the committed default is the measured-best point
# (batch 8: 22.06 pairs/s vs batch 4's 19.87 on the v5e, same tree —
# single-pair latency is reported separately as batch1_ms).
BATCH = int(os.environ.get("ECM_TPU_BENCH_BATCH", "8"))
WARMUP, ITERS = 2, 4


REPEATS = 5  # timed repeats; report median + min/max spread (round-3 verdict:
# single-shot timing on this relay-attached chip shows ±5% run-to-run noise,
# indistinguishable from real regressions without spread fields)


def _timed_forward(model, variables, lefts, right) -> list[float]:
    """Per-scan-step seconds (one batch forward), REPEATS measurements.
    On-device timing: ITERS distinct forwards inside ONE jitted call fetched
    as a single scalar — immune to per-dispatch RPC overhead and
    runtime-level dedup of identical dispatches (both observed on this
    machine's relay-attached TPU)."""

    @jax.jit
    def forward_many(variables, lefts, right):
        def body(acc, left):
            disp = model.apply(variables, left, right, train=False)[-1]
            return acc + disp.sum(), None

        total, _ = jax.lax.scan(body, 0.0, lefts)
        return total

    for _ in range(WARMUP):
        float(forward_many(variables, lefts, right))
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(forward_many(variables, lefts, right))
        times.append((time.perf_counter() - t0) / lefts.shape[0])
    return times


def main() -> None:
    from ecm_tpu.models import build_model
    from ecm_tpu.utils.profiling import flops_stereo_parts

    model = build_model(
        "stackhourglass",
        max_disp=MAXD,
        dtype=jnp.bfloat16,
        regress_mode="fused",  # Pallas-fused upsample+soft-argmin (exact match)
    )
    rng = np.random.default_rng(0)
    lefts = jnp.asarray(
        rng.normal(size=(ITERS, BATCH, H, W, 3)).astype(np.float32)
    )
    right = jnp.asarray(rng.normal(size=(BATCH, H, W, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, lefts[0], right, train=True
    )
    variables = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }

    ts = sorted(_timed_forward(model, variables, lefts, right))
    t_batch = ts[len(ts) // 2]  # median
    pairs_per_s = BATCH / t_batch
    ms_per_pair = 1e3 * t_batch / BATCH

    # single-pair latency (config 1 proper)
    t1s = sorted(_timed_forward(model, variables, lefts[:, :1], right[:1]))
    batch1_ms = 1e3 * t1s[len(t1s) // 2]

    flops_pair = sum(
        flops_stereo_parts(H, W, MAXD, num_heads=1, regress_mode="fused").values()
    )
    mfu = flops_pair * pairs_per_s / (PEAK_TFLOPS * 1e12)

    print(
        json.dumps(
            {
                "metric": "stereo_pairs_per_s_per_chip_384x1248_d192",
                "value": round(pairs_per_s, 4),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 4),
                "ms_per_pair": round(ms_per_pair, 2),
                "ms_per_pair_min": round(1e3 * ts[0] / BATCH, 2),
                "ms_per_pair_max": round(1e3 * ts[-1] / BATCH, 2),
                "repeats": REPEATS,
                "batch1_ms": round(batch1_ms, 2),
                "mfu": round(mfu, 4),
                "baseline_note": (
                    "estimated: 2.4 pairs/s is a PSMNet-class 1080Ti-era "
                    "figure; the reference's own runtime was unrecoverable "
                    "(BASELINE.json has an empty 'published' record)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
