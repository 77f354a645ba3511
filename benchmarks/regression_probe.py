"""Settle the fused-regression kernel's fate by measurement (round-3 verdict
ask #7: "regression_fused is 45x from speed-of-light").

The 45x came from a MEMORY-ONLY speed-of-light model. This probe shows the
kernel is actually bound by transcendental VPU work, not HBM: exact parity
with the reference semantics (trilinear-upsample the cost volume, then
soft-argmin) requires one exp per FULL-RES volume element — 92M exps/pair at
384x1248 d192 — because the spatial interpolation mixes neighboring cost
columns BEFORE the softmax. No layout change can remove those exps.

Measured here:
  exp_floor        raw jnp.exp + mul-add chain at the full-res element count
                   (the kernel's analytic floor on this chip's VPU)
  fused            the Pallas kernel (serving default)
  fullres_xla      canonical upsample+softargmin XLA chain (same exp count +
                   10x HBM traffic)
  lowres_approx    soft-argmin at low-res D-upsampled columns + bilinear
                   upsample of the DISPARITY map — 16x fewer exps, NOT
                   parity-exact; its px error vs exact is reported so the
                   opt-in serving mode is a documented trade

Writes benchmarks/REGRESSION_PROBE.json (git-stamped).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("ECM_TPU_COMPILE_CACHE", "/tmp/ecm_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, H, W, MAXD = 4, 384, 1248, 192
H4, W4, D4 = H // 4, W // 4, MAXD // 4
ITERS = 8


def timeit(fn, *args, iters: int = ITERS) -> float:
    scales = jnp.linspace(0.999, 1.001, iters)

    @jax.jit
    def many(*a):
        def body(acc, s):
            out = fn(*(x * s.astype(x.dtype) for x in a))
            return acc + out.astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), scales)
        return tot

    float(many(*args))
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    from ecm_tpu.ops.pallas_regression import fused_upsample_softargmin
    from ecm_tpu.ops.softargmin import disparity_regression
    from ecm_tpu.ops.upsample import upsample_bilinear, upsample_trilinear

    rng = np.random.default_rng(0)
    # structured volume (smooth argmin surface) — random volumes make the
    # softmax a hard argmax and overstate approx error
    base = rng.normal(size=(B, D4, H4, W4)).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base, sigma=(0, 2, 4, 4)).astype(np.float32) * 8.0
    cost4 = jnp.asarray(base)

    results: dict = {}

    # --- analytic exp floor: same element count as the exact computation ---
    full_elems_shape = (B, MAXD, H, W)
    xfull = jnp.asarray(rng.normal(size=full_elems_shape).astype(np.float32))

    def exp_chain(x):
        p = jnp.exp(x)
        return jnp.sum(p, axis=1) + jnp.sum(p * 1.5, axis=1)

    t = timeit(exp_chain, xfull)
    results["exp_floor"] = {
        "ms_per_pair": round(1e3 * t / B, 3),
        "note": "exp + 2 reductions at full-res element count (92.1M/pair)",
    }
    print("exp_floor", results["exp_floor"], flush=True)

    # --- fused Pallas kernel (exact) ---
    t_fused = timeit(lambda c: fused_upsample_softargmin(c, MAXD), cost4)
    results["fused"] = {"ms_per_pair": round(1e3 * t_fused / B, 3)}
    print("fused", results["fused"], flush=True)

    # --- canonical fullres XLA chain (exact) ---
    def fullres(c):
        return disparity_regression(upsample_trilinear(c, (MAXD, H, W)), MAXD)

    t_full = timeit(fullres, cost4)
    results["fullres_xla"] = {"ms_per_pair": round(1e3 * t_full / B, 3)}
    print("fullres_xla", results["fullres_xla"], flush=True)

    # --- low-res approx: softargmin at H/4,W/4 (D upsampled), then bilinear ---
    def lowres_approx(c):
        cd = upsample_trilinear(c, (MAXD, H4, W4))  # D-phase interp only
        d_low = disparity_regression(cd, MAXD)  # [B, H4, W4]
        return upsample_bilinear(d_low, (H, W))

    exact = jax.jit(fullres)(cost4)

    def rec_approx(name, fn, note):
        t_approx = timeit(fn, cost4)
        err = jnp.abs(exact - jax.jit(fn)(cost4))
        results[name] = {
            "ms_per_pair": round(1e3 * t_approx / B, 3),
            "mean_abs_px_vs_exact": round(float(err.mean()), 4),
            "p99_abs_px_vs_exact": round(float(jnp.percentile(err, 99.0)), 4),
            "max_abs_px_vs_exact": round(float(err.max()), 4),
            "note": note,
        }
        print(name, results[name], flush=True)

    rec_approx("lowres_approx", lowres_approx, "NOT parity-exact; smooth volume")

    # the model's SHIPPED fast path (regress_mode="lowres"): softargmin at
    # quarter res over D/4 hypotheses, x4 scale, bilinear disparity upsample
    from ecm_tpu.ops.softargmin import softargmin_jnp

    def lowres_x4(c):
        d4_map = softargmin_jnp(c) * 4.0
        return upsample_bilinear(d4_map[..., None], (H, W))[..., 0]

    rec_approx(
        "lowres_x4_shipped", lowres_x4,
        "model regress_mode='lowres'; NOT parity-exact; smooth volume",
    )

    results["decision"] = (
        "fused stays the serving default: it is exact and sits near the "
        "measured exp floor (memory-only SoL is unreachable for this op); "
        "the shipped regress_mode='lowres' is the opt-in fast path with the "
        "px-error trade above"
    )
    results["git"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "REGRESSION_PROBE.json"
    )
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
