"""Measure the slot-halo grouped-conv forms against the banded forms on the
real chip (ecm_tpu/ops/grouped3d.py: grouped_conv3d_halo vs grouped_conv3d's
banded path).

The banded grouped kernel is 1/g dense — at g=4 the MXU does 4x the
canonical FLOPs. The halo form concatenates one neighbour plane slot on each
side of the grouped channel dim ((g+2)*C input lanes) so each output slot's
3-plane window is contiguous in channels and the group dim needs no conv
window: kernel density rises to 3/(g+2) (2x inflation at g=4, 4/3 at g=2)
at identical output-lane fill. Pure saved work if XLA runs the fatter-input
2D conv at similar MXU efficiency — measured here, not assumed.

Shapes probed = the model's hot convs at the 384x1248 d192 b4 config:
  dres_c   32->32 g4 full-res (x5 instances/eval fwd: dres0_2, dres1_1/2,
           classif3_1; the dominant cost)
  dres0_1  64->32 g4 full-res
  hg_conv2 64->64 g2 at /8 (x6 instances over 3 hourglasses w/ conv4)
  hg_down  32->64 g4->g2 stride-2 (x3)

Writes benchmarks/HALO_PROBE.json (git-stamped).
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

from ecm_tpu.ops.grouped3d import (
    grouped_conv3d_down_halo,
    grouped_conv3d_halo,
    grouped_kernel,
    grouped_kernel_down,
)
from ecm_tpu.ops.conv3d import accum_dtype

B = 4
D4, H4, W4 = 48, 96, 312
ITERS = 8
PEAK_TFLOPS = float(os.environ.get("ECM_TPU_PEAK_TFLOPS", "197"))
RNG = np.random.default_rng(0)


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


def banded_s1(xg, k, g):
    kg = grouped_kernel(k, g, 1)
    return jax.lax.conv_general_dilated(
        xg, kg, (1, 1, 1), ((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype(xg),
    ).astype(xg.dtype)


def banded_down(xg, k, g_in):
    kg = grouped_kernel_down(k, g_in, g_in // 2)
    return jax.lax.conv_general_dilated(
        xg, kg, (1, 2, 2), ((1, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype(xg),
    ).astype(xg.dtype)


def arr(*shape):
    return jnp.asarray(RNG.normal(size=shape).astype(np.float32), dtype=jnp.bfloat16)


def probe_s1(name, results, dg, h, w, cin, cout, g):
    xg = arr(B, dg, h, w, g * cin)
    k = arr(3, 3, 3, cin, cout)
    t_band = timeit(lambda x, kk: banded_s1(x, kk, g), xg, k) * 1e3
    t_halo = timeit(lambda x, kk: grouped_conv3d_halo(x, kk, g), xg, k) * 1e3
    useful_gflop = 2 * 27 * cin * cout * B * dg * g * h * w / 1e9
    results[name] = {
        "banded_ms": round(t_band, 3),
        "halo_ms": round(t_halo, 3),
        "speedup": round(t_band / t_halo, 3),
        "useful_tflops_halo": round(useful_gflop / t_halo, 1),
        "useful_tflops_banded": round(useful_gflop / t_band, 1),
    }
    print(name, results[name], flush=True)


def main():
    results = {}
    probe_s1("dres_c 32->32 g4", results, D4 // 4, H4, W4, 32, 32, 4)
    probe_s1("dres0_1 64->32 g4", results, D4 // 4, H4, W4, 64, 32, 4)
    probe_s1("hg_conv2 64->64 g2 /8", results, D4 // 4, H4 // 2, W4 // 2, 64, 64, 2)

    # hg down conv: g4 -> g2 stride 2 (full-res input)
    xg = arr(B, D4 // 4, H4, W4, 4 * 32)
    k = arr(3, 3, 3, 32, 64)
    t_band = timeit(lambda x, kk: banded_down(x, kk, 4), xg, k) * 1e3
    t_halo = timeit(lambda x, kk: grouped_conv3d_down_halo(x, kk, 4), xg, k) * 1e3
    useful_gflop = 2 * 27 * 32 * 64 * B * (D4 // 2) * (H4 // 2) * (W4 // 2) / 1e9
    results["hg_down 32->64 g4->g2 s2"] = {
        "banded_ms": round(t_band, 3),
        "halo_ms": round(t_halo, 3),
        "speedup": round(t_band / t_halo, 3),
        "useful_tflops_halo": round(useful_gflop / t_halo, 1),
        "useful_tflops_banded": round(useful_gflop / t_band, 1),
    }
    print("hg_down", results["hg_down 32->64 g4->g2 s2"], flush=True)

    results["git"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "HALO_PROBE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
