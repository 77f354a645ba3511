"""Per-conv microbenchmark of every 3D-conv shape in the aggregation stack
(the breakdown showed aggregation at ~8% MXU, 12x from SOL — this pinpoints
which conv/lowering is slow).

Each row: one conv shape x lowering (xla / decomposed / packed / deconv),
on-device scan timing, achieved TF/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 4
D4, H4, W4 = 48, 96, 312  # 384x1248 d192 at 1/4 res
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
    from ecm_tpu.ops.conv3d import conv3d_decomposed, conv3d_packed, conv3d_xla

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # (label, in_shape[D,H,W,Cin], Cout, stride)
    conv_cases = [
        ("dres0_c1 64->32", (D4, H4, W4, 64), 32, 1),
        ("dres_c 32->32", (D4, H4, W4, 32), 32, 1),
        ("hg_conv1 32->64 s2", (D4, H4, W4, 32), 64, 2),
        ("hg_conv2 64->64 /8", (D4 // 2, H4 // 2, W4 // 2, 64), 64, 1),
        ("hg_conv3 64->64 s2 /8", (D4 // 2, H4 // 2, W4 // 2, 64), 64, 2),
        ("hg_conv4 64->64 /64", (D4 // 4, H4 // 4, W4 // 4, 64), 64, 1),
        ("classif 32->32", (D4, H4, W4, 32), 32, 1),
    ]
    results = {}
    for label, (d, h, w, cin), cout, s in conv_cases:
        x = jnp.asarray(rng.normal(size=(B, d, h, w, cin)).astype(np.float32)).astype(dt)
        k = jnp.asarray(
            rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.05
        ).astype(dt)
        do, ho, wo = ((d + 1) // s if s == 2 else d), (h + s - 1) // s, (w + s - 1) // s
        do = (d + 2 - 3) // s + 1
        ho = (h + 2 - 3) // s + 1
        wo = (w + 2 - 3) // s + 1
        flops = 2 * 27 * cin * cout * B * do * ho * wo
        row = {}
        for name, fn in (
            ("xla", lambda a, b: conv3d_xla(a, b, (s, s, s), ((1, 1),) * 3)),
            ("decomposed", lambda a, b: conv3d_decomposed(a, b, (s, s, s))),
            ("packed", lambda a, b: conv3d_packed(a, b, (s, s, s))),
        ):
            t = timeit(fn, x, k)
            row[name] = {"ms": round(1e3 * t, 3), "tflops": round(flops / t / 1e12, 1)}
        results[label] = row
        print(
            f"{label:<24}"
            + "  ".join(
                f"{n}: {v['ms']:7.3f} ms {v['tflops']:6.1f} TF/s" for n, v in row.items()
            )
        )

    # transposed convs (hourglass deconv5/deconv6)
    from flax import linen as nn

    deconv_cases = [
        ("deconv5 64->64 /64->/8", (D4 // 4, H4 // 4, W4 // 4, 64), 64),
        ("deconv6 64->32 /8->full", (D4 // 2, H4 // 2, W4 // 2, 64), 32),
    ]
    for label, (d, h, w, cin), cout in deconv_cases:
        x = jnp.asarray(rng.normal(size=(B, d, h, w, cin)).astype(np.float32)).astype(dt)
        k = jnp.asarray(
            rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.05
        ).astype(dt)

        def deconv(a, kk):
            return jax.lax.conv_transpose(
                a,
                kk,
                strides=(2, 2, 2),
                padding=[(1, 2)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            ).astype(a.dtype)

        from ecm_tpu.ops.conv3d import conv_transpose3d_phased

        # useful MACs: each output voxel sums ~(27/8) taps on average
        flops = 2 * 27 / 8 * cin * cout * B * (2 * d) * (2 * h) * (2 * w)
        row = {}
        for name, fn in (("xla_ct", deconv), ("phased", conv_transpose3d_phased)):
            t = timeit(fn, x, k)
            row[name] = {"ms": round(1e3 * t, 3),
                         "tflops_useful": round(flops / t / 1e12, 1)}
        results[label] = row
        print(
            f"{label:<24}"
            + "  ".join(
                f"{n}: {v['ms']:7.3f} ms {v['tflops_useful']:6.1f} TF/s(useful)"
                for n, v in row.items()
            )
        )

    import subprocess

    try:
        results["git"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__),
        ).stdout.strip()
    except Exception:
        results["git"] = "unknown"
    out = os.path.join(os.path.dirname(__file__), "AGG_MICROBENCH.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
