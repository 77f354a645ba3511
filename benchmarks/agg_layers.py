"""Per-layer breakdown of the grouped aggregation stack at the production
shape (384x1248 d192 b4 bf16 eval) — the round-3 verdict ask #2 analysis
artifact: where do the ~6x from aggregation speed-of-light go?

Times every conv/deconv instance of `ECMAggregation(layout="grouped")`
standalone (op-level, exact shapes, current default impl policy), plus the
elementwise glue classes (BN-eval affine+ReLU, context add, residual add) at
the full-res volume shape, then the full module — the difference between the
module and the sum of parts is scheduling/fusion slack.

Writes benchmarks/AGG_LAYERS.json (git-stamped). Run on the real chip:

    timeout 1500 python benchmarks/agg_layers.py
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

from ecm_tpu.ops.grouped3d import (
    conv_transpose3d_phased_grouped,
    grouped_conv3d,
    grouped_conv3d_down,
)

B = 4
D4, H4, W4 = 48, 96, 312
C = 32
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


def arr(*shape):
    return jnp.asarray(RNG.normal(size=shape).astype(np.float32), dtype=jnp.bfloat16)


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    rows: list[dict] = []

    def add(name, count, t_call_s, useful_gflop_per_call, note=""):
        ms_pair_total = 1e3 * t_call_s / B * count
        rows.append(
            {
                "layer": name,
                "count": count,
                "ms_per_pair_each": round(1e3 * t_call_s / B, 3),
                "ms_per_pair_total": round(ms_pair_total, 3),
                "useful_tflops": round(useful_gflop_per_call / t_call_s / 1e3, 1)
                if useful_gflop_per_call
                else 0.0,
                "note": note,
            }
        )
        print(rows[-1], flush=True)
        return ms_pair_total

    def conv_gflop(cin, cout, d_out, h, w):
        return 2 * 27 * cin * cout * B * d_out * h * w / 1e9

    total = 0.0

    # ---- full-res stride-1 convs (g=4), the dominant block ----
    xg = arr(B, D4 // 4, H4, W4, 4 * 2 * C)  # dres0_1 input: concat volume
    k = arr(3, 3, 3, 2 * C, C)
    total += add(
        "dres0_1 64->32 g4 s1", 1,
        timeit(lambda x, kk: grouped_conv3d(x, kk, 1), xg, k),
        conv_gflop(2 * C, C, D4, H4, W4),
    )
    xg = arr(B, D4 // 4, H4, W4, 4 * C)
    k = arr(3, 3, 3, C, C)
    total += add(
        "fullres 32->32 g4 s1 (dres0_2,dres1_1,dres1_2,classif3_1)", 4,
        timeit(lambda x, kk: grouped_conv3d(x, kk, 1), xg, k),
        conv_gflop(C, C, D4, H4, W4),
    )
    k1 = arr(3, 3, 3, C, 1)
    total += add(
        "classif3_2 32->1 g4 s1", 1,
        timeit(lambda x, kk: grouped_conv3d(x, kk, 1), xg, k1),
        conv_gflop(C, 1, D4, H4, W4),
    )

    # ---- hourglass encoder ----
    k = arr(3, 3, 3, C, 2 * C)
    total += add(
        "hg_conv1 32->64 g4->g2 s2", 3,
        timeit(lambda x, kk: grouped_conv3d_down(x, kk, 4), xg, k),
        conv_gflop(C, 2 * C, D4 // 2, H4 // 2, W4 // 2),
    )
    x8 = arr(B, D4 // 4, H4 // 2, W4 // 2, 2 * 2 * C)  # g2 at /8
    k = arr(3, 3, 3, 2 * C, 2 * C)
    total += add(
        "hg_conv2 64->64 g2 s1 /8", 3,
        timeit(lambda x, kk: grouped_conv3d(x, kk, 1, g=2), x8, k),
        conv_gflop(2 * C, 2 * C, D4 // 2, H4 // 2, W4 // 2),
    )
    total += add(
        "hg_conv3 64->64 g2 s2 /8->/16", 3,
        timeit(lambda x, kk: grouped_conv3d(x, kk, 2, g=2), x8, k),
        conv_gflop(2 * C, 2 * C, D4 // 4, H4 // 4, W4 // 4),
    )
    x16 = arr(B, D4 // 8, H4 // 4, W4 // 4, 2 * 2 * C)  # g2 at /16
    total += add(
        "hg_conv4 64->64 g2 s1 /16", 3,
        timeit(lambda x, kk: grouped_conv3d(x, kk, 1, g=2), x16, k),
        conv_gflop(2 * C, 2 * C, D4 // 4, H4 // 4, W4 // 4),
    )

    # ---- hourglass decoder (phased deconvs; inputs are UNGROUPED) ----
    xu16 = arr(B, D4 // 4, H4 // 4, W4 // 4, 2 * C)
    total += add(
        "hg_conv5 deconv 64->64 /16->/8", 3,
        timeit(lambda x, kk: conv_transpose3d_phased_grouped(x, kk, 2), xu16, k),
        conv_gflop(2 * C, 2 * C, D4 // 2, H4 // 2, W4 // 2) * 8 / 27,
        note="8 of 27 taps per output (k3 s2 deconv)",
    )
    xu8 = arr(B, D4 // 2, H4 // 2, W4 // 2, 2 * C)
    k = arr(3, 3, 3, 2 * C, C)
    total += add(
        "hg_conv6 deconv 64->32 /8->full g4-out", 3,
        timeit(lambda x, kk: conv_transpose3d_phased_grouped(x, kk, 4), xu8, k),
        conv_gflop(2 * C, C, D4, H4, W4) * 8 / 27,
        note="8 of 27 taps per output",
    )

    # ---- elementwise glue at the full-res volume shape ----
    vg = arr(B, D4 // 4, H4, W4, 4 * C)
    scale = arr(4 * C)
    bias = arr(4 * C)
    total += add(
        "bn_eval_affine+relu fullres", 5,
        timeit(lambda x, s, b: jax.nn.relu(x * s + b), vg, scale, bias),
        0.0,
        note="standalone; XLA normally fuses these into conv epilogues",
    )
    ctx = arr(B, 1, H4, W4, 4 * C)
    total += add(
        "context broadcast-add fullres", 4,
        timeit(lambda x, c: x + c, vg, ctx),
        0.0,
    )
    vg2 = arr(B, D4 // 4, H4, W4, 4 * C)
    total += add(
        "residual add fullres", 4,
        timeit(lambda x, y: x + y, vg, vg2),
        0.0,
    )

    # ---- full module (in-situ) ----
    from ecm_tpu.models.aggregation import ECMAggregation
    from ecm_tpu.ops.grouped3d import to_grouped

    agg = ECMAggregation(channels=C, layout="grouped", remat=False, dtype=jnp.bfloat16)
    vol = arr(B, D4, H4, W4, 2 * C)
    f2d = arr(B, H4, W4, C)
    avars = agg.init({"params": jax.random.PRNGKey(0)}, to_grouped(vol), f2d, True)
    avars = {"params": avars["params"], "batch_stats": avars.get("batch_stats", {})}
    t_full = timeit(
        lambda v, f: agg.apply(avars, v, f, train=False)[-1], to_grouped(vol), f2d
    )
    full_ms = 1e3 * t_full / B

    out = {
        "git": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
        ).stdout.strip(),
        "config": "384x1248 d192 b4 bf16 eval, grouped layout, default impl policy",
        "device": str(jax.devices()[0]),
        "layers": rows,
        "sum_of_parts_ms_per_pair": round(total, 2),
        "full_module_ms_per_pair": round(full_ms, 2),
        "unexplained_ms_per_pair": round(full_ms - total, 2),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "AGG_LAYERS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"sum of parts {total:.2f} ms/pair; full module {full_ms:.2f} ms/pair")
    print("wrote", path)


if __name__ == "__main__":
    main()
