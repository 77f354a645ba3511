"""Cost-volume bandwidth-gap probe (round-4 verdict weak #7): ROOFLINE.json
showed the jnp grouped builder at ~96 GB/s of output traffic at bf16, while
the on-chip gate's f32 run of the same op hits ~238 GB/s — i.e. the bf16
build is ~2.4x slower per BYTE than f32, the opposite of what a pure
bandwidth bound predicts. This probe times the grouped builder (jnp and
Pallas) at both dtypes at the production shape and writes the decisive
numbers to benchmarks/CV_DTYPE_PROBE.json.

    timeout 900 python benchmarks/cv_dtype_probe.py
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

B, H, W, C, D = 1, 96, 312, 32, 48
ITERS = 20


def timeit(fn, *args):
    @jax.jit
    def many(*a):
        def body(acc, _):
            return acc + fn(*a).astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(body, 0.0, jnp.arange(ITERS))
        return tot
    float(many(*args))
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    assert jax.default_backend() == "tpu"
    from ecm_tpu.ops.cost_volume import cost_volume_grouped_jnp
    from ecm_tpu.ops.pallas_cost_volume import cost_volume_concat_grouped_pallas

    rng = np.random.default_rng(0)
    out = {
        "git": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True,
        ).stdout.strip(),
        "shape": f"B{B} {H}x{W} C{C} D{D}",
    }
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        fl = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(dtype)
        fr = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)).astype(dtype)
        nbytes = D // 4 * H * W * 8 * C * dtype.dtype.itemsize * B
        for impl, fn in (
            ("jnp", lambda a, b: cost_volume_grouped_jnp(a, b, D, "concat")),
            ("pallas", lambda a, b: cost_volume_concat_grouped_pallas(a, b, D)),
        ):
            t = timeit(fn, fl, fr)
            out[f"{impl}_{name}"] = {
                "ms": round(t * 1e3, 3),
                "write_gbps": round(nbytes / t / 1e9, 1),
            }
            print(f"{impl}/{name}: {t * 1e3:.3f} ms, {nbytes / t / 1e9:.0f} GB/s")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "CV_DTYPE_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
