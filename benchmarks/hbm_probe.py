"""Measure ACHIEVABLE HBM bandwidth on this chip with trivial kernels — the
denominator for every "GB/s" claim in ROOFLINE/AGG_LAYERS (round-3 verdict
weak #5: the cost-volume builders sit at ~90 GB/s of a nominal 819 and
nobody knows how much of that gap is the op vs the chip/runtime).

  copy            y = x  (read+write N bytes each)
  write_bcast     y = broadcast scalar (write-only)
  read_reduce     sum(x) (read-only)
  copy_64lane     y = x with a 64-lane (half-tile) minor dim — quantifies the
                  padded-tile write penalty the 2C=64 cost volume pays
  shiftcat_w      pad/shift-by-1..D along W then stack (the cost-volume
                  access pattern, isolated)

Writes benchmarks/HBM_PROBE.json (git-stamped).
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

ITERS = 8
NOMINAL_GBPS = float(os.environ.get("ECM_TPU_HBM_GBPS", "819"))


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
    rng = np.random.default_rng(0)
    results = {}

    def rec(name, t, gb, note=""):
        results[name] = {
            "ms": round(1e3 * t, 3),
            "gbps": round(gb / t, 1),
            "pct_nominal": round(100 * gb / t / NOMINAL_GBPS, 1),
            "note": note,
        }
        print(name, results[name], flush=True)

    # 368 MB bf16, 128-lane minor dim (clean tiles)
    x = jnp.asarray(
        rng.normal(size=(1440, 1024, 128)).astype(np.float32), dtype=jnp.bfloat16
    )
    nbytes = x.size * 2
    rec("copy", timeit(lambda a: a + jnp.bfloat16(1.0), x), 2 * nbytes / 1e9,
        "read+write, 128-lane tiles")
    rec("read_reduce", timeit(lambda a: jnp.sum(a, axis=(1, 2)), x), nbytes / 1e9)

    x64 = jnp.asarray(
        rng.normal(size=(1440, 2048, 64)).astype(np.float32), dtype=jnp.bfloat16
    )
    rec("copy_64lane", timeit(lambda a: a + jnp.bfloat16(1.0), x64),
        2 * x64.size * 2 / 1e9, "64-lane minor dim (half-tile)")

    # the cost-volume access pattern isolated: D shifted copies along W
    B, H, W, C, D = 4, 96, 312, 64, 48
    f = jnp.asarray(
        rng.normal(size=(B, H, W, C)).astype(np.float32), dtype=jnp.bfloat16
    )

    def shiftcat(fr):
        outs = []
        for d in range(D):
            outs.append(jnp.pad(fr, ((0, 0), (0, 0), (d, 0), (0, 0)))[:, :, :W, :])
        return jnp.stack(outs, axis=1)

    out_gb = B * D * H * W * C * 2 / 1e9
    rec("shiftcat_w", timeit(shiftcat, f), out_gb,
        "write-side GB only; the real cost-volume inner pattern")

    results["git"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "HBM_PROBE.json")
    with open(path, "w") as f2:
        json.dump(results, f2, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
