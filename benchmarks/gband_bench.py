"""Production-shape perf for the Pallas gband kernel vs the XLA banded
chain (conv + BN-eval affine + ReLU) — the artifact that gates the
``ECM_TPU_GBAND`` default (models/grouped_layers.py policy note).

Shapes = every GConvBN stride-1 instance of the flagship model at the
headline config (384x1248 d192 b4 bf16 eval):

  dres0_1    64->32 g4 full-res
  dres_c     32->32 g4 full-res (x4 instances)
  classif2   32->1  g4 full-res (bias epilogue, no BN)
  hg_conv2   64->64 g2 /8       (x3)
  hg_conv4   64->64 g2 /16      (x3)

Writes benchmarks/GBAND_BENCH.json (git-stamped).
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

from ecm_tpu.ops.pallas_gband import gband_conv_bn_s1, gband_reference

B = 4
D4, H4, W4 = 48, 96, 312
ITERS = 8
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


def probe(name, results, count, dg, h, w, cin, cout, g, relu=True):
    xg = arr(B, dg, h, w, g * cin)
    k = arr(3, 3, 3, cin, cout) * 0.1
    scale = jnp.abs(jnp.asarray(RNG.normal(size=cout), jnp.float32)) + 0.5
    bias = jnp.asarray(RNG.normal(size=cout), jnp.float32)

    ref = jax.jit(
        lambda x, kk: gband_reference(x, kk, scale, bias, g=g, relu=relu)
    )(xg, k)
    t_xla = timeit(
        lambda x, kk: gband_reference(x, kk, scale, bias, g=g, relu=relu), xg, k
    )
    useful_tf = 2 * 27 * cin * cout * B * dg * g * h * w / 1e12
    row = {"count": count, "xla_ms": round(1e3 * t_xla, 3)}
    for impl in ("refs", "roll"):
        out = jax.jit(
            lambda x, kk, _i=impl: gband_conv_bn_s1(
                x, kk, scale, bias, g=g, relu=relu, impl=_i
            )
        )(xg, k)
        err = float(
            jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        sc = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        rel = err / max(sc, 1e-9)
        assert rel < 0.02, (name, impl, rel)
        t_pal = timeit(
            lambda x, kk, _i=impl: gband_conv_bn_s1(
                x, kk, scale, bias, g=g, relu=relu, impl=_i
            ),
            xg,
            k,
        )
        row[f"{impl}_ms"] = round(1e3 * t_pal, 3)
        row[f"{impl}_speedup"] = round(t_xla / t_pal, 3)
        row[f"{impl}_useful_tflops"] = round(useful_tf / t_pal, 1)
        row[f"{impl}_rel_err"] = round(rel, 5)
    best = min(row["refs_ms"], row["roll_ms"])
    row["saved_ms_per_pair"] = round((row["xla_ms"] - best) / B * count, 3)
    results[name] = row
    print(name, row, flush=True)


def probe_down(results):
    """hg_conv1 (32->64, g4->g2, stride 2, full-res input) vs XLA banded."""
    from ecm_tpu.ops.pallas_gband import gband_down_conv_bn, gband_down_reference

    name, count, cin, cout = "hg_conv1 32->64 g4->g2 s2", 3, 32, 64
    xg = arr(B, D4 // 4, H4, W4, 4 * cin)
    k = arr(3, 3, 3, cin, cout) * 0.1
    scale = jnp.abs(jnp.asarray(RNG.normal(size=cout), jnp.float32)) + 0.5
    bias = jnp.asarray(RNG.normal(size=cout), jnp.float32)
    ref = jax.jit(lambda x, kk: gband_down_reference(x, kk, scale, bias))(xg, k)
    out = jax.jit(lambda x, kk: gband_down_conv_bn(x, kk, scale, bias))(xg, k)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    rel = err / max(float(jnp.max(jnp.abs(ref.astype(jnp.float32)))), 1e-9)
    assert rel < 0.02, (name, rel)
    t_xla = timeit(lambda x, kk: gband_down_reference(x, kk, scale, bias), xg, k)
    t_pal = timeit(lambda x, kk: gband_down_conv_bn(x, kk, scale, bias), xg, k)
    useful_tf = 2 * 27 * cin * cout * B * (D4 // 2) * (H4 // 2) * (W4 // 2) / 1e12
    results[name] = {
        "count": count,
        "xla_ms": round(1e3 * t_xla, 3),
        "roll_ms": round(1e3 * t_pal, 3),
        "roll_speedup": round(t_xla / t_pal, 3),
        "roll_useful_tflops": round(useful_tf / t_pal, 1),
        "roll_rel_err": round(rel, 5),
        "saved_ms_per_pair": round(1e3 * (t_xla - t_pal) / B * count, 3),
    }
    print(name, results[name], flush=True)


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    results = {}
    probe_down(results)
    probe("dres0_1 64->32 g4", results, 1, D4 // 4, H4, W4, 64, 32, 4)
    probe("dres_c 32->32 g4", results, 4, D4 // 4, H4, W4, 32, 32, 4)
    # no classif2 (cout=1): 4-lane output blocks are not Mosaic-alignable;
    # the model keeps XLA for that conv (see run_tpu_checks.check_gband)
    probe("hg_conv2 64->64 g2 /8", results, 3, D4 // 4, H4 // 2, W4 // 2, 64, 64, 2)
    probe("hg_conv4 64->64 g2 /16", results, 3, D4 // 8, H4 // 4, W4 // 4, 64, 64, 2)
    results["total_saved_ms_per_pair"] = round(
        sum(v["saved_ms_per_pair"] for v in results.values() if isinstance(v, dict)),
        2,
    )
    results["git"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "GBAND_BENCH.json"
    )
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("total saved ms/pair:", results["total_saved_ms_per_pair"])
    print("wrote", path)


if __name__ == "__main__":
    main()
