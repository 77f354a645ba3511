"""On-chip parity + benchmark of the fused Pallas aggregation kernel vs the
unfused XLA chain, at the production shape (384x1248 d192, batch 4, bf16).

Covers the three stride-1 pairs it replaces: dres0 (64->32->32 + ctx),
dres1 (32->32->32 + residual), classif (32->32->1). Writes
benchmarks/FUSED_AGG.json.
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

B, D4, H4, W4 = 4, 48, 96, 312
ITERS = 8


def timeit(fn, *args, iters: int = ITERS) -> float:
    scales = jnp.linspace(0.999, 1.001, iters)

    @jax.jit
    def many(*a):
        def body(acc, s):
            out = fn(a[0] * s.astype(a[0].dtype), *a[1:])
            return acc + out.astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), scales)
        return tot

    float(many(*args))
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    from ecm_tpu.ops.pallas_fused_agg import (
        fused_conv3d_pair,
        fused_conv3d_pair_reference,
    )

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    cases = [
        ("dres0+ctx", 64, 32, 32, dict(ctx=True)),
        ("dres1+res", 32, 32, 32, dict(relu2=False, residual=True)),
        ("classif", 32, 32, 1, dict(relu2=False)),
    ]
    results = {}
    for label, cin, cm, cout, opts in cases:
        x = jnp.asarray(
            rng.normal(size=(B, D4, H4, W4, cin)).astype(np.float32)
        ).astype(dt)
        k1 = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cm)).astype(np.float32) * 0.1)
        k2 = jnp.asarray(rng.normal(size=(3, 3, 3, cm, cout)).astype(np.float32) * 0.1)
        s1 = jnp.asarray(rng.uniform(0.5, 1.5, cm).astype(np.float32))
        b1 = jnp.asarray(rng.normal(size=cm).astype(np.float32) * 0.1)
        s2 = jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32))
        b2 = jnp.asarray(rng.normal(size=cout).astype(np.float32) * 0.1)
        kw = dict(opts)
        ctx = None
        if kw.pop("ctx", False):
            ctx = jnp.asarray(
                rng.normal(size=(B, H4, W4, cout)).astype(np.float32)
            ).astype(dt)

        out = fused_conv3d_pair(x, k1, s1, b1, k2, s2, b2, ctx=ctx, **kw)
        ref = fused_conv3d_pair_reference(x, k1, s1, b1, k2, s2, b2, ctx=ctx, **kw)
        err = float(
            jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max()
        )
        scale = float(jnp.abs(ref.astype(jnp.float32)).max())
        rel = err / max(scale, 1e-9)
        assert rel < 0.02, (label, err, scale)

        t_f = timeit(
            lambda a, c=ctx, K=(k1, s1, b1, k2, s2, b2), kk=kw: fused_conv3d_pair(
                a, *K, ctx=c, **kk
            ),
            x,
        )
        t_r = timeit(
            lambda a, c=ctx, K=(k1, s1, b1, k2, s2, b2), kk=kw:
            fused_conv3d_pair_reference(a, *K, ctx=c, **kk),
            x,
        )
        n = B * D4 * H4 * W4
        flops = 2 * 27 * n * (cin * cm + cm * cout)
        results[label] = {
            "rel_err": rel,
            "fused_ms": round(1e3 * t_f, 3),
            "unfused_ms": round(1e3 * t_r, 3),
            "speedup": round(t_r / t_f, 2),
            "fused_tflops": round(flops / t_f / 1e12, 1),
            "unfused_tflops": round(flops / t_r / 1e12, 1),
        }
        print(
            f"{label:<12} MATCH rel={rel:.2e}  fused {1e3 * t_f:7.3f} ms "
            f"({flops / t_f / 1e12:5.1f} TF/s)  unfused {1e3 * t_r:7.3f} ms "
            f"({flops / t_r / 1e12:5.1f} TF/s)  speedup {t_r / t_f:.2f}x"
        )

    import subprocess

    try:
        results["git"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__),
        ).stdout.strip()
    except Exception:
        results["git"] = "unknown"
    out_path = os.path.join(os.path.dirname(__file__), "FUSED_AGG.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
