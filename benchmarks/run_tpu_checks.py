"""Real-TPU validation of the Pallas kernels (tests/ run CPU interpret mode
only — this script compiles the kernels with Mosaic on the actual chip and
checks exact parity + microbenchmarks vs the jnp reference).

    python benchmarks/run_tpu_checks.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ecm_tpu.ops.cost_volume import (
    cost_volume_concat_jnp,
    cost_volume_correlation_jnp,
)
from ecm_tpu.ops.pallas_cost_volume import cost_volume_pallas


def timeit(fn, *args, iters=20):
    """On-device scan timing (per-dispatch RPC overhead is ~30ms here)."""
    @jax.jit
    def many(*a):
        def body(acc, _):
            return acc + fn(*a).astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return tot
    float(many(*args))  # compile+warm
    t0 = time.perf_counter()
    float(many(*args))
    return (time.perf_counter() - t0) / iters


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    # production-shaped: KITTI 384x1248 at 1/4 res, C=32, D/4=48
    B, H, W, C, D = 1, 96, 312, 32, 48
    fl = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))

    for mode, ref_fn in (
        ("concat", cost_volume_concat_jnp),
        ("correlation", cost_volume_correlation_jnp),
    ):
        ref = ref_fn(fl, fr, D)
        out = cost_volume_pallas(fl, fr, D, mode=mode)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
        )
        t_ref = timeit(lambda a, b: ref_fn(a, b, D).sum(), fl, fr)
        t_pal = timeit(lambda a, b: cost_volume_pallas(a, b, D, mode=mode).sum(), fl, fr)
        out_bytes = np.prod(ref.shape) * 4
        bw = out_bytes / t_pal / 1e9
        print(
            f"{mode}: MATCH. jnp {t_ref * 1e3:.2f} ms, pallas {t_pal * 1e3:.2f} ms "
            f"({t_ref / t_pal:.2f}x), pallas write-bw {bw:.0f} GB/s"
        )

    # gradient parity compiled
    def loss_p(fl, fr):
        return jnp.sum(cost_volume_pallas(fl, fr, D, mode="concat") ** 2)

    def loss_j(fl, fr):
        return jnp.sum(cost_volume_concat_jnp(fl, fr, D) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(fl, fr)
    gj = jax.jit(jax.grad(loss_j, argnums=(0, 1)))(fl, fr)
    for a, b in zip(gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
    print("concat backward: MATCH (compiled)")


if __name__ == "__main__":
    main()
