"""Round-4 optimization probe for the DOMINANT aggregation conv: the
full-res stride-1 32->32 g=4 grouped conv (5 instances/eval forward; see
benchmarks/AGG_LAYERS.json). The halo form runs at ~49 dense TF/s (25% MXU)
while the 2D feature convs reach ~70% — this probe measures alternative
formulations of the SAME math to find where the rest goes:

  halo            slot-halo form (op-level winner, not the default —
                  benchmarks/HALO_PROBE.json + grouped3d policy note)
  halo_const_k    pre-expanded kernel passed in (no in-trace expansion)
  halo_bf16_acc   bf16 accumulation (numerics trade, diagnostic)
  halo_pad256     halo input explicitly zero-padded 192->256 lanes (K-tile
                  alignment theory: 192 = 1.5 x 128-lane tiles)
  fg_dz           3 slot-shifted feature_group_count=4 convs, one per D-tap —
                  ZERO FLOP inflation; tests XLA's grouped-conv lowering
  two_half_batch  window split: out slots {0,1} read halo slots 0..3, out
                  {2,3} read 2..5 — same relative kernel, so both halves
                  stack along batch: ONE conv, K=128 (exact tile), N=64
  dot9            9 explicit shifted [M,192]x[192,128] dot_generals
  ndhwc           ungrouped conv3d_xla reference (lane-starved baseline)

All variants are parity-checked against the banded reference before timing.
Writes benchmarks/AGG_PROBE4.json (git-stamped).
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

from ecm_tpu.ops.conv3d import conv3d_xla
from ecm_tpu.ops.grouped3d import (
    from_grouped,
    grouped_conv3d,
    halo_kernel_s1,
    slot_halo,
    to_grouped,
)

B, D4, H4, W4, C = 4, 48, 96, 312, 32
G = 4
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


def conv2d(x, k, fg=1, acc=jnp.float32):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fg,
        preferred_element_type=acc,
    )


# ---------------- variants ----------------


def v_halo(xg, k):
    return grouped_conv3d(xg, k, 1, impl="halo")


def v_halo_const(xg, kh):
    b, dg, h, w, gc = xg.shape
    xh = slot_halo(xg, G)
    y = conv2d(xh.reshape(b * dg, h, w, xh.shape[-1]), kh)
    return y.reshape(b, dg, h, w, y.shape[-1]).astype(xg.dtype)


def v_halo_bf16(xg, kh):
    b, dg, h, w, gc = xg.shape
    xh = slot_halo(xg, G)
    y = conv2d(xh.reshape(b * dg, h, w, xh.shape[-1]), kh, acc=jnp.bfloat16)
    return y.reshape(b, dg, h, w, y.shape[-1]).astype(xg.dtype)


def v_halo_pad256(xg, kh256):
    b, dg, h, w, gc = xg.shape
    xh = slot_halo(xg, G)
    xh = jnp.pad(xh, ((0, 0),) * 4 + ((0, 256 - xh.shape[-1]),))
    y = conv2d(xh.reshape(b * dg, h, w, 256), kh256)
    return y.reshape(b, dg, h, w, y.shape[-1]).astype(xg.dtype)


def _slot_shift(xg, dz, c):
    """Grouped volume with every plane shifted by dz in D (zero boundary)."""
    b, dg, h, w, gc = xg.shape
    z = jnp.zeros_like(xg[:, :1, ..., :c])
    if dz == -1:
        prev_last = jnp.concatenate([z, xg[:, :-1, ..., gc - c :]], axis=1)
        return jnp.concatenate([prev_last, xg[..., : gc - c]], axis=-1)
    if dz == 1:
        next_first = jnp.concatenate([xg[:, 1:, ..., :c], z], axis=1)
        return jnp.concatenate([xg[..., c:], next_first], axis=-1)
    return xg


def v_fg_dz(xg, k):
    b, dg, h, w, gc = xg.shape
    acc = None
    for dz, tap in ((-1, 0), (0, 1), (1, 2)):
        xs = _slot_shift(xg, dz, C).reshape(b * dg, h, w, gc)
        kfg = jnp.tile(k[tap], (1, 1, 1, G))  # [3,3,32,128], group q -> q
        y = conv2d(xs, kfg, fg=G)
        acc = y if acc is None else acc + y
    return acc.reshape(b, dg, h, w, gc).astype(xg.dtype)


def _half_kernel(k):
    """[3,3,128,64]: out slot q in {0,1}, halo slot p in {0..3} (plane q+dz-1
    at halo index p = q+dz)."""
    kh = np.zeros((3, 3, 4 * C, 2 * C), np.float32)
    karr = np.asarray(k, np.float32)
    for q in range(2):
        for dz in range(3):
            p = q + dz
            kh[:, :, p * C : (p + 1) * C, q * C : (q + 1) * C] = karr[dz]
    return jnp.asarray(kh)


def v_two_half(xg, kh2):
    b, dg, h, w, gc = xg.shape
    xh = slot_halo(xg, G)  # [..., 6C]
    a = xh[..., : 4 * C].reshape(b * dg, h, w, 4 * C)
    b2 = xh[..., 2 * C :].reshape(b * dg, h, w, 4 * C)
    x2 = jnp.concatenate([a, b2], axis=0)
    y = conv2d(x2, kh2)  # [2*b*dg, h, w, 2C]
    ya, yb = y[: b * dg], y[b * dg :]
    out = jnp.concatenate([ya, yb], axis=-1)
    return out.reshape(b, dg, h, w, gc).astype(xg.dtype)


def v_dot9(xg, kh):
    b, dg, h, w, gc = xg.shape
    xh = slot_halo(xg, G).reshape(b * dg, h, w, 6 * C)
    xp = jnp.pad(xh, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dh in range(3):
        for dw in range(3):
            xs = xp[:, dh : dh + h, dw : dw + w, :]
            y = jax.lax.dot_general(
                xs, kh[dh, dw],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc.reshape(b, dg, h, w, gc).astype(xg.dtype)


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    x = jnp.asarray(
        RNG.normal(size=(B, D4, H4, W4, C)).astype(np.float32), dtype=jnp.bfloat16
    )
    k = jnp.asarray(
        (RNG.normal(size=(3, 3, 3, C, C)) * 0.1).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    xg = to_grouped(x)
    ref = from_grouped(jax.jit(lambda a, b: grouped_conv3d(a, b, 1, impl="banded"))(xg, k))

    kh = halo_kernel_s1(k, G)
    kh256 = jnp.pad(kh, ((0, 0), (0, 0), (0, 256 - kh.shape[2]), (0, 0)))
    kh2 = _half_kernel(k).astype(jnp.bfloat16)

    useful_gflop = 2 * 27 * C * C * B * D4 * H4 * W4 / 1e9
    variants = {
        "halo": (v_halo, (xg, k)),
        "halo_const_k": (v_halo_const, (xg, kh)),
        "halo_bf16_acc": (v_halo_bf16, (xg, kh)),
        "halo_pad256": (v_halo_pad256, (xg, kh256)),
        "fg_dz": (v_fg_dz, (xg, k)),
        "two_half_batch": (v_two_half, (xg, kh2)),
        "dot9": (v_dot9, (xg, kh)),
        "ndhwc": (lambda a, b: conv3d_xla(a, b, (1, 1, 1), ((1, 1),) * 3), (x, k)),
    }
    results = {}
    for name, (fn, args) in variants.items():
        out = jax.jit(fn)(*args)
        out_u = out if name == "ndhwc" else from_grouped(out)
        err = float(
            jnp.max(jnp.abs(out_u.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        rel = err / max(scale, 1e-9)
        tol = 0.05 if name == "halo_bf16_acc" else 0.02
        assert rel < tol, (name, rel)
        t = timeit(fn, *args) * 1e3
        results[name] = {
            "ms": round(t, 3),
            "useful_tflops": round(useful_gflop / t, 1),
            "rel_err_vs_banded": round(rel, 5),
        }
        print(name, results[name], flush=True)

    results["git"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "AGG_PROBE4.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
