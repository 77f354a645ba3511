"""Probe alternative conv3d formulations for the aggregation hot path.

Round-2 roofline (benchmarks/ROOFLINE.json): aggregation runs at 10.9% MXU,
and AGG_MICROBENCH.json pinpoints the full-res stride-1 32->32 convs at
~12 TF/s (6% of the v5e's 197 TF/s bf16 peak) — neither compute- nor
HBM-bound, i.e. XLA's conv3d lowering at C=32 is layout-starved (the MXU
sees 32/128 output lanes and the VPU works 32/128-filled vregs).

Hypothesis probed here: fold G consecutive disparity planes into the channel
dim ("D-grouped" layout, [B, D/G, H, W, G*C]) so the convs present
G*C = 128 input/output lanes. The 3x3x3 conv becomes a 3x3x3 conv over
groups with a block-banded kernel (each output plane touches only its 3
neighbouring input planes -> 3/(3G) = 1/G of the fat kernel is nonzero, so
dense FLOPs inflate x G) — a good trade iff the fat conv's MXU efficiency
gain exceeds G/3... measured here, not assumed.

Variants:
  xla_c32        — baseline: native conv3d NDHWC 32->32 (current model path)
  conv2d_c32     — ceiling ref: plain 2D 3x3 conv at the same C (what the
                   tuned 2D path achieves at 32 lanes)
  conv2d_c128    — ceiling ref: plain 2D 3x3 conv at 128 lanes
  grouped3d_gG   — fat conv3d [B, D/G, H, W, G*C] with banded kernel
  grouped2d_gG   — same math via 3 dz-group-batched 2D convs + shifted adds
                   (2D convs are XLA's most-tuned TPU path)
  relayout       — cost of [B,D,H,W,C] <-> grouped transpose (would be paid
                   once per aggregation stack, or zero if the whole stack
                   adopts the grouped layout natively)

Writes benchmarks/CONV3D_PROBE.json (git-stamped).
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

B = 4
D4, H4, W4 = 48, 96, 312  # 384x1248 d192 at 1/4 res
ITERS = 8
PEAK_TFLOPS = float(os.environ.get("ECM_TPU_PEAK_TFLOPS", "197"))


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


def grouped_kernel(k: jax.Array, g: int) -> jax.Array:
    """Expand a [3,3,3,C,C'] 3D-conv kernel to the D-grouped block-banded
    form [3, 3, 3, G*C, G*C'] (group-window dim leading, matching NDHWC
    conv over [B, D/G, H, W, G*C]).

    Kg[dg, kh, kw, p*C+ci, q*C'+co] = k[dz, kh, kw, ci, co]
      with dz = p + G*(dg-1) - q + 1, kept iff 0 <= dz <= 2.
    """
    kd, kh, kw, c, co = k.shape
    assert kd == 3
    kg = np.zeros((3, kh, kw, g * c, g * co), dtype=np.float32)
    kn = np.asarray(k, dtype=np.float32)
    for dg in range(3):
        for p in range(g):
            for q in range(g):
                dz = p + g * (dg - 1) - q + 1
                if 0 <= dz <= 2:
                    kg[dg, :, :, p * c : (p + 1) * c, q * co : (q + 1) * co] = kn[dz]
    return jnp.asarray(kg).astype(k.dtype)


def to_grouped(x: jax.Array, g: int) -> jax.Array:
    b, d, h, w, c = x.shape
    return (
        x.reshape(b, d // g, g, h, w, c)
        .transpose(0, 1, 3, 4, 2, 5)
        .reshape(b, d // g, h, w, g * c)
    )


def from_grouped(xg: jax.Array, g: int) -> jax.Array:
    b, dg, h, w, gc = xg.shape
    c = gc // g
    return (
        xg.reshape(b, dg, h, w, g, c)
        .transpose(0, 1, 4, 2, 3, 5)
        .reshape(b, dg * g, h, w, c)
    )


def conv3d_ndhwc(x, k, strides=(1, 1, 1), padding=((1, 1),) * 3):
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv2d_nhwc(x, k, strides=(1, 1), padding=((1, 1),) * 2):
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def grouped2d(xg: jax.Array, kg: jax.Array) -> jax.Array:
    """Same math as the grouped 3D conv via 3 batched 2D convs + group-shifted
    adds: out[:, gi] = sum_dg conv2d(x[:, gi+dg-1], kg[dg])."""
    b, dg, h, w, gc = xg.shape
    gco = kg.shape[-1]
    x2 = xg.reshape(b * dg, h, w, gc)
    out = None
    for i in range(3):
        y = conv2d_nhwc(x2, kg[i]).reshape(b, dg, h, w, gco)
        if i == 0:  # contributes to output group gi = (input group)+1
            y = jnp.pad(y[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        elif i == 2:
            y = jnp.pad(y[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
        out = y if out is None else out + y
    return out


def main() -> None:
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    c = 32
    x = jnp.asarray(rng.normal(size=(B, D4, H4, W4, c)).astype(np.float32)).astype(dt)
    k = jnp.asarray(
        rng.normal(size=(3, 3, 3, c, c)).astype(np.float32) * 0.05
    ).astype(dt)

    useful_flops = 2 * 27 * c * c * B * D4 * H4 * W4
    results: dict[str, dict] = {}

    def record(label, t, dense_flops):
        results[label] = {
            "ms": round(1e3 * t, 3),
            "dense_tflops": round(dense_flops / t / 1e12, 1),
            "useful_tflops": round(useful_flops / t / 1e12, 1),
            "pct_mxu_dense": round(100 * dense_flops / t / 1e12 / PEAK_TFLOPS, 1),
        }
        print(label, results[label], flush=True)

    # --- baseline + ceilings ---
    record("xla_c32", timeit(conv3d_ndhwc, x, k), useful_flops)
    x2 = x.reshape(B * D4, H4, W4, c)
    k2 = k[1]
    record(
        "conv2d_c32",
        timeit(conv2d_nhwc, x2, k2),
        2 * 9 * c * c * B * D4 * H4 * W4,
    )
    for g in (4,):
        xg_flat = jnp.asarray(
            rng.normal(size=(B * D4 // g, H4, W4, g * c)).astype(np.float32)
        ).astype(dt)
        kf = jnp.asarray(
            rng.normal(size=(3, 3, g * c, g * c)).astype(np.float32) * 0.02
        ).astype(dt)
        record(
            f"conv2d_c{g*c}",
            timeit(conv2d_nhwc, xg_flat, kf),
            2 * 9 * (g * c) ** 2 * B * (D4 // g) * H4 * W4,
        )

    # --- grouped formulations ---
    ref = conv3d_ndhwc(x, k)
    for g in (4, 8):
        kg = grouped_kernel(k, g)
        xg = to_grouped(x, g)
        dense = 2 * 27 * (g * c) ** 2 * B * (D4 // g) * H4 * W4

        # correctness first
        out3 = from_grouped(conv3d_ndhwc(xg, kg), g)
        err3 = float(
            jnp.max(jnp.abs(out3.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        out2 = from_grouped(grouped2d(xg, kg), g)
        err2 = float(
            jnp.max(jnp.abs(out2.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
        assert err3 / scale < 0.05, (g, err3, scale)
        assert err2 / scale < 0.05, (g, err2, scale)

        record(f"grouped3d_g{g}", timeit(conv3d_ndhwc, xg, kg), dense)
        record(f"grouped2d_g{g}", timeit(grouped2d, xg, kg), dense)
        dense2d = 2 * 9 * (g * c) ** 2 * B * (D4 // g) * H4 * W4
        record(
            f"grouped2d_g{g}_single",
            timeit(lambda a, b: conv2d_nhwc(a.reshape(B * D4 // g, H4, W4, g * c), b[1]), xg, kg),
            dense2d,
        )

    # --- relayout cost (paid only at stack entry/exit if adopted natively) ---
    t = timeit(lambda a: to_grouped(a, 4), x)
    results["relayout_to_g4"] = {"ms": round(1e3 * t, 3)}
    t = timeit(lambda a: from_grouped(a, 4), to_grouped(x, 4))
    results["relayout_from_g4"] = {"ms": round(1e3 * t, 3)}

    git = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    results["git"] = git
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "CONV3D_PROBE.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()


def grouped_kernel_s2(k: jax.Array, g: int) -> jax.Array:
    """Grouped-layout kernel for the stride-2 encoder conv: conv3d windows
    (3,3,3) strides (2,2,2) over [B, DG, H, W, G*Cin] -> [B, DG/2, H/2, W/2,
    G*Cout].  Output plane o=4*go+q <- input plane i=4*(2*go+dg-1)+p at
    dz = 4*dg + p - 2*q - 3, kept iff 0 <= dz <= 2."""
    kd, kh, kw, c, co = k.shape
    assert kd == 3
    kg = np.zeros((3, kh, kw, g * c, g * co), dtype=np.float32)
    kn = np.asarray(k, dtype=np.float32)
    for dg in range(3):
        for p in range(g):
            for q in range(g):
                dz = 4 * dg + p - 2 * q - 3 if g == 4 else None
                if g != 4:
                    dz = g * dg + p - 2 * q - (g - 1)
                if 0 <= dz <= 2:
                    kg[dg, :, :, p * c : (p + 1) * c, q * co : (q + 1) * co] = kn[dz]
    return jnp.asarray(kg).astype(k.dtype)


def probe_more() -> None:
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(1)
    dt = jnp.bfloat16
    results = {}

    def record(label, t, dense_flops, useful_flops):
        results[label] = {
            "ms": round(1e3 * t, 3),
            "dense_tflops": round(dense_flops / t / 1e12, 1),
            "useful_tflops": round(useful_flops / t / 1e12, 1),
        }
        print(label, results[label], flush=True)

    g = 4
    cases = [
        # label, (D,H,W), cin, cout, stride
        ("hg_conv1 32->64 s2", (D4, H4, W4), 32, 64, 2),
        ("hg_conv3 64->64 s2 /8", (D4 // 2, H4 // 2, W4 // 2), 64, 64, 2),
        ("hg_conv2 64->64 /8", (D4 // 2, H4 // 2, W4 // 2), 64, 64, 1),
        ("dres0_c1 64->32", (D4, H4, W4), 64, 32, 1),
    ]
    for label, (d, h, w), cin, cout, s in cases:
        x = jnp.asarray(
            rng.normal(size=(B, d, h, w, cin)).astype(np.float32)
        ).astype(dt)
        k = jnp.asarray(
            rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.05
        ).astype(dt)
        ref = conv3d_ndhwc(x, k, (s,) * 3)
        xg = to_grouped(x, g)
        if s == 1:
            kg = grouped_kernel(k, g)
            out = from_grouped(conv3d_ndhwc(xg, kg), g)
        else:
            kg = grouped_kernel_s2(k, g)
            out = from_grouped(conv3d_ndhwc(xg, kg, (2, 2, 2)), g)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
        assert err / scale < 0.05, (label, err, scale)
        do, ho, wo = ref.shape[1:4]
        useful = 2 * 27 * cin * cout * B * do * ho * wo
        dense = useful * g
        t_base = timeit(lambda a, b: conv3d_ndhwc(a, b, (s,) * 3), x, k)
        record(label + " xla", t_base, useful, useful)
        t_g = timeit(
            lambda a, b: conv3d_ndhwc(a, b, (s,) * 3), xg, kg
        )
        record(label + f" grouped_g{g}", t_g, dense, useful)

    results["git"] = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "CONV3D_PROBE2.json"),
        "w",
    ) as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__" and os.environ.get("ECM_PROBE2"):
    probe_more()
