"""Fused trilinear-upsample + soft-argmin Pallas kernel (native-kernel
component 2 direction — SURVEY.md 2.5/3.4 hot-spot #3: "trilinear upsample +
softmax over D ... fuse into regression kernel").

The reference path (M5+M6) materializes the full-resolution cost volume
``[B, D, H, W]`` (f32, 368 MB at 384x1248 d192) through resize + softmax +
expectation. This kernel computes the final disparity map directly from the
quarter-resolution volume ``[B, D/4, H/4, W/4]``: for each low-res row it
upsamples H/W/D by the exact x4 half-pixel-center linear-interpolation
weights (static per phase), runs the f32 softmax over D and the expectation
entirely in VMEM, and writes only the ``[4, W]`` output rows. HBM traffic
drops from ~10x the low-res volume to ~3 reads of it + the [H, W] output.

Phase weights (scale 4, align_corners=False): output index 4i+p samples
source coordinate i + (p - 1.5) / 4, i.e. neighbor pairs (i-1, i) for
p in {0, 1} with fractions {0.625, 0.875} and (i, i+1) for p in {2, 3} with
fractions {0.125, 0.375}; edges clamp (matches jax.image.resize /
F.interpolate align_corners=False). Exactness vs the jnp reference is
asserted in tests/test_pallas_regression.py.

Forward-only: the eval/serving path. Training keeps the jnp reference
(autodiff through resize+softmax), selected by ``ECMStereo`` automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fraction of the RIGHT neighbor for output phases 0..3 (left neighbor gets
# 1 - frac); phases 0,1 pair (i-1, i), phases 2,3 pair (i, i+1)
_FRACS = (0.625, 0.875, 0.125, 0.375)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _upsample4_axis(x: jax.Array, axis: int) -> jax.Array:
    """Exact x4 linear (half-pixel, edge-clamped) upsample along ``axis``
    using only repeats, static shifts and constant masks (VPU-friendly)."""
    n = x.shape[axis]

    def shift(a, delta):  # edge-clamped shift along axis
        idx = [slice(None)] * a.ndim
        edge = [slice(None)] * a.ndim
        if delta == -1:  # a[i-1]
            idx[axis] = slice(0, n - 1)
            edge[axis] = slice(0, 1)
            return jnp.concatenate([a[tuple(edge)], a[tuple(idx)]], axis=axis)
        idx[axis] = slice(1, n)
        edge[axis] = slice(n - 1, n)
        return jnp.concatenate([a[tuple(idx)], a[tuple(edge)]], axis=axis)

    rep = jnp.repeat(x, 4, axis=axis)
    rep_l = jnp.repeat(shift(x, -1), 4, axis=axis)
    rep_r = jnp.repeat(shift(x, +1), 4, axis=axis)

    # phase weights built from scalars + iota (pallas kernels cannot capture
    # array constants)
    shape = [1] * x.ndim
    shape[axis] = 4 * n
    ramp = (
        jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis) % 4
    )
    f32 = jnp.float32
    frac = jnp.where(
        ramp == 0,
        f32(_FRACS[0]),
        jnp.where(
            ramp == 1, f32(_FRACS[1]), jnp.where(ramp == 2, f32(_FRACS[2]), f32(_FRACS[3]))
        ),
    )
    use_left = (ramp < 2).astype(f32)
    # p<2: (1-frac)*left_neighbor + frac*center ; p>=2: (1-frac)*center + frac*right
    left_term = (1.0 - frac) * rep_l + frac * rep
    right_term = (1.0 - frac) * rep + frac * rep_r
    return use_left * left_term + (1.0 - use_left) * right_term


def _regression_kernel(prev_ref, cur_ref, next_ref, out_ref):
    """Block: one low-res row y -> 4 output rows. Inputs (1, 1, D4, W4) x3
    (rows y-1, y, y+1 of the H-major transposed volume; Mosaic requires the
    last two block dims to be full array dims, so H is dim 1)."""
    d4 = cur_ref.shape[2]
    prev = prev_ref[0, 0].astype(jnp.float32)  # (D4, W4)
    cur = cur_ref[0, 0].astype(jnp.float32)
    nxt = next_ref[0, 0].astype(jnp.float32)
    # H: 4 output rows from the (prev, cur, next) triple, scalar weights
    f0, f1, f2, f3 = _FRACS
    up_h = jnp.stack(
        [
            (1 - f0) * prev + f0 * cur,
            (1 - f1) * prev + f1 * cur,
            (1 - f2) * cur + f2 * nxt,
            (1 - f3) * cur + f3 * nxt,
        ],
        axis=1,
    )  # (D4, 4, W4)
    # W then D upsample (exact x4 linear)
    up_w = _upsample4_axis(up_h, axis=2)  # (D4, 4, W)
    up_d = _upsample4_axis(up_w, axis=0)  # (D, 4, W)
    # soft-argmin over D (f32, numerically stable)
    logits = -up_d
    m = jnp.max(logits, axis=0, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=0)
    # tpu.iota is integer-only; cast after
    idx = jax.lax.broadcasted_iota(jnp.int32, (4 * d4, 1, 1), 0).astype(jnp.float32)
    num = jnp.sum(p * idx, axis=0)
    out_ref[0, 0] = num / denom  # (4, W)


def fused_upsample_softargmin(cost4: jax.Array, max_disp: int) -> jax.Array:
    """[B, D/4, H/4, W/4] cost -> [B, H, W] disparity (f32), fusing the x4
    trilinear upsample with the soft-argmin. Equivalent to
    ``disparity_regression(upsample_trilinear(cost4, (D, H, W)), D)``."""
    b, d4, h4, w4 = cost4.shape
    assert d4 * 4 == max_disp, (cost4.shape, max_disp)
    cost4 = cost4.astype(jnp.float32)
    # replicate-pad H by one row each side so the three row index maps are
    # pure offsets (Mosaic rejects clamping arithmetic inside index maps);
    # edge replication == the resize clamp semantics.
    # H-major layout [B, H4+2, D4, W4]: the row-blocked dim must not be one
    # of the two minor dims (Mosaic block-shape divisibility rule), and the
    # (D4, W4) minor dims are full-array so any shape is legal.
    cost4t = jnp.transpose(cost4, (0, 2, 1, 3))
    cost4p = jnp.concatenate(
        [cost4t[:, :1], cost4t, cost4t[:, -1:]], axis=1
    )  # [B, H4+2, D4, W4]

    def row_spec(off):
        return pl.BlockSpec(
            (1, 1, d4, w4),
            lambda bi, yi: (bi, yi + off, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        _regression_kernel,
        grid=(b, h4),
        in_specs=[row_spec(0), row_spec(1), row_spec(2)],
        out_specs=pl.BlockSpec(
            (1, 1, 4, 4 * w4), lambda bi, yi: (bi, yi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h4, 4, 4 * w4), jnp.float32),
        interpret=_interpret(),
    )(cost4p, cost4p, cost4p)
    return out.reshape(b, 4 * h4, 4 * w4)
