"""Fused trilinear-upsample + soft-argmin Pallas kernel (native-kernel
component 2 direction — SURVEY.md 2.5/3.4 hot-spot #3: "trilinear upsample +
softmax over D ... fuse into regression kernel").

The reference path (M5+M6) materializes the full-resolution cost volume
``[B, D, H, W]`` (f32, 368 MB at 384x1248 d192) through resize + softmax +
expectation. This kernel computes the final disparity map directly from the
quarter-resolution volume ``[B, D/4, H/4, W/4]``: for each low-res row it
forms the x4 half-pixel-center linear-interpolation in **phase-decomposed**
form, runs the f32 softmax over D and the expectation entirely in VMEM, and
writes only 16 output vectors of length W/4. HBM traffic drops from ~10x the
low-res volume to ~3 reads of it + the [H, W] output.

Phase weights (scale 4, align_corners=False): output index 4i+p samples
source coordinate i + (p - 1.5) / 4, i.e. neighbor pairs (i-1, i) for
p in {0, 1} with fractions {0.625, 0.875} and (i, i+1) for p in {2, 3} with
fractions {0.125, 0.375}; edges clamp (matches jax.image.resize /
F.interpolate align_corners=False). Exactness vs the jnp reference is
asserted in tests/test_pallas_regression.py.

Mosaic notes (all learned on the real chip): the upsample must NOT be
materialized via ``jnp.repeat``/interleaving reshapes — an interleave along
the lane axis is an "unsupported shape cast". Instead each of the 4x4x4
(H, W, D) phases is a separate ``(D/4, W/4)`` volume built from edge-clamped
static shifts (slice + concat, native VPU ops); the softmax reduction over
full-res D is the sum over (D-phase, low-res D), so no full-res tensor ever
exists. The phase interleave to ``[B, H, W]`` is a cheap XLA
transpose+reshape outside the kernel.

Forward-only: the eval/serving path. Training keeps the jnp reference
(autodiff through resize+softmax), selected by ``ECMStereo`` automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fraction of the RIGHT neighbor for output phases 0..3 (left neighbor gets
# 1 - frac); phases 0,1 pair (i-1, i), phases 2,3 pair (i, i+1)
_FRACS = (0.625, 0.875, 0.125, 0.375)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shift(x: jax.Array, axis: int, delta: int) -> jax.Array:
    """Edge-clamped static shift: result[i] = x[clamp(i + delta)]."""
    n = x.shape[axis]
    idx = [slice(None)] * x.ndim
    edge = [slice(None)] * x.ndim
    if delta == -1:  # x[i-1]
        idx[axis] = slice(0, n - 1)
        edge[axis] = slice(0, 1)
        return jnp.concatenate([x[tuple(edge)], x[tuple(idx)]], axis=axis)
    idx[axis] = slice(1, n)
    edge[axis] = slice(n - 1, n)
    return jnp.concatenate([x[tuple(idx)], x[tuple(edge)]], axis=axis)


def _phases(x: jax.Array, axis: int) -> list[jax.Array]:
    """The 4 upsample phases along ``axis`` as separate same-shape arrays:
    phases[p][i] = (1-f_p)*left_p(i) + f_p*right_p(i) with edge clamp."""
    lo = _shift(x, axis, -1)
    hi = _shift(x, axis, +1)
    f0, f1, f2, f3 = _FRACS
    return [
        (1 - f0) * lo + f0 * x,
        (1 - f1) * lo + f1 * x,
        (1 - f2) * x + f2 * hi,
        (1 - f3) * x + f3 * hi,
    ]


def _regression_kernel(prev_ref, cur_ref, next_ref, out_ref):
    """Block: one low-res row y -> 16 (H-phase, W-phase) output vectors of
    length W4. Inputs (1, 1, D4, W4) x3 (rows y-1, y, y+1 of the H-major
    transposed volume; Mosaic requires the last two block dims to be full
    array dims, so H is dim 1)."""
    d4 = cur_ref.shape[2]
    prev = prev_ref[0, 0].astype(jnp.float32)  # (D4, W4)
    cur = cur_ref[0, 0].astype(jnp.float32)
    nxt = next_ref[0, 0].astype(jnp.float32)
    f = _FRACS
    # full-res disparity index of low-res plane i at D-phase dp is 4*i + dp
    idx4 = 4.0 * jax.lax.broadcasted_iota(jnp.int32, cur.shape, 0).astype(
        jnp.float32
    )
    h_vols = [
        (1 - f[0]) * prev + f[0] * cur,
        (1 - f[1]) * prev + f[1] * cur,
        (1 - f[2]) * cur + f[2] * nxt,
        (1 - f[3]) * cur + f[3] * nxt,
    ]
    for hp, hv in enumerate(h_vols):
        for wp, u in enumerate(_phases(hv, axis=1)):
            # 4 D-phase volumes; softmax over full-res D == over (dp, i)
            d_vols = _phases(u, axis=0)
            m = d_vols[0]
            for dv in d_vols[1:]:
                m = jnp.minimum(m, dv)  # logits = -cost: max logit = min cost
            m = jnp.min(m, axis=0)  # (W4,)
            denom = jnp.zeros_like(m)
            num = jnp.zeros_like(m)
            for dp, dv in enumerate(d_vols):
                p = jnp.exp(m - dv)  # exp(-cost - max(-cost))
                denom = denom + jnp.sum(p, axis=0)
                num = num + jnp.sum(p * (idx4 + float(dp)), axis=0)
            out_ref[0, 0, hp, wp, :] = num / denom


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
            (1, 1, 4, 4, w4),
            lambda bi, yi: (bi, yi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h4, 4, 4, w4), jnp.float32),
        interpret=_interpret(),
    )(cost4p, cost4p, cost4p)
    # interleave phases: [b, yi, hp, wp, xj] -> [b, yi, hp, xj, wp] -> [b, H, W]
    return jnp.transpose(out, (0, 1, 2, 4, 3)).reshape(b, 4 * h4, 4 * w4)
