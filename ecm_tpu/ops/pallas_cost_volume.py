"""Hand-written Pallas TPU cost-volume kernel (native-kernel component 1,
SURVEY.md 2.5 — the TPU-native equivalent of the reference's "CUDA-style
correlation layer", BASELINE.json:5).

Why a kernel: the volume is pure data movement — output ``[B, D, H, W, 2C]``
reads only ``fl``/``fr`` (``[B, H, W, C]``). The jnp reference builds D
shifted/padded copies which XLA materializes (or re-reads fr D times from
HBM). This kernel:

- iterates grid ``(B, H-blocks, D)`` with D innermost, so the ``fl`` block's
  index map is constant across the D sweep — Pallas keeps it resident in VMEM
  (one HBM fetch per (b, h) instead of D);
- gets the shifted right-image rows via an async DMA from a left-zero-padded
  ``fr`` laid out in HBM (``fr_pad[:, :, D + w] = fr[:, :, w]``), so the
  shift is a pure DMA offset — no gather, no select;
- writes every output element exactly once. HBM traffic approaches the
  write-bandwidth bound (output bytes + one read of fl/fr).

``cost_volume_pallas`` carries a custom VJP (the op is linear):
``dfl[w] = sum_d g[d, w, :C] . mask``; ``dfr[w] = sum_d g[d, w + d, C:]`` —
the backward kernel accumulates both in VMEM scratch across the D sweep and
writes once at ``d = D - 1``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU unit tests)."""
    return jax.default_backend() != "tpu"


def _pick_row_block(h: int, w: int, c: int, dtype_bytes: int, budget: int = 2**21) -> int:
    """Largest divisor of H whose (Ht, W, 2C) out-block fits the VMEM budget."""
    for ht in range(h, 0, -1):
        if h % ht == 0 and ht * w * 2 * c * dtype_bytes <= budget:
            return ht
    return 1


def _concat_fwd_kernel(fl_ref, fr_hbm, out_ref, fr_scratch, sem):
    b, h, d = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    ht, w, c = fr_scratch.shape
    d_max = pl.num_programs(2)
    dma = pltpu.make_async_copy(
        fr_hbm.at[b, pl.ds(h * ht, ht), pl.ds(d_max - d, w), :],
        fr_scratch,
        sem,
    )
    dma.start()
    # left half: fl masked to zero where w < d (reference leaves those cols 0)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (ht, w, 1), 1)
    mask = (wiota >= d).astype(fl_ref.dtype)
    out_ref[0, 0, :, :, :c] = fl_ref[0] * mask
    dma.wait()
    # right half: zero-padding of fr_pad supplies the w < d zeros
    out_ref[0, 0, :, :, c:] = fr_scratch[:]


def _concat_bwd_kernel(g_ref, dfl_ref, dfr_hbm, dfr_acc, sem):
    """Grid (B, Hb, D), D innermost. Accumulates dfl in the (revisited) output
    block and dfr in scratch; DMAs dfr out on the last D step.

    dfl[w] = sum_d g[d, w, :C] * (w >= d)
    dfr[w] = sum_d g[d, w + d, C:]  (w + d < W)
    """
    b, h, d = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    d_max = pl.num_programs(2)
    ht, wpad, c = dfr_acc.shape  # wpad = W + D (padded-fr coordinates)
    w = wpad - d_max
    g = g_ref[0, 0]  # (ht, w, 2c)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (ht, w, 1), 1)
    gl = g[:, :, :c] * (wiota >= d).astype(g.dtype)

    @pl.when(d == 0)
    def _():
        dfl_ref[0] = jnp.zeros_like(dfl_ref[0])
        dfr_acc[:] = jnp.zeros_like(dfr_acc)

    dfl_ref[0] += gl
    # scatter g[:, :, c:] into padded-fr coords starting at (d_max - d)
    dfr_acc[:, pl.ds(d_max - d, w), :] += g[:, :, c:]

    @pl.when(d == d_max - 1)
    def _():
        dma = pltpu.make_async_copy(dfr_acc, dfr_hbm.at[b, pl.ds(h * ht, ht)], sem)
        dma.start()
        dma.wait()


def _concat_fwd(fl: jax.Array, fr: jax.Array, max_disp: int) -> jax.Array:
    b, h, w, c = fl.shape
    ht = _pick_row_block(h, w, c, fl.dtype.itemsize)
    fr_pad = jnp.pad(fr, ((0, 0), (0, 0), (max_disp, 0), (0, 0)))
    grid = (b, h // ht, max_disp)
    return pl.pallas_call(
        _concat_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, ht, w, c), lambda bi, hi, di: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ht, w, 2 * c),
            lambda bi, hi, di: (bi, di, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, max_disp, h, w, 2 * c), fl.dtype),
        scratch_shapes=[
            pltpu.VMEM((ht, w, c), fl.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(fl, fr_pad)


def _concat_bwd(max_disp: int, res, g: jax.Array):
    fl, fr = res
    b, h, w, c = fl.shape
    ht = _pick_row_block(h, w, c, fl.dtype.itemsize)
    grid = (b, h // ht, max_disp)
    dfl, dfr_pad = pl.pallas_call(
        _concat_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, ht, w, 2 * c),
                lambda bi, hi, di: (bi, di, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, ht, w, c), lambda bi, hi, di: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), fl.dtype),
            jax.ShapeDtypeStruct((b, h, max_disp + w, c), fl.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ht, max_disp + w, c), fl.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(g)
    return dfl, dfr_pad[:, :, max_disp:, :]


def _corr_fwd_kernel(fl_ref, fr_hbm, out_ref, fr_scratch, sem):
    b, h, d = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    ht, w, c = fr_scratch.shape
    d_max = pl.num_programs(2)
    dma = pltpu.make_async_copy(
        fr_hbm.at[b, pl.ds(h * ht, ht), pl.ds(d_max - d, w), :],
        fr_scratch,
        sem,
    )
    dma.start()
    dma.wait()
    prod = fl_ref[0].astype(jnp.float32) * fr_scratch[:].astype(jnp.float32)
    corr = jnp.mean(prod, axis=-1)  # (ht, w)
    wiota = jax.lax.broadcasted_iota(jnp.int32, (ht, w), 1)
    out_ref[0, 0] = jnp.where(wiota >= d, corr, 0.0).astype(out_ref.dtype)


def _corr_fwd(fl: jax.Array, fr: jax.Array, max_disp: int) -> jax.Array:
    b, h, w, c = fl.shape
    ht = _pick_row_block(h, w, c, fl.dtype.itemsize)
    fr_pad = jnp.pad(fr, ((0, 0), (0, 0), (max_disp, 0), (0, 0)))
    grid = (b, h // ht, max_disp)
    out = pl.pallas_call(
        _corr_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, ht, w, c), lambda bi, hi, di: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ht, w), lambda bi, hi, di: (bi, di, hi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, max_disp, h, w), fl.dtype),
        scratch_shapes=[
            pltpu.VMEM((ht, w, c), fl.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(fl, fr_pad)
    return out[..., None]  # [B, D, H, W, 1] to match the jnp reference


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _cost_volume_concat_pallas(fl: jax.Array, fr: jax.Array, max_disp: int):
    return _concat_fwd(fl, fr, max_disp)


def _cv_fwd_rule(fl, fr, max_disp):
    return _concat_fwd(fl, fr, max_disp), (fl, fr)


_cost_volume_concat_pallas.defvjp(_cv_fwd_rule, _concat_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _cost_volume_corr_pallas(fl: jax.Array, fr: jax.Array, max_disp: int):
    return _corr_fwd(fl, fr, max_disp)


def _corr_fwd_rule(fl, fr, max_disp):
    return _corr_fwd(fl, fr, max_disp), (fl, fr)


def _corr_bwd_rule(max_disp, res, g):
    # backward via the jnp reference's VJP (XLA fuses it fine; the forward's
    # D-sweep DMA trick has no payoff in the scatter-shaped backward)
    from ecm_tpu.ops.cost_volume import cost_volume_correlation_jnp

    fl, fr = res
    _, vjp = jax.vjp(lambda a, b: cost_volume_correlation_jnp(a, b, max_disp), fl, fr)
    return vjp(g)


_cost_volume_corr_pallas.defvjp(_corr_fwd_rule, _corr_bwd_rule)


def cost_volume_pallas(
    fl: jax.Array, fr: jax.Array, max_disp: int, mode: str = "concat"
) -> jax.Array:
    """Pallas cost volume; exact-match vs the jnp reference is unit-tested."""
    if mode == "concat":
        return _cost_volume_concat_pallas(fl, fr, max_disp)
    if mode == "correlation":
        return _cost_volume_corr_pallas(fl, fr, max_disp)
    raise ValueError(f"unknown mode {mode!r}")
