"""4D cost-volume construction (reference component M2, SURVEY.md 2.1).

The reference (PSMNet-lineage ``models/stackhourglass.py`` forward, canonical
form) builds the volume with a Python loop of shifted-slice assignments::

    for d in range(maxdisp // 4):
        cost[:, :C,  d, :, d:] = fL[:, :, :, d:]
        cost[:, C:, d, :, d:] = fR[:, :, :, :W - d]

i.e. for output column ``w``: left feature at ``w`` paired with right feature
at ``w - d``; columns ``w < d`` are zero (both halves).

TPU-native design
-----------------
- Layout is channels-last ``[B, D, H, W, 2C]`` (NDHWC) so the volume feeds
  straight into XLA 3D convolutions with MXU-friendly minor dims.
- ``cost_volume_*_jnp``: pure-jnp reference (pad + static stack over D) — XLA
  fuses the D shifted pads into one kernel; used for tests and as the always-
  available fallback.
- The hand-written Pallas kernel lives in
  :mod:`ecm_tpu.ops.pallas_cost_volume`; it writes each output element exactly
  once and re-uses the left-feature block in VMEM across all disparities
  (grid order ``(b, h, d)``), so HBM traffic approaches the write-only bound.

Both a ``concat`` volume (PSMNet canon, ``[B, D, H, W, 2C]``) and a
``correlation`` (dot-product, DispNetC/FlowNet-style, ``[B, D, H, W, 1]``)
volume are supported — BASELINE.json:5 calls the reference layer a
"CUDA-style correlation layer" and the concat-vs-dot choice could not be
verified (SURVEY.md 2.1 M2), so both are first-class.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shifted_right(fr: jax.Array, d: int) -> jax.Array:
    """Right-image features shifted so column w holds fR[w - d] (zeros w < d)."""
    if d == 0:
        return fr
    w = fr.shape[2]
    return jnp.pad(fr, ((0, 0), (0, 0), (d, 0), (0, 0)))[:, :, :w, :]


def _column_mask(w: int, d: int, dtype) -> jax.Array:
    """[1, 1, W, 1] mask that zeroes columns w < d (reference leaves them 0)."""
    return (jnp.arange(w) >= d).astype(dtype)[None, None, :, None]


def cost_volume_concat_jnp(fl: jax.Array, fr: jax.Array, max_disp: int) -> jax.Array:
    """Concatenation cost volume. [B,H,W,C] x2 -> [B,D,H,W,2C].

    Exactly the reference shifted-slice-assignment semantics (module docstring)
    transposed to channels-last.
    """
    _, _, w, _ = fl.shape
    slices = []
    for d in range(max_disp):
        mask = _column_mask(w, d, fl.dtype)
        vol = jnp.concatenate([fl * mask, _shifted_right(fr, d)], axis=-1)
        slices.append(vol)
    return jnp.stack(slices, axis=1)


def cost_volume_correlation_jnp(
    fl: jax.Array, fr: jax.Array, max_disp: int
) -> jax.Array:
    """Dot-product (correlation) cost volume. [B,H,W,C] x2 -> [B,D,H,W,1].

    Mean over channels (FlowNet/DispNetC convention for correlation layers).
    """
    _, _, w, c = fl.shape
    slices = []
    for d in range(max_disp):
        mask = _column_mask(w, d, fl.dtype)
        corr = jnp.mean(fl * _shifted_right(fr, d), axis=-1, keepdims=True)
        slices.append(corr * mask)
    return jnp.stack(slices, axis=1)


def cost_volume_grouped_jnp(
    fl: jax.Array, fr: jax.Array, max_disp: int, mode: str = "concat"
) -> jax.Array:
    """Cost volume emitted directly in the disparity-folded (grouped) layout
    (``ecm_tpu.ops.grouped3d``): ``[B, D/G, H, W, G*2C]`` (concat) or
    ``[B, D/G, H, W, G]`` (correlation), plane ``d = G*dg + p`` in channel
    block ``p``.

    Equals ``to_grouped(cost_volume_*_jnp(...))`` element-for-element (tested)
    at the same HBM traffic as the standard builder — building grouped
    directly avoids the 4 ms full-volume relayout the aggregation stack would
    otherwise pay (benchmarks/CONV3D_PROBE.json "relayout_to_g4").
    """
    from ecm_tpu.ops.grouped3d import G

    _, _, w, _ = fl.shape
    assert max_disp % G == 0, (max_disp, G)
    slices = []
    for dg in range(max_disp // G):
        blocks = []
        for p in range(G):
            d = G * dg + p
            mask = _column_mask(w, d, fl.dtype)
            if mode == "concat":
                blocks.append(fl * mask)
                blocks.append(_shifted_right(fr, d))
            else:
                blocks.append(
                    jnp.mean(fl * _shifted_right(fr, d), axis=-1, keepdims=True)
                    * mask
                )
        slices.append(jnp.concatenate(blocks, axis=-1))
    return jnp.stack(slices, axis=1)


@functools.partial(
    jax.jit, static_argnames=("max_disp", "mode", "use_pallas", "grouped")
)
def cost_volume(
    fl: jax.Array,
    fr: jax.Array,
    max_disp: int,
    mode: str = "concat",
    use_pallas: bool = False,
    grouped: bool = False,
) -> jax.Array:
    """Build the 4D cost volume; dispatches jnp reference vs. Pallas kernel.

    Args:
      fl, fr: left/right feature maps ``[B, H, W, C]`` (channels-last, 1/4 res).
      max_disp: number of disparity hypotheses at feature resolution (D/4).
      mode: ``"concat"`` (PSMNet canon) or ``"correlation"`` (dot-product).
      use_pallas: route through the Pallas kernel (TPU) instead of pure jnp.
      grouped: emit the disparity-folded layout (``cost_volume_grouped_jnp``;
        takes precedence over ``use_pallas`` — the grouped aggregation path
        measures faster than any standard-layout path).
    """
    if grouped:
        if use_pallas and mode == "concat":
            from ecm_tpu.ops.pallas_cost_volume import (
                cost_volume_concat_grouped_pallas,
            )

            return cost_volume_concat_grouped_pallas(fl, fr, max_disp)
        return cost_volume_grouped_jnp(fl, fr, max_disp, mode=mode)
    if use_pallas:
        from ecm_tpu.ops.pallas_cost_volume import cost_volume_pallas

        return cost_volume_pallas(fl, fr, max_disp, mode=mode)
    if mode == "concat":
        return cost_volume_concat_jnp(fl, fr, max_disp)
    if mode == "correlation":
        return cost_volume_correlation_jnp(fl, fr, max_disp)
    raise ValueError(f"unknown cost-volume mode: {mode!r}")
