"""Training loss (reference component M7, inline in ``main.py::train`` —
SURVEY.md 2.1).

Reference semantics: masked smooth-L1 over valid ground-truth pixels
(``mask = (gt > 0) & (gt < maxdisp)``), summed over the 3 hourglass stage
outputs with weights ``0.5 * L1 + 0.7 * L2 + 1.0 * L3`` (SURVEY.md M7;
weights flagged VERIFY there — kept configurable).

torch ``F.smooth_l1_loss`` (beta=1): ``0.5 x^2`` for |x|<1 else ``|x|-0.5``,
mean-reduced over masked elements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

STAGE_WEIGHTS = (0.5, 0.7, 1.0)


def smooth_l1(x: jax.Array, beta: float = 1.0) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def masked_smooth_l1(pred: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean smooth-L1 over ``mask``-valid pixels (0 if none valid)."""
    mask = mask.astype(jnp.float32)
    per_px = smooth_l1(pred.astype(jnp.float32) - gt.astype(jnp.float32))
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(per_px * mask) / denom


def valid_mask(gt: jax.Array, max_disp: int) -> jax.Array:
    """Reference validity mask: 0 < gt < maxdisp (0 encodes missing GT)."""
    return (gt > 0.0) & (gt < float(max_disp))


def stereo_loss(
    preds: list[jax.Array],
    gt: jax.Array,
    max_disp: int,
    weights: tuple[float, ...] = STAGE_WEIGHTS,
) -> jax.Array:
    """Weighted multi-stage masked smooth-L1 (single-stage: weight 1.0)."""
    mask = valid_mask(gt, max_disp)
    if len(preds) == 1:
        return masked_smooth_l1(preds[0], gt, mask)
    assert len(preds) == len(weights), (len(preds), weights)
    total = 0.0
    for w, p in zip(weights, preds):
        total = total + w * masked_smooth_l1(p, gt, mask)
    return total
