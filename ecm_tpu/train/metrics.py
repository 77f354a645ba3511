"""Evaluation metrics (the reference computes these inline in the driver
scripts' eval loops — SURVEY.md 2.3 T1/T2; metric surface per BASELINE.json:2:
EPE + D1-all on SceneFlow / KITTI 2015).

- EPE: mean |pred - gt| over valid pixels.
- D1-all (KITTI 2015 headline): fraction of valid pixels with error > 3 px
  AND > 5 % of gt.
- k-px error rates (KITTI 2012 convention): error > k px, k in {1, 2, 3}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ecm_tpu.train.loss import valid_mask


def disparity_metrics(
    pred: jax.Array, gt: jax.Array, max_disp: int = 192
) -> dict[str, jax.Array]:
    """All metrics over valid pixels of a batch. Returns scalars (f32)."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = valid_mask(gt, max_disp).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    err = jnp.abs(pred - gt)

    def frac(cond):
        return jnp.sum(cond.astype(jnp.float32) * mask) / n

    d1 = frac((err > 3.0) & (err > 0.05 * gt))
    out = {
        "epe": jnp.sum(err * mask) / n,
        "d1_all": d1,
        "px1": frac(err > 1.0),
        "px2": frac(err > 2.0),
        "px3": frac(err > 3.0),
        "valid_px": jnp.sum(mask),
    }
    return out
