"""Soft-argmin disparity regression (reference component M6, SURVEY.md 2.1).

Reference (``models/submodule.py::disparityregression``, canonical form)::

    p = softmax(-cost, dim=disparity)
    d_hat = sum_d d * p_d

Analytic properties used as unit tests (SURVEY.md section 4): a one-hot
(large negative) cost at disparity k regresses to exactly k; a uniform cost
regresses to (D - 1) / 2.

TPU-native notes: the softmax + expectation runs in float32 regardless of the
activation dtype (bf16 cost values would lose ~3 decimal digits in the
expectation over D=192). A fused Pallas version that combines the trilinear
D/H/W upsample with the softmax+expectation — avoiding materialising the
full-resolution [B, 192, H, W] volume in HBM — lives in
:mod:`ecm_tpu.ops.pallas_regression` (``fused_upsample_softargmin``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softargmin_jnp(cost: jax.Array, axis: int = 1) -> jax.Array:
    """Soft-argmin over ``axis`` of a cost volume (lower cost = more likely).

    Args:
      cost: e.g. ``[B, D, H, W]`` matching-cost volume.
      axis: the disparity axis.

    Returns:
      Expected disparity, ``cost.shape`` without ``axis``, float32.
    """
    cost = cost.astype(jnp.float32)
    p = jax.nn.softmax(-cost, axis=axis)
    d = cost.shape[axis]
    shape = [1] * cost.ndim
    shape[axis] = d
    idx = jnp.arange(d, dtype=jnp.float32).reshape(shape)
    return jnp.sum(p * idx, axis=axis)


def disparity_regression(cost: jax.Array, max_disp: int) -> jax.Array:
    """Full-resolution disparity from a ``[B, D, H, W]`` cost volume.

    ``max_disp`` is asserted against the volume's D axis — after trilinear
    upsampling the D axis is already the full disparity range.
    """
    assert cost.shape[1] == max_disp, (cost.shape, max_disp)
    return softargmin_jnp(cost, axis=1)
