"""Trilinear/bilinear upsampling (reference component M5 upsample path).

The reference calls ``F.upsample(cost, [maxdisp, H, W], mode='trilinear')``
(align_corners=False in modern torch). ``jax.image.resize`` with
``method='trilinear'`` uses the same half-pixel-center convention, so the two
match; parity is asserted against the torch-CPU oracle in
``tests/test_torch_parity.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_trilinear(x: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Trilinearly resize the trailing-3 spatial dims of ``[B, D, H, W]``."""
    b = x.shape[0]
    out_shape = (b, *shape)
    return jax.image.resize(x.astype(jnp.float32), out_shape, method="trilinear")


def upsample_bilinear(x: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Bilinearly resize ``[B, H, W, C]`` to spatial ``shape`` (H, W)."""
    b, _, _, c = x.shape
    out_shape = (b, shape[0], shape[1], c)
    return jax.image.resize(x, out_shape, method="bilinear")
