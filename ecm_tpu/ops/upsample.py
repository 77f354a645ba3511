"""Trilinear/bilinear upsampling (reference component M5 upsample path).

The reference calls ``F.upsample(cost, [maxdisp, H, W], mode='trilinear')``
(align_corners=False in modern torch). Implemented TPU-natively as
*separable interpolation-matrix contractions*: a linear resize along axis n
is ``out = M @ x`` with a static ``[n_out, n_in]`` half-pixel-center
edge-clamped weight matrix, so the whole upsample runs as dense matmuls on
the MXU instead of gathers. (Also sidesteps a jax 0.9 ``closed_call``
lowering-cache bug hit by ``jax.image.resize`` inside scanned graphs.)

Parity with torch ``F.interpolate(..., align_corners=False)`` is asserted in
tests/test_torch_parity.py. Only upsampling (scale >= 1) and identity are
supported — exactly the model's uses; downsampling would need the
anti-aliasing kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] linear-interp matrix, half-pixel centers, edge clamp."""
    assert n_out >= n_in, (n_in, n_out)  # upsample/identity only
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    m = np.zeros((n_out, n_in), dtype=np.float32)
    coords = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    x0 = np.floor(coords).astype(np.int64)
    frac = (coords - x0).astype(np.float32)
    lo = np.clip(x0, 0, n_in - 1)
    hi = np.clip(x0 + 1, 0, n_in - 1)
    rows = np.arange(n_out)
    np.add.at(m, (rows, lo), 1.0 - frac)
    np.add.at(m, (rows, hi), frac)
    return m


def _contract(x: jax.Array, axis: int, n_out: int) -> jax.Array:
    mat = jnp.asarray(_resize_matrix(x.shape[axis], n_out), x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.matmul(moved, mat.T)
    return jnp.moveaxis(out, -1, axis)


def upsample_trilinear(x: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Trilinearly resize the trailing-3 spatial dims of ``[B, D, H, W]``
    (f32 compute — this feeds the soft-argmin)."""
    x = x.astype(jnp.float32)
    for axis, n_out in zip((1, 2, 3), shape):
        if x.shape[axis] != n_out:
            x = _contract(x, axis, n_out)
    return x


def upsample_bilinear(x: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Bilinearly resize ``[B, H, W, C]`` to spatial ``shape`` (H, W),
    keeping the input dtype (feature-map path)."""
    for axis, n_out in zip((1, 2), shape):
        if x.shape[axis] != n_out:
            x = _contract(x, axis, n_out)
    return x
