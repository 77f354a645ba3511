"""Hand-scheduled disparity-axis sharding primitives (SURVEY.md 2.4/section 5
"cost-volume sharding — the workload's sequence-parallel analogue").

The production path lets GSPMD spatially partition the 3D convolutions from
the ``constrain_volume`` annotation (XLA inserts the halo exchanges). This
module is the explicit ``shard_map`` formulation of the same two collective
patterns, for the hand-scheduled path and as an executable specification:

- ``halo_exchange_d``: exchange +-halo slabs of a D-sharded ``[B, Dl, H, W,
  C]`` volume between ring neighbors via ``ppermute`` over ICI (3x3x3 convs
  need a +-1 halo along D; zero slabs at the range ends reproduce the
  unsharded conv's zero padding).
- ``softargmin_d_sharded``: soft-argmin over a D-sharded axis as the
  canonical two-pass collective: a global max (for a stable softmax), then a
  single fused ``psum`` of the (numerator, denominator) pair — each shard
  contributes sum(p_local) and sum(d_global * p_local).

Numerical equivalence with the unsharded ops is asserted in
tests/test_halo.py on the 8-fake-device mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as PS


def _ring_perm(n: int, shift: int) -> list[tuple[int, int]]:
    return [(i, (i + shift) % n) for i in range(n)]


def halo_exchange_d(vol: jax.Array, axis_name: str, halo: int = 1) -> jax.Array:
    """Pad a D-sharded local volume ``[B, Dl, H, W, C]`` with ``halo`` slabs
    from the ring neighbors (zeros at the global range ends).

    Must run inside ``shard_map`` with ``axis_name`` bound.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    lo_slab = vol[:, :halo]  # my lowest slabs -> neighbor below's high halo
    hi_slab = vol[:, -halo:]  # my highest slabs -> neighbor above's low halo
    # receive from the shard below (idx - 1): its hi_slab becomes my low halo
    from_below = jax.lax.ppermute(hi_slab, axis_name, _ring_perm(n, 1))
    # receive from the shard above (idx + 1): its lo_slab becomes my high halo
    from_above = jax.lax.ppermute(lo_slab, axis_name, _ring_perm(n, -1))
    zeros = jnp.zeros_like(lo_slab)
    low = jnp.where(idx == 0, zeros, from_below)
    high = jnp.where(idx == n - 1, zeros, from_above)
    return jnp.concatenate([low, vol, high], axis=1)


def conv3d_d_sharded(
    vol: jax.Array,
    kernel: jax.Array,
    mesh: Mesh,
    axis_name: str = "disp",
) -> jax.Array:
    """'VALID-in-D-after-halo' 3D convolution over a D-sharded volume.

    vol: global ``[B, D, H, W, Cin]`` sharded on D; kernel ``[3, 3, 3, Cin,
    Cout]``. Equivalent to unsharded SAME conv (stride 1): each shard halo-
    exchanges +-1 slab then convolves VALID along D, SAME along H/W.
    """

    def local(vol_l, kernel):
        padded = halo_exchange_d(vol_l, axis_name, halo=1)
        return jax.lax.conv_general_dilated(
            padded,
            kernel,
            window_strides=(1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(PS(None, axis_name), PS()),
        out_specs=PS(None, axis_name),
    )(vol, kernel)


def _softargmin_local(cost_l: jax.Array, axis_name: str) -> jax.Array:
    """Local two-pass soft-argmin body. cost_l: ``[B, Dl, H, W]``."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    dl = cost_l.shape[1]
    logits = -cost_l.astype(jnp.float32)
    # pass 1: global max for a stable softmax
    m = jax.lax.pmax(jnp.max(logits, axis=1, keepdims=True), axis_name)
    p = jnp.exp(logits - m)
    d_global = (idx * dl + jnp.arange(dl, dtype=jnp.float32))[None, :, None, None]
    # pass 2: one fused psum of (sum p, sum d*p)
    num_den = jnp.stack(
        [jnp.sum(d_global * p, axis=1), jnp.sum(p, axis=1)], axis=0
    )
    num_den = jax.lax.psum(num_den, axis_name)
    return num_den[0] / num_den[1]


def softargmin_d_sharded(
    cost: jax.Array, mesh: Mesh, axis_name: str = "disp"
) -> jax.Array:
    """Soft-argmin over a D-sharded ``[B, D, H, W]`` cost volume ->
    replicated ``[B, H, W]`` disparity."""
    return shard_map(
        functools.partial(_softargmin_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=PS(None, axis_name),
        out_specs=PS(),
    )(cost)
