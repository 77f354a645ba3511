"""3D convolution lowering strategies (the aggregation hot path — SURVEY.md
3.4 hot-spot #1 and section 7 "hard parts": "XLA lowers conv3d acceptably but
layout matters ... keep the XLA-conv fallback switchable forever").

Profiling on the v5e chip showed the stacked-hourglass 3D convs at ~9 % MXU
utilization under XLA's native conv3d. ``impl="decomposed"`` re-expresses a
3x3x3 (pad 1) conv as three B*D-batched 2D 3x3 convs summed over D-shifts:

    out[:, d] = sum_dz conv2d(x[:, s*d + dz - 1], k[dz])     (zeros off-range)

2D convs hit XLA's most-tuned TPU path (batch = B*D keeps the MXU fed), and
the D-shift add is a fused elementwise op. Strides 1 and 2 are supported
(the only forms the model uses); anything else falls back to XLA.

Selection: ``impl="auto"`` reads ``ECM_TPU_CONV3D_IMPL`` (default
``decomposed``; set ``xla`` to force the native lowering).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _impl_from_env() -> str:
    return os.environ.get("ECM_TPU_CONV3D_IMPL", "decomposed")


def conv3d_xla(
    x: jax.Array, kernel: jax.Array, strides: tuple[int, int, int], padding
) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv3d_decomposed(
    x: jax.Array, kernel: jax.Array, strides: tuple[int, int, int]
) -> jax.Array:
    """3x3x3 pad-1 conv via 3 batched 2D convs + shifted-D sum.

    x: [B, D, H, W, Cin]; kernel: [3, 3, 3, Cin, Cout]; strides (s, s, s)
    with s in {1, 2}. Matches torch Conv3d(k=3, stride=s, padding=1)
    semantics exactly (tested vs the XLA path and the torch oracle).
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = kernel.shape
    assert kd == 3 and kh == 3 and kw == 3, kernel.shape
    s = strides[0]
    assert strides == (s, s, s) and s in (1, 2), strides

    x2 = x.reshape(b * d, h, w, cin)
    planes = []
    for dz in range(3):
        y = jax.lax.conv_general_dilated(
            x2,
            kernel[dz],
            window_strides=(s, s),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        planes.append(y.reshape(b, d, y.shape[1], y.shape[2], cout))

    d_out = (d + 2 - 3) // s + 1
    if s == 1:
        # out[d] = planes[0][d-1] + planes[1][d] + planes[2][d+1]
        z = jnp.zeros_like(planes[0][:, :1])
        out = (
            jnp.concatenate([z, planes[0][:, :-1]], axis=1)
            + planes[1]
            + jnp.concatenate([planes[2][:, 1:], z], axis=1)
        )
    else:
        # out[do] needs input plane s*do + dz - 1; pad D by 1 both sides and
        # take every s-th plane starting at dz.
        out = None
        for dz, y in enumerate(planes):
            yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            sel = yp[:, dz : dz + s * d_out : s]
            out = sel if out is None else out + sel
    return out.astype(x.dtype)


def conv3d(
    x: jax.Array,
    kernel: jax.Array,
    strides: tuple[int, int, int] = (1, 1, 1),
    padding=((1, 1), (1, 1), (1, 1)),
    impl: str = "auto",
) -> jax.Array:
    """Dispatching 3D conv. Falls back to XLA for shapes the decomposition
    does not cover (k != 3, pad != 1, stride not in {1, 2})."""
    if impl == "auto":
        impl = _impl_from_env()
    decomposable = (
        kernel.shape[:3] == (3, 3, 3)
        and tuple(padding) == ((1, 1), (1, 1), (1, 1))
        and strides[0] == strides[1] == strides[2]
        and strides[0] in (1, 2)
    )
    if impl == "decomposed" and decomposable:
        return conv3d_decomposed(x, kernel, strides)
    return conv3d_xla(x, kernel, strides, padding)
