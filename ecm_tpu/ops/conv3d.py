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

``impl="packed"`` goes one step further: the three per-dz 2D convs run as a
SINGLE 2D conv with kernel ``[3, 3, Cin, 3*Cout]`` (the dz planes packed
along the output-channel axis), then the same shifted-D adds pick each dz
chunk. Why: the model's 3D convs have Cout in {1, 32, 64} — far below the
MXU's 128 output lanes — so three N=32 convs each waste 3/4 of the MXU's
output dimension; one N=96 conv fills 3/4 of it. Identical math (the packed
conv computes exactly the three chunk convs), ~identical HBM traffic, 3x
fewer conv dispatches.

Selection: ``impl="auto"`` reads ``ECM_TPU_CONV3D_IMPL`` if set, else the
measured per-shape policy in ``_auto_impl`` (see
``benchmarks/AGG_MICROBENCH.json`` for the numbers behind it).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _impl_from_env() -> str:
    return os.environ.get("ECM_TPU_CONV3D_IMPL", "auto")


def accum_dtype(x):
    """f32 MXU accumulation for f32 inputs; ``None`` (native dtype) for bf16.

    Why not always f32: this jax version cannot TRANSPOSE a mixed-dtype conv
    (VJP of conv(bf16, bf16)->f32 calls conv(f32 cotangent, bf16 kernel) and
    errors), so bf16 training forwards must emit bf16 — which is also the
    memory-lean AMP convention (the MXU still accumulates f32 internally;
    BN re-computes statistics in f32 downstream either way).
    """
    import jax.numpy as _jnp

    return _jnp.float32 if x.dtype == _jnp.float32 else None


def _auto_impl(cin: int, cout: int, stride: int) -> str:
    """Measured policy (benchmarks/AGG_MICROBENCH.json, v5e, 384x1248 d192):
    strided convs lower fastest through XLA's native conv3d (the decomposed
    forms re-pad and re-slice); stride-1 reduction convs (Cin >= 2*Cout, the
    dres0 64->32) win with the Cout-packed batched-2D form (+18% there);
    everything else is fastest native."""
    if stride == 1 and cin >= 2 * cout:
        return "packed"
    return "xla"


def conv3d_xla(
    x: jax.Array, kernel: jax.Array, strides: tuple[int, int, int], padding
) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype(x),
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
            preferred_element_type=accum_dtype(x),
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


def conv3d_packed(
    x: jax.Array, kernel: jax.Array, strides: tuple[int, int, int]
) -> jax.Array:
    """3x3x3 pad-1 conv via ONE B*D-batched 2D conv with the three dz kernel
    planes packed along Cout (module docstring: fills the MXU's output lanes
    when Cout < 128), then the shifted-D chunk adds.

    x: [B, D, H, W, Cin]; kernel: [3, 3, 3, Cin, Cout]; strides (s, s, s),
    s in {1, 2}. Exactly torch Conv3d(k=3, stride=s, padding=1) semantics.
    """
    b, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = kernel.shape
    assert kd == 3 and kh == 3 and kw == 3, kernel.shape
    s = strides[0]
    assert strides == (s, s, s) and s in (1, 2), strides

    x2 = x.reshape(b * d, h, w, cin)
    # [3(kh), 3(kw), Cin, 3(dz)*Cout]: chunk dz of the output is the 2D conv
    # of plane p with kernel[dz]
    kpack = jnp.concatenate([kernel[0], kernel[1], kernel[2]], axis=-1)
    y = jax.lax.conv_general_dilated(
        x2,
        kpack,
        window_strides=(s, s),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype(x),
    )
    ho, wo = y.shape[1], y.shape[2]
    y = y.reshape(b, d, ho, wo, 3, cout)

    d_out = (d + 2 - 3) // s + 1
    if s == 1:
        # out[do] = chunk0[do-1] + chunk1[do] + chunk2[do+1]
        z = jnp.zeros_like(y[:, :1, :, :, 0])
        out = (
            jnp.concatenate([z, y[:, :-1, :, :, 0]], axis=1)
            + y[:, :, :, :, 1]
            + jnp.concatenate([y[:, 1:, :, :, 2], z], axis=1)
        )
    else:
        # out[do] takes chunk dz from input plane s*do + dz - 1
        out = None
        for dz in range(3):
            yp = jnp.pad(y[:, :, :, :, dz], ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            sel = yp[:, dz : dz + s * d_out : s]
            out = sel if out is None else out + sel
    return out.astype(x.dtype)


def conv_transpose3d_phased(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """ConvTranspose3d(k=3, stride=2, padding=1, output_padding=1) — exact
    doubling — via subpixel phase decomposition.

    ``lax.conv_transpose`` lowers as a dense conv over the 2x-input-dilated
    volume: 7/8 of the dilated voxels are zeros, so ~87% of the MACs are
    wasted. Decomposed by output phase r in {0,1}^3:

        out[2i+r] = sum_j x[j] * k[(2i+r) - 2j + 1]   (per dim, pad-adjusted)

    the kernel tap index t = 2(i-j) + r + 1 must lie in {0,1,2}: phase r=0
    uses only t=1 (j=i), r=1 uses t in {0,2} (j in {i+1, i}). Each of the 8
    phases is then a tiny dense conv (kernel 1 or 2 per dim) at the INPUT
    resolution, and the results interleave to the doubled output — 3.375
    average taps per output voxel instead of 27 (8x fewer MACs). The 8 phase
    convs run as one 2D conv with all phases packed along Cout (same MXU
    lane-filling trick as ``conv3d_packed``).

    x: [B, D, H, W, Cin]; kernel: [3, 3, 3, Cin, Cout] in the SAME layout
    flax's nn.ConvTranspose uses (verified against it in tests).
    out: [B, 2D, 2H, 2W, Cout].
    """
    b, d, h, w, cin = x.shape
    assert kernel.shape[:3] == (3, 3, 3), kernel.shape
    cout = kernel.shape[-1]

    def tap(r: int, p: int) -> int | None:
        """Kernel tap index t for output phase r reading window position p
        (window = input positions i, i+1): out[2i+r] = sum_j x[j] k[t] with
        t = 2(j-i) + 1 - r (probed against lax.conv_transpose). Phase 0:
        only (p=0, t=1); phase 1: (p=0, t=0), (p=1, t=2)."""
        if r == 0:
            return 1 if p == 0 else None
        return 0 if p == 0 else 2

    # one 2x2x2 VALID conv on a trailing-padded input computes ALL phases,
    # packed along Cout (MXU lane-filling, as in conv3d_packed)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
    kparts = []
    for rd in (0, 1):
        for rh in (0, 1):
            for rw in (0, 1):
                kp = jnp.zeros((2, 2, 2, cin, cout), kernel.dtype)
                for pd in (0, 1):
                    td = tap(rd, pd)
                    if td is None:
                        continue
                    for ph in (0, 1):
                        th = tap(rh, ph)
                        if th is None:
                            continue
                        for pw in (0, 1):
                            tw = tap(rw, pw)
                            if tw is None:
                                continue
                            kp = kp.at[pd, ph, pw].set(kernel[td, th, tw])
                kparts.append(kp)
    kpack = jnp.concatenate(kparts, axis=-1)  # [2, 2, 2, Cin, 8*Cout]
    y = jax.lax.conv_general_dilated(
        xp,
        kpack,
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype(x),
    )  # [B, D, H, W, 8*Cout]
    y = y.reshape(b, d, h, w, 2, 2, 2, cout)
    # interleave: out[b, 2i+rd, 2j+rh, 2k+rw, c] = y[b, i, j, k, rd, rh, rw, c]
    out = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7)).reshape(
        b, 2 * d, 2 * h, 2 * w, cout
    )
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
    if impl == "auto":
        impl = _auto_impl(kernel.shape[3], kernel.shape[4], strides[0])
    if impl == "packed" and decomposable:
        return conv3d_packed(x, kernel, strides)
    if impl == "decomposed" and decomposable:
        return conv3d_decomposed(x, kernel, strides)
    return conv3d_xla(x, kernel, strides, padding)
