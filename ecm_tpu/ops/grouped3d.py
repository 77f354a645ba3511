"""D-grouped ("disparity-folded") 3D convolution ops — the TPU-native layout
for the cost-aggregation stack (reference M4/M5, SURVEY.md 2.1; canonical
``models/stackhourglass.py`` 3D convs).

Why this exists: the model's 3D convs carry 32-64 channels, so in plain
NDHWC the MXU sees 32/128 output lanes and XLA's conv3d achieves ~6-11% of
peak (benchmarks/AGG_MICROBENCH.json: the dominant full-res 32->32 convs run
at 12 TF/s of a 197 TF/s chip). Folding G=4 consecutive disparity planes
into the channel dim — volume ``[B, D, H, W, C]`` -> ``[B, D/G, H, W, G*C]``
— presents 128 input/output lanes. A 3x3x3 conv becomes a 3x3x3 conv over
*plane groups* with a block-banded kernel (each output plane reads only its
3 neighbouring input planes, so 1/G of the fat kernel is nonzero and dense
FLOPs inflate xG), a trade measured decisively worth it on the v5e
(benchmarks/CONV3D_PROBE.json / CONV3D_PROBE2.json, git 099e664):

    dres_c  32->32 full-res:  26.9 ms (NDHWC xla)  -> 13.5 ms grouped
    dres0   64->32 full-res:  45.1 ms              -> 24.0 ms
    hg_conv1 32->64 stride-2: 14.0 ms              ->  8.4 ms
    hg_conv3 64->64 stride-2:  5.5 ms              ->  4.6 ms

The whole aggregation stack runs natively in this layout (relayout costs
4-7 ms per full-res tensor — benchmarks/CONV3D_PROBE.json "relayout_*" — so
per-layer conversion would eat the win): the cost volume is EMITTED grouped
(ecm_tpu.ops.cost_volume.cost_volume_grouped), every conv/BN/residual/
context-add operates grouped, and only the tiny per-stage classification
outputs (C=1) are un-grouped for the regression tail.

Transposed convs (the hourglass decoder) stay on the subpixel-phased path
(``ecm_tpu.ops.conv3d.conv_transpose3d_phased`` — already MXU-efficient via
its 8-phases-packed-along-Cout kernel): their *inputs* are un-grouped (cheap
at 1/8-res and 1/64-res), and ``conv_transpose3d_phased_grouped`` re-targets
only the final interleave transpose so the full-res output lands directly in
grouped layout (the D-phase bit and the input-plane parity bit become the
two low bits of the plane-within-group index) — same transpose class XLA
already handles well in the ungrouped impl, zero extra relayout.

G is fixed at 4 (4*32 = 128 = one lane tile; the deconv's grouped interleave
is inherently 2x2). Requires D % (4*G) == 0 at the stack top (the hourglass
encoder strides D by 2 twice and every level must stay group-divisible) —
true for every supported config (max_disp 192/256/384 -> D/4 = 48/64/96).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ecm_tpu.ops.conv3d import accum_dtype

G = 4  # fixed grouping factor: G * C(32) = 128 = TPU lane width


def to_grouped(x: jax.Array, g: int = G) -> jax.Array:
    """[B, D, H, W, C] -> [B, D/g, H, W, g*C]; plane d = g*dg + p maps to
    channel block p (channel index p*C + c)."""
    b, d, h, w, c = x.shape
    assert d % g == 0, (d, g)
    return (
        x.reshape(b, d // g, g, h, w, c)
        .transpose(0, 1, 3, 4, 2, 5)
        .reshape(b, d // g, h, w, g * c)
    )


def from_grouped(xg: jax.Array, g: int = G) -> jax.Array:
    """Inverse of :func:`to_grouped`."""
    b, dg, h, w, gc = xg.shape
    assert gc % g == 0, (gc, g)
    c = gc // g
    return (
        xg.reshape(b, dg, h, w, g, c)
        .transpose(0, 1, 4, 2, 3, 5)
        .reshape(b, dg * g, h, w, c)
    )


@functools.lru_cache(maxsize=None)
def _band_selector(g: int, stride: int) -> np.ndarray:
    """0/1 selector S[dg, p, q, dz]: grouped-kernel block (dg, p, q) takes
    canonical D-tap dz.

    stride 1: output plane o = g*go + q reads input i = g*(go + dg - 1) + p
              at dz = i - o + 1        = g*(dg - 1) + p - q + 1
    stride 2: output plane o = g*go + q reads input i = g*(2*go + dg - 1) + p
              at dz = i - 2*o + 1      = g*dg + p - 2*q - g + 1
    (both with torch pad=1 semantics; group-dim conv pad (1, 1)).
    """
    s = np.zeros((3, g, g, 3), dtype=np.float32)
    for dg in range(3):
        for p in range(g):
            for q in range(g):
                if stride == 1:
                    dz = g * (dg - 1) + p - q + 1
                else:
                    dz = g * dg + p - 2 * q - g + 1
                if 0 <= dz <= 2:
                    s[dg, p, q, dz] = 1.0
    return s


def grouped_kernel(k: jax.Array, g: int = G, stride: int = 1) -> jax.Array:
    """Expand a canonical [3, 3, 3, Cin, Cout] kernel to the block-banded
    grouped form [3, 3, 3, g*Cin, g*Cout] (group-window dim leading)."""
    kd, kh, kw, ci, co = k.shape
    assert kd == kh == kw == 3, k.shape
    sel = jnp.asarray(_band_selector(g, stride), dtype=k.dtype)
    # [dg,p,q,dz] x [dz,kh,kw,ci,co] -> [dg,kh,kw,p,ci,q,co]
    kg = jnp.einsum("dpqz,zhwio->dhwpiqo", sel, k)
    return kg.reshape(3, 3, 3, g * ci, g * co)


import os as _os

# Implementation policy, read ONCE at import (under jit the choice is baked
# into the cached trace, so a post-import env change would silently no-op —
# ADVICE r3). Values: "auto" (= measured full-model winner: banded), "halo",
# "banded". Per-call override via the ``impl=`` argument.
#
# Why banded everywhere (round-4 measurements, all on the real v5e):
# op-level, halo WINS every stride-1 shape 1.08-1.26x (HALO_PROBE.json — its
# kernel is 3/(g+2) dense vs 1/g) and LOSES the g4->g2 down conv 3.0x. But
# COMPOSED into the full model, halo stride-1 is a net loss: headline bench
# 17.93 pairs/s all-banded vs 15.86 halo-s1+banded-down vs 15.99 all-halo
# (BENCH_r03/r04 runs; spread < 1%). The standalone probe amortizes the
# slot_halo materialization differently than the real graph, where each conv
# sits between BN/ReLU producers and consumers and the extra (g+2)/g HBM
# copy per conv breaks XLA's epilogue fusion. Round-3 shipped
# halo-everywhere unmeasured and lost 11%; this default is the measured
# end-to-end winner, and the halo forms stay available (tested) for shapes
# where they might compose better.
_IMPL_DEFAULT = _os.environ.get("ECM_TPU_GROUPED_IMPL", "auto")


def _resolve_impl(impl: str | None, stride: int) -> str:
    mode = impl if impl is not None else _IMPL_DEFAULT
    if mode == "auto":
        return "banded"
    return mode


def grouped_conv3d(
    xg: jax.Array,
    k: jax.Array,
    stride: int = 1,
    g: int = G,
    impl: str | None = None,
) -> jax.Array:
    """3x3x3 pad-1 stride-``s`` conv on a grouped volume.

    xg: [B, D/g, H, W, g*Cin]; k: canonical [3, 3, 3, Cin, Cout].
    Returns [B, D'/g, H', W', g*Cout]. Exactly matches
    ``conv3d_xla(from_grouped(xg), k)`` (tests/test_grouped3d.py).

    ``impl``: None -> module default (see ``_IMPL_DEFAULT``); "auto" = the
    measured full-model winner (banded — module policy note);
    "halo"/"banded" force a specific form.
    """
    assert stride in (1, 2), stride
    if stride == 1 and _resolve_impl(impl, stride) == "halo":
        return grouped_conv3d_halo(xg, k, g)
    kg = grouped_kernel(k, g, stride)
    return jax.lax.conv_general_dilated(
        xg,
        kg,
        window_strides=(stride,) * 3,
        padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype(xg),
    ).astype(xg.dtype)


def slot_halo(xg: jax.Array, g: int = G, front_only: bool = False) -> jax.Array:
    """Append neighbour plane slots to the grouped channel dim.

    [B, Dg, H, W, g*C] -> [B, Dg, H, W, (g+2)*C] laid out as
    [prev-group-last-slot | g slots | next-group-first-slot], i.e. halo
    channel block p holds plane slot p-1 (so slots -1..g). Out-of-range
    groups contribute zeros — exactly the pad-1 D-boundary semantics of the
    canonical conv. ``front_only`` emits just [prev-last | g slots]
    (slots -1..g-1, (g+1)*C lanes) — all a stride-2 window ever reads.
    """
    b, dg, h, w, gc = xg.shape
    assert gc % g == 0, (gc, g)
    c = gc // g
    z = jnp.zeros_like(xg[:, :1, ..., :c])
    prev_last = jnp.concatenate([z, xg[:, :-1, ..., (g - 1) * c :]], axis=1)
    if front_only:
        return jnp.concatenate([prev_last, xg], axis=-1)
    next_first = jnp.concatenate([xg[:, 1:, ..., :c], z], axis=1)
    return jnp.concatenate([prev_last, xg, next_first], axis=-1)


@functools.lru_cache(maxsize=None)
def _halo_selector_s1(g: int) -> np.ndarray:
    """0/1 selector S[p, q, dz]: halo-kernel block (p -> out slot q) takes
    canonical D-tap dz. Out plane o = g*go + q reads plane o + dz - 1 =
    slot q + dz - 1 = halo index p = q + dz."""
    s = np.zeros((g + 2, g, 3), dtype=np.float32)
    for q in range(g):
        for dz in range(3):
            s[q + dz, q, dz] = 1.0
    return s


def halo_kernel_s1(k: jax.Array, g: int = G) -> jax.Array:
    """Expand a canonical [3, 3, 3, Cin, Cout] kernel to the halo form
    [3, 3, (g+2)*Cin, g*Cout] for a stride-1 2D conv on ``slot_halo`` input.

    Density is 3/(g+2) (vs 1/g for the 3-group-window banded form of
    :func:`grouped_kernel`): at g=4 the dense-FLOP inflation drops 4x -> 2x,
    at g=2 it drops 2x -> 4/3x — the MXU sees the same 128 output lanes
    either way. Measured 1.08-1.26x faster STANDALONE across the model's
    stride-1 shapes (benchmarks/HALO_PROBE.json) but a net loss composed
    into the full model (module policy note) — hence not the default."""
    kd, kh, kw, ci, co = k.shape
    assert kd == kh == kw == 3, k.shape
    sel = jnp.asarray(_halo_selector_s1(g), dtype=k.dtype)
    # [p,q,dz] x [dz,kh,kw,ci,co] -> [kh,kw,p,ci,q,co]
    kg = jnp.einsum("pqz,zhwio->hwpiqo", sel, k)
    return kg.reshape(3, 3, (g + 2) * ci, g * co)


def grouped_conv3d_halo(xg: jax.Array, k: jax.Array, g: int = G) -> jax.Array:
    """Stride-1 3x3x3 pad-1 conv on a grouped volume via the slot-halo form:
    one batched 2D conv whose input carries the two neighbour plane slots
    (see :func:`halo_kernel_s1`). Matches :func:`grouped_conv3d` exactly
    (tests/test_grouped3d.py)."""
    b, dg, h, w, gc = xg.shape
    xh = slot_halo(xg, g)
    kh2 = halo_kernel_s1(k, g)
    y = jax.lax.conv_general_dilated(
        xh.reshape(b * dg, h, w, xh.shape[-1]),
        kh2,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype(xg),
    )
    return y.reshape(b, dg, h, w, y.shape[-1]).astype(xg.dtype)


def grouped_conv3d_down_halo(xg: jax.Array, k: jax.Array, g_in: int = G) -> jax.Array:
    """Stride-2 conv g_in -> g_in/2 grouping via the (front-only) slot-halo
    form: out slot q (of g_in/2) reads input slots 2q-1..2q+1 = front-halo
    indices 2q..2q+2, all within one input group — so the group dim needs no
    window at all and the conv is a plain stride-2 batched 2D conv with a
    5/3-dense kernel (vs 8/3 for :func:`grouped_kernel_down`). Matches
    :func:`grouped_conv3d_down` exactly."""
    b, dg, h, w, gc = xg.shape
    ci = gc // g_in
    g_out = g_in // 2
    kd, kh, kw, _, co = k.shape
    assert kd == kh == kw == 3, k.shape
    xh = slot_halo(xg, g_in, front_only=True)
    sel = np.zeros((g_in + 1, g_out, 3), dtype=np.float32)
    for q in range(g_out):
        for dz in range(3):
            sel[2 * q + dz, q, dz] = 1.0
    kg = jnp.einsum("pqz,zhwio->hwpiqo", jnp.asarray(sel, k.dtype), k)
    kg = kg.reshape(3, 3, (g_in + 1) * ci, g_out * co)
    y = jax.lax.conv_general_dilated(
        xh.reshape(b * dg, h, w, xh.shape[-1]),
        kg,
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype(xg),
    )
    return y.reshape(b, dg, y.shape[1], y.shape[2], y.shape[-1]).astype(xg.dtype)


def grouped_kernel_down(k: jax.Array, g_in: int = G, g_out: int = G // 2) -> jax.Array:
    """Mixed-grouping stride-2 kernel: input grouped at ``g_in``, output
    grouped at ``g_out = g_in/2`` — the hourglass-ENCODER entry conv, which
    transitions the full-res g=4 (C=32) stack to the g=2 (C=64) interior
    (128 output lanes either side, but the interior pays only x2 dense-FLOP
    inflation instead of x4).

    Group counts are EQUAL in and out (D halves, g halves), so the group dim
    convolves at stride 1 with window 2 / pad (1, 0):
        out plane o = g_out*go + q reads in plane i = g_in*(go + dg - 1) + p
        at dz = i - 2*o + 1 = g_in*dg + p - 2*q - g_in + 1, kept iff 0<=dz<=2.
    Use with conv strides (1, 2, 2), padding ((1, 0), (1, 1), (1, 1)).
    """
    kd, kh, kw, ci, co = k.shape
    assert kd == kh == kw == 3, k.shape
    assert g_in == 2 * g_out, (g_in, g_out)
    sel = np.zeros((2, g_in, g_out, 3), dtype=np.float32)
    for dg in range(2):
        for p in range(g_in):
            for q in range(g_out):
                dz = g_in * dg + p - 2 * q - g_in + 1
                if 0 <= dz <= 2:
                    sel[dg, p, q, dz] = 1.0
    selj = jnp.asarray(sel, dtype=k.dtype)
    kg = jnp.einsum("dpqz,zhwio->dhwpiqo", selj, k)
    return kg.reshape(2, 3, 3, g_in * ci, g_out * co)


def grouped_conv3d_down(
    xg: jax.Array, k: jax.Array, g_in: int = G, impl: str | None = None
) -> jax.Array:
    """Stride-2 conv from a ``g_in``-grouped volume to a ``g_in/2``-grouped
    output (see :func:`grouped_kernel_down`). Matches
    ``conv3d_xla(from_grouped(xg, g_in), k, stride 2)`` re-grouped at g_in/2.
    Default (``impl="auto"``) is banded: despite the halo form's lower kernel
    density (5/3 vs 8/3), XLA runs the fat-input stride-2 2D conv at 2.8 TF/s
    vs banded's 8.5 — a measured 3.0x loss even standalone
    (benchmarks/HALO_PROBE.json "hg_down"), so halo is opt-in here."""
    if _resolve_impl(impl, stride=2) == "halo":
        return grouped_conv3d_down_halo(xg, k, g_in)
    kg = grouped_kernel_down(k, g_in, g_in // 2)
    return jax.lax.conv_general_dilated(
        xg,
        kg,
        window_strides=(1, 2, 2),
        padding=((1, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=accum_dtype(xg),
    ).astype(xg.dtype)


def conv_transpose3d_phased_grouped(
    x: jax.Array, kernel: jax.Array, out_groups: int = G
) -> jax.Array:
    """ConvTranspose3d(k=3, s=2, p=1, op=1) taking UNGROUPED input and
    emitting GROUPED output — the hourglass-decoder exit op.

    Identical math + phase-conv structure to
    ``ecm_tpu.ops.conv3d.conv_transpose3d_phased`` (one 2x2x2 VALID conv,
    all 8 subpixel phases packed along Cout); only the final interleave
    differs. ``out_groups=4``: output plane 2*d + rd with d = 2*dg' + s
    lands at plane-slot 2*s + rd of output group dg', i.e.

        out_g[b, dg', 2h+rh, 2w+rw, (2*s+rd)*C + c] = y[b, 2dg'+s, h, w, rd, rh, rw, c]

    ``out_groups=2``: groups are (input plane d), slot = rd:

        out_g[b, d, 2h+rh, 2w+rw, rd*C + c] = y[b, d, h, w, rd, rh, rw, c]

    x: [B, D, H, W, Cin] (D even for out_groups=4); kernel [3,3,3,Cin,Cout].
    out: [B, 2*D/out_groups, 2H, 2W, out_groups*Cout]
         (= to_grouped(ungrouped result, out_groups)).
    """
    from ecm_tpu.ops.conv3d import conv_transpose3d_phased  # tap convention ref

    b, d, h, w, cin = x.shape
    assert out_groups in (2, 4), out_groups
    assert out_groups == 2 or d % 2 == 0, d
    assert kernel.shape[:3] == (3, 3, 3), kernel.shape
    cout = kernel.shape[-1]

    def tap(r: int, p: int) -> int | None:
        # same probed convention as conv_transpose3d_phased
        if r == 0:
            return 1 if p == 0 else None
        return 0 if p == 0 else 2

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
    if out_groups == 4:
        y = y.reshape(b, d // 2, 2, h, w, 2, 2, 2, cout)
        #      dims:  0  1       2  3  4  5  6  7  8
        #             B  dg'     s  H  W  rd rh rw c
        out = jnp.transpose(y, (0, 1, 3, 6, 4, 7, 2, 5, 8)).reshape(
            b, d // 2, 2 * h, 2 * w, 4 * cout
        )
    else:
        y = y.reshape(b, d, h, w, 2, 2, 2, cout)
        #      dims:  0  1  2  3  4   5   6   7
        #             B  d  H  W  rd  rh  rw  c
        out = jnp.transpose(y, (0, 1, 2, 5, 3, 6, 4, 7)).reshape(
            b, d, 2 * h, 2 * w, 2 * cout
        )
    return out.astype(x.dtype)


def tile_channels(v: jax.Array, g: int = G) -> jax.Array:
    """Tile a per-channel vector [C] (BN scale/bias, conv bias, context map
    channels) to the grouped channel dim [g*C] (plane-slot-major layout)."""
    return jnp.tile(v, g)


def ungroup_cost(costg: jax.Array, g: int = G) -> jax.Array:
    """Grouped single-channel cost [B, D/g, H, W, g] -> [B, D, H, W]
    (classification-head exit into the regression tail)."""
    b, dg, h, w, gc = costg.shape
    assert gc == g, costg.shape
    return costg.transpose(0, 1, 4, 2, 3).reshape(b, dg * g, h, w)
