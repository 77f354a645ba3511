"""Pallas grouped stride-1 3D-conv kernel with fused BN/ReLU epilogue — the
round-4 hot-path kernel for the disparity-folded aggregation stack
(reference M4/M5 3D convs, SURVEY.md 2.1; TPU-native per the
BASELINE.json:5 mandate "3D conv aggregation -> fused Pallas kernels").

Why XLA is the wall here (measured, benchmarks/AGG_PROBE4.json): every XLA
formulation of the dominant full-res 32->32 grouped conv — banded 3D conv,
slot-halo 2D conv, feature-group dz-decomposition, window-split, explicit
dot9 — lands at 8-24 useful TF/s on the v5e (4-12% of peak). The banded
kernel wastes 4x dense FLOPs on its 1/g-dense blocks; the halo form wastes
2x but XLA's conv emitter runs it at only ~25% MXU.

What this kernel does differently:

- **The group dim is resident in VMEM per H-row** (``[Dg, W+pad, g*Cin]``),
  so the group-halo (the prev group's last slot / next group's first slot)
  is assembled by cheap in-VMEM shifts instead of an HBM-materialized
  (g+2)/g-wide copy (what the XLA halo form pays and what made it lose
  composed — ops/grouped3d.py policy note).
- **Split mid/edge MXU dots per spatial tap**: the own-slot contribution is
  ``[Dg*W, g*Cin] x [g*Cin, g*Cout]`` (K = 128 or 256 — exact K-tiles, no
  lane-concat of the input needed), plus a thin edge dot ``[Dg*W, 2*Cin] x
  [2*Cin, g*Cout]`` for the cross-group slots. Effective dense inflation
  1.5x at g=4/Cin=32 vs banded-XLA's padded 4x.
- **Rolling-window manual-DMA pipeline** (impl="roll", the default): grid
  over batch only; a 4-slot VMEM prefetch ring holds raw rows, each row is
  DMA'd from HBM exactly ONCE and its edge lanes built once — the achievable
  HBM bandwidth here is only ~200 GB/s (benchmarks/HBM_PROBE.json), so the
  3x input re-read of the simple 3-row-ref form (impl="refs", kept for
  comparison) costs more than the dots.
- **BN-affine + ReLU fused into the epilogue** while the accumulator is
  still in VMEM (the eval path folds BatchNorm running stats into a
  per-channel scale/bias — same folding as ECMAggregation._fold_convbn).
- Mosaic alignment: W is right-padded so padded width is a multiple of 8
  (sublane tiling); Cout=1 outputs (4 lanes) are NOT expressible as aligned
  output blocks — the classif exit conv stays on XLA.

Forward-only serving kernel: training keeps the XLA banded path (autodiff +
batch-stat BN). Parity vs the banded reference is exact up to dot order
(tests/test_pallas_gband.py; on-chip gate in benchmarks/run_tpu_checks.py).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecm_tpu.ops.grouped3d import halo_kernel_s1, tile_channels


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gband_kernel(
    r0,  # [1, Dg, 1, W+2, L] padded row h-1 (one batch element, all groups)
    r1,  # row h
    r2,  # row h+1
    kh_ref,  # [3, 3, K, N] halo-expanded kernel
    s_ref,  # [1, N] fused scale (f32)
    b_ref,  # [1, N] fused bias (f32)
    out_ref,  # [1, Dg, 1, W, N]
    *,
    cin: int,
    relu: bool,
    out_dtype,
):
    dg = r1.shape[1]
    w = out_ref.shape[3]  # true W (input is padded to an 8-aligned width)
    n = out_ref.shape[-1]
    acc = jnp.zeros((dg * w, n), jnp.float32)
    for dh, r in enumerate((r0, r1, r2)):
        x = r[0, :, 0]  # [Dg, W+2, L]
        z = jnp.zeros_like(x[:1])
        prev = jnp.concatenate([z, x[:-1]], axis=0)  # group dg-1 at index dg
        nxt = jnp.concatenate([x[1:], z], axis=0)  # group dg+1 at index dg
        xh = jnp.concatenate(
            [prev[..., -cin:], x, nxt[..., :cin]], axis=-1
        )  # [Dg, W+2, K]
        for dw in range(3):
            a = xh[:, dw : dw + w, :].reshape(dg * w, xh.shape[-1])
            acc = acc + jax.lax.dot_general(
                a,
                kh_ref[dh, dw],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y = acc * s_ref[0] + b_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[0, :, 0] = y.reshape(dg, w, n).astype(out_dtype)


# Kernel implementation, read once at import (jit bakes it into the trace):
# "roll" = rolling-window manual-DMA pipeline (1x HBM input traffic, split
# mid/edge dots, 4-slot prefetch ring); "refs" = 3-row-ref form (Pallas
# auto-pipelined, 3x input re-read). Measured (benchmarks/GBAND_BENCH.json +
# full-model bench runs): op-level they split wins (dres_c: roll 10.8 vs
# refs 10.9 ms; dres0_1: refs 15.1 vs roll 16.3) and the FULL MODEL is a
# statistical tie (roll 19.63 vs refs 19.60 pairs/s, spread ~0.1). Default
# "roll": equal measured perf at 1/3 the HBM input traffic (headroom as
# shapes grow), with an automatic "refs" fallback for W % 8 != 0.
_IMPL_DEFAULT = _os.environ.get("ECM_TPU_GBAND_IMPL", "roll")


@functools.partial(
    jax.jit,
    static_argnames=(
        "g", "relu", "interpret", "impl", "prepadded_w", "emit_padded",
        "add_padded",
    ),
)
def gband_conv_bn_s1(
    xg: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    g: int = 4,
    relu: bool = True,
    interpret: bool | None = None,
    impl: str | None = None,
    add: jax.Array | None = None,
    prepadded_w: int | None = None,
    emit_padded: bool = False,
    add_padded: bool = False,
) -> jax.Array:
    """Grouped stride-1 3x3x3 pad-1 conv + per-channel affine (+ ReLU).

    xg: [B, Dg, H, W, g*Cin]; kernel: canonical [3, 3, 3, Cin, Cout];
    scale, bias: [Cout] (the BN eval fold: y = conv(x)*scale + bias).
    ``add``: optional POST-activation addend fused into the epilogue —
    ``[B, Dg, H, W, g*Cout]`` (residual) or ``[B, 1, H, W, g*Cout]``
    (context map, broadcast over disparity groups); saves the separate
    full-volume HBM read-modify-write pass those adds otherwise cost.
    Returns [B, Dg, H, W, g*Cout]. Equals
    ``relu(grouped_conv3d(xg, kernel, 1, g) * tile(scale) + tile(bias))
    [+ add]``.

    Padded-flow mode (the dres-chain XLA pad passes cost ~1.5 ms/pair,
    AGG_TRACE.json ``jit(_pad)`` rows): ``prepadded_w=w`` declares xg is
    ALREADY in the kernel's padded form [B, Dg, H+2, Wp, L] (as produced by
    ``emit_padded=True``, zero borders); ``emit_padded=True`` writes the
    output in that same form (the kernel writes its own zero borders) so
    the next chained call skips its pad pass. ``add_padded`` declares the
    ``add`` tensor is in padded form too. Roll-impl only; the refs
    fallback pads/slices at XLA level for interface compatibility.
    """
    if prepadded_w is not None:
        b, dg, hp2, wp_in, l = xg.shape
        w, h = prepadded_w, hp2 - 2
        assert wp_in == w + 2 + ((-(w + 2)) % 8), (wp_in, w)
    else:
        b, dg, h, w, l = xg.shape
    kd, kh_, kw, cin, cout = kernel.shape
    assert kd == kh_ == kw == 3, kernel.shape
    assert l == g * cin, (l, g, cin)
    n = g * cout

    khalo = halo_kernel_s1(kernel, g).reshape(3, 3, (g + 2) * cin, n)
    st = tile_channels(scale.astype(jnp.float32), g).reshape(1, n)
    bt = tile_channels(bias.astype(jnp.float32), g).reshape(1, n)

    interp = _interpret() if interpret is None else interpret
    # right-pad W so the padded width is 8-aligned: Mosaic requires sublane
    # (second-minor) slice extents to be multiples of 8
    wpad = (-(w + 2)) % 8
    wp = w + 2 + wpad
    # the roll form's manual output DMA slices [Dg, W, N] rows: W (sublane)
    # must be 8-aligned; odd widths (e.g. W/8 = 156) fall back to "refs"
    if (impl or _IMPL_DEFAULT) == "roll" and w % 8 == 0:
        if prepadded_w is not None:
            xp = xg
        else:
            xp = jnp.pad(xg, ((0, 0), (0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
        km = khalo[:, :, cin : cin + l, :].astype(xg.dtype)
        ke = jnp.concatenate(
            [khalo[:, :, :cin, :], khalo[:, :, cin + l :, :]], axis=2
        ).astype(xg.dtype)
        has_add = add is not None
        inputs = [xp, km, ke, st, bt]
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)
        ] * 4
        ow = wp if emit_padded else w
        scratch = [
            pltpu.VMEM((4, dg, wp, l), xg.dtype),
            pltpu.VMEM((4, dg, wp, 2 * cin), xg.dtype),
            pltpu.VMEM((2, dg, ow, n), xg.dtype),
        ]
        sems = [pltpu.SemaphoreType.DMA((4,)), pltpu.SemaphoreType.DMA((2,))]
        if has_add:
            dga = add.shape[1]
            assert dga in (1, dg), (dga, dg)
            if add_padded:
                assert add.shape == (b, dga, h + 2, wp, n), add.shape
                aw = wp
            else:
                assert add.shape == (b, dga, h, w, n), add.shape
                aw = w
            inputs.append(add.astype(xg.dtype))
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            scratch.append(pltpu.VMEM((2, dga, aw, n), xg.dtype))
            sems.append(pltpu.SemaphoreType.DMA((2,)))
        out_shape = (
            (b, dg, h + 2, wp, n) if emit_padded else (b, dg, h, w, n)
        )
        return pl.pallas_call(
            functools.partial(
                _gband_roll_kernel,
                cin=cin,
                relu=relu,
                out_dtype=xg.dtype,
                has_add=has_add,
                true_w=w,
                emit_padded=emit_padded,
                add_padded=add_padded,
            ),
            grid=(b,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(out_shape, xg.dtype),
            scratch_shapes=scratch + sems,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interp,
        )(*inputs)
    # refs fallback: operate unpadded at XLA level, convert at the edges
    if prepadded_w is not None:
        xg = xg[:, :, 1 : 1 + h, 1 : 1 + w, :]
    if add is not None and add_padded:
        add = add[:, :, 1 : 1 + h, 1 : 1 + w, :]

    xp = jnp.pad(xg, ((0, 0), (0, 0), (1, 1), (1, 1 + wpad), (0, 0)))

    def row_spec(off):
        return pl.BlockSpec(
            (1, dg, 1, w + 2 + wpad, l),
            lambda bi, hi, _off=off: (bi, 0, hi + _off, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(
            _gband_kernel, cin=cin, relu=relu, out_dtype=xg.dtype
        ),
        grid=(b, h),
        in_specs=[
            row_spec(0),
            row_spec(1),
            row_spec(2),
            pl.BlockSpec(khalo.shape, lambda bi, hi: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(st.shape, lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bt.shape, lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, dg, 1, w, n),
            lambda bi, hi: (bi, 0, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, dg, h, w, n), xg.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interp,
    )(xp, xp, xp, khalo.astype(xg.dtype), st, bt)
    if add is not None:  # refs path: the add stays an XLA epilogue
        out = (out.astype(jnp.float32) + add.astype(jnp.float32)).astype(xg.dtype)
    if emit_padded:  # interface compatibility with the roll padded flow
        out = jnp.pad(out, ((0, 0), (0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
    return out


def _gband_roll_kernel(
    x_hbm,  # [B, Dg, H+2, W+pad, L] in HBM/ANY (pre-padded H/W, zeros)
    km_ref,  # [3, 3, L, N] mid kernel (own slots)
    ke_ref,  # [3, 3, 2*Cin, N] edge kernel (prev-last | next-first slots)
    s_ref,  # [1, N]
    b_ref,  # [1, N]
    *rest,  # [add_hbm,] out_hbm, raw, edge, ob, [ab,] in_sem, out_sem, [add_sem]
    cin: int,
    relu: bool,
    out_dtype,
    has_add: bool,
    true_w: int,
    emit_padded: bool,
    add_padded: bool,
):
    if has_add:
        (
            add_hbm,  # [B, DgA, H, W, N] fused post-activation add (DgA = Dg|1)
            out_hbm,  # [B, Dg, H, W, N] in HBM/ANY ([.., H+2, Wp, N] padded)
            raw_ref,  # VMEM [4, Dg, W+pad, L] rolling raw rows (prefetch ring)
            edge_ref,  # VMEM [4, Dg, W+pad, 2*Cin] rolling edge rows
            ob_ref,  # VMEM [2, Dg, W|Wp, N] output staging
            ab_ref,  # VMEM [2, DgA, W|Wp, N] add-row staging
            in_sem,  # DMA sems (4,)
            out_sem,  # DMA sems (2,)
            add_sem,  # DMA sems (2,)
        ) = rest
    else:
        (out_hbm, raw_ref, edge_ref, ob_ref, in_sem, out_sem) = rest
        add_hbm = ab_ref = add_sem = None
    bi = pl.program_id(0)
    dg = raw_ref.shape[1]
    w = true_w
    wp = raw_ref.shape[2]
    n = ob_ref.shape[-1]
    h = out_hbm.shape[2] - (2 if emit_padded else 0)
    oro = 1 if emit_padded else 0  # output row offset (padded border)
    aro = 1 if add_padded else 0

    def add_dma(r):
        return pltpu.make_async_copy(
            add_hbm.at[bi, :, r + aro], ab_ref.at[jax.lax.rem(r, 2)],
            add_sem.at[jax.lax.rem(r, 2)],
        )

    def in_dma(r):
        return pltpu.make_async_copy(
            x_hbm.at[bi, :, r], raw_ref.at[jax.lax.rem(r, 4)],
            in_sem.at[jax.lax.rem(r, 4)],
        )

    def out_dma(r):
        return pltpu.make_async_copy(
            ob_ref.at[jax.lax.rem(r, 2)], out_hbm.at[bi, :, r + oro],
            out_sem.at[jax.lax.rem(r, 2)],
        )

    def build_edge(r):
        s = jax.lax.rem(r, 4)
        x = raw_ref[s]  # [Dg, W+2, L]
        z = jnp.zeros_like(x[:1, :, :cin])
        prev_last = jnp.concatenate([z, x[:-1, :, -cin:]], axis=0)
        next_first = jnp.concatenate([x[1:, :, :cin], z], axis=0)
        edge_ref[s] = jnp.concatenate([prev_last, next_first], axis=-1)

    # prologue: rows 0..2 in flight; edges for rows 0, 1 built
    in_dma(0).start()
    in_dma(1).start()
    in_dma(2).start()
    if has_add:
        add_dma(0).start()
    in_dma(0).wait()
    build_edge(0)
    in_dma(1).wait()
    build_edge(1)

    def loop(i, _):
        # prefetch row i+3 FIRST so its DMA overlaps this iteration's compute
        # (4-slot ring: slot (i+3)%4 last held row i-1, consumed at iter i-1)
        @pl.when(i + 3 <= h + 1)
        def _():
            in_dma(i + 3).start()

        if has_add:

            @pl.when(i + 1 < h)
            def _():
                add_dma(i + 1).start()

        in_dma(i + 2).wait()
        build_edge(i + 2)
        acc = jnp.zeros((dg * w, n), jnp.float32)
        for dh in range(3):
            s = jax.lax.rem(i + dh, 4)
            xm = raw_ref[s]
            xe = edge_ref[s]
            for dw in range(3):
                am = xm[:, dw : dw + w, :].reshape(dg * w, xm.shape[-1])
                ae = xe[:, dw : dw + w, :].reshape(dg * w, xe.shape[-1])
                acc = acc + jax.lax.dot_general(
                    am, km_ref[dh, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + jax.lax.dot_general(
                    ae, ke_ref[dh, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        y = acc * s_ref[0] + b_ref[0]
        if relu:
            y = jnp.maximum(y, 0.0)
        y = y.reshape(dg, w, n)
        if has_add and not add_padded:
            add_dma(i).wait()
            a = ab_ref[jax.lax.rem(i, 2)].astype(jnp.float32)  # [DgA, W, N]
            y = y + a  # DgA == Dg (residual) or 1 (ctx broadcast over groups)
        if emit_padded:
            # stage the row in padded form (zero borders); a padded add row
            # is applied after padding (its borders are zero by contract)
            y = jnp.concatenate(
                [
                    jnp.zeros((dg, 1, n), y.dtype),
                    y,
                    jnp.zeros((dg, wp - w - 1, n), y.dtype),
                ],
                axis=1,
            )
        if has_add and add_padded:
            add_dma(i).wait()
            a = ab_ref[jax.lax.rem(i, 2)].astype(jnp.float32)  # [DgA, Wp, N]
            if not emit_padded:
                # unpadded output + padded addend: take the interior columns
                # (static misaligned sublane slice — one in-VMEM relayout,
                # still cheaper than an XLA-level slice pass of the addend)
                a = a[:, 1 : 1 + w]
            y = y + a

        @pl.when(i >= 2)
        def _():
            out_dma(i - 2).wait()

        ob_ref[jax.lax.rem(i, 2)] = y.astype(out_dtype)
        out_dma(i).start()
        return 0

    jax.lax.fori_loop(0, h, loop, 0)
    # drain the last (up to) two output DMAs
    @pl.when(h >= 2)
    def _():
        out_dma(h - 2).wait()

    out_dma(h - 1).wait()
    if emit_padded:
        # zero border rows 0 and H+1 of the padded output
        ob_ref[0] = jnp.zeros_like(ob_ref[0])
        top = pltpu.make_async_copy(ob_ref.at[0], out_hbm.at[bi, :, 0],
                                    out_sem.at[0])
        bot = pltpu.make_async_copy(ob_ref.at[0], out_hbm.at[bi, :, h + 1],
                                    out_sem.at[1])
        top.start()
        bot.start()
        top.wait()
        bot.wait()


@functools.lru_cache(maxsize=None)
def _down_own_selector() -> "object":
    """One-hot S[s, q, dz] over the down conv's OWN-slot map (g4 in -> g2
    out): out slot q=0 reads in slots 0,1 at dz 1,2 (slot -1 = prev-group
    slot 3 -> edge, dz 0); q=1 reads slots 1,2,3 at dz 0,1,2."""
    import numpy as np

    s = np.zeros((4, 2, 3), np.float32)
    for q, pairs in {0: [(0, 1), (1, 2)], 1: [(1, 0), (2, 1), (3, 2)]}.items():
        for slot, dz in pairs:
            s[slot, q, dz] = 1.0
    return s


def _expand_down_kernels(k: jax.Array, cin: int, cout: int):
    """Expand canonical [3,3,3,cin,cout] (k[dz,dh,dw]) into the four dot
    kernels of the down kernel. K layouts: kmid01 [3(dh), p*4cin+s*cin+ci,
    q*cout+co] (p = super-column parity = dw tap 0/1); kmid2 same without p
    (dw=2); kedge01/kedge2 carry the prev-group slot-3 (q=0, dz=0) term."""
    sel = jnp.asarray(_down_own_selector(), k.dtype)  # [s, q, dz]
    # k[dz, dh, dw, ci, co]
    kmid = jnp.einsum("sqz,zhwio->hwsiqo", sel, k)  # [3, 3(dw), 4, ci, 2, co]
    kmid01 = (
        kmid[:, :2]  # dw taps 0, 1 -> parity p
        .transpose(0, 1, 2, 3, 4, 5)
        .reshape(3, 2 * 4 * cin, 2 * cout)
    )
    kmid2 = kmid[:, 2].reshape(3, 4 * cin, 2 * cout)
    k0 = k[0]  # [3(dh), 3(dw), ci, co] — the dz=0 tap (edge term)
    ke01 = jnp.concatenate([k0[:, 0], k0[:, 1]], axis=1)  # [3, 2cin, cout]
    kedge01 = jnp.pad(ke01, ((0, 0), (0, 0), (0, cout)))  # q=1 block zero
    kedge2 = jnp.pad(k0[:, 2], ((0, 0), (0, 0), (0, cout)))
    return kmid01, kmid2, kedge01, kedge2


def _gband_down_kernel(
    x_hbm,  # [B, Dg, H+2, Wp, L] padded (H by 1/1, W by 1 left + zeros right)
    km01_ref,  # [3, 2L, N]
    km2_ref,  # [3, L, N]
    ke01_ref,  # [3, 2*cin, N]
    ke2_ref,  # [3, cin, N]
    s_ref,  # [1, N]
    b_ref,  # [1, N]
    out_hbm,  # [B, Dg, H/2, W2p, N] (W2p = Wp/2 - 1; caller slices to W/2)
    raw_ref,  # VMEM [5, Dg, Wp, L] rolling input rows
    ob_ref,  # VMEM [2, Dg, W2p, N]
    in_sem,  # DMA sems (5,)
    out_sem,  # DMA sems (2,)
    *,
    cin: int,
    relu: bool,
    out_dtype,
):
    bi = pl.program_id(0)
    dg = raw_ref.shape[1]
    wp = raw_ref.shape[2]
    l = raw_ref.shape[3]
    w2p = ob_ref.shape[2]
    n = ob_ref.shape[-1]
    h2 = out_hbm.shape[2]

    def in_dma(r):
        return pltpu.make_async_copy(
            x_hbm.at[bi, :, r], raw_ref.at[jax.lax.rem(r, 5)],
            in_sem.at[jax.lax.rem(r, 5)],
        )

    def out_dma(r):
        return pltpu.make_async_copy(
            ob_ref.at[jax.lax.rem(r, 2)], out_hbm.at[bi, :, r],
            out_sem.at[jax.lax.rem(r, 2)],
        )

    in_dma(0).start()
    in_dma(1).start()
    in_dma(2).start()
    in_dma(0).wait()

    def loop(i, _):
        # max row ever USED (and waited) is padded row 2*h2 = H; starting
        # anything beyond would leave a signaled semaphore for the next
        # grid step to trip over
        @pl.when(2 * i + 3 <= h2 * 2)
        def _():
            in_dma(2 * i + 3).start()

        @pl.when(2 * i + 4 <= h2 * 2)
        def _():
            in_dma(2 * i + 4).start()

        in_dma(2 * i + 1).wait()
        in_dma(2 * i + 2).wait()

        acc = jnp.zeros((dg * w2p, n), jnp.float32)
        for dh in range(3):
            x = raw_ref[jax.lax.rem(2 * i + dh, 5)]  # [Dg, Wp, L]
            xs = x.reshape(dg, wp // 2, 2 * l)  # super-columns (free bytes)
            z = jnp.zeros_like(xs[:1])
            xprev = jnp.concatenate([z, xs[:-1]], axis=0)  # group dg-1
            a1 = xs[:, :w2p, :].reshape(dg * w2p, 2 * l)
            a2 = xs[:, 1 : w2p + 1, :l].reshape(dg * w2p, l)
            e1 = jnp.concatenate(
                [xprev[:, :w2p, l - cin : l], xprev[:, :w2p, 2 * l - cin :]],
                axis=-1,
            ).reshape(dg * w2p, 2 * cin)
            e2 = xprev[:, 1 : w2p + 1, l - cin : l].reshape(dg * w2p, cin)
            for a, kk in ((a1, km01_ref), (a2, km2_ref), (e1, ke01_ref), (e2, ke2_ref)):
                acc = acc + jax.lax.dot_general(
                    a, kk[dh], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        y = acc * s_ref[0] + b_ref[0]
        if relu:
            y = jnp.maximum(y, 0.0)

        @pl.when(i >= 2)
        def _():
            out_dma(i - 2).wait()

        ob_ref[jax.lax.rem(i, 2)] = y.reshape(dg, w2p, n).astype(out_dtype)
        out_dma(i).start()
        return 0

    jax.lax.fori_loop(0, h2, loop, 0)

    @pl.when(h2 >= 2)
    def _():
        out_dma(h2 - 2).wait()

    out_dma(h2 - 1).wait()


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def gband_down_conv_bn(
    xg: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    relu: bool = True,
    interpret: bool | None = None,
) -> jax.Array:
    """Grouped stride-2 3x3x3 pad-1 conv (g=4 in -> g=2 out) + BN affine
    (+ ReLU) — the hourglass-encoder entry conv, rolling-DMA Pallas kernel.

    xg: [B, Dg, H, W, 4*Cin]; kernel: canonical [3, 3, 3, Cin, Cout];
    scale/bias: [Cout]. Returns [B, Dg, H/2, W/2, 2*Cout]. Equals
    ``relu(grouped_conv3d_down(xg, kernel, 4) * tile(scale,2) +
    tile(bias,2))`` (tests/test_pallas_gband.py). Spatial stride 2 is
    expressed by viewing each row's (W, L) bytes as (W/2, 2L) super-columns,
    so the even/odd taps become lane slices and no strided access exists;
    the input is streamed once (5-slot ring, 2 rows per output row).
    """
    b, dg, h, w, l = xg.shape
    kd, kh_, kw, cin, cout = kernel.shape
    assert kd == kh_ == kw == 3, kernel.shape
    assert l == 4 * cin, (l, cin)
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    n = 2 * cout
    h2, w2 = h // 2, w // 2

    interp = _interpret() if interpret is None else interpret
    km01, km2, ke01, ke2 = _expand_down_kernels(kernel, cin, cout)
    st = tile_channels(scale.astype(jnp.float32), 2).reshape(1, n)
    bt = tile_channels(bias.astype(jnp.float32), 2).reshape(1, n)

    # padded width: 1 left + right zeros. Constraints: W2p (output staging
    # width) 8-aligned; Wp/2 >= W2p+1 (the dw=2 tap reads one super-column
    # ahead); Wp itself 8-aligned (full-row DMA slices).
    w2p = -(-(w2 + 1) // 8) * 8  # ceil to 8, >= w2+1 garbage tail
    wp = -(-(2 * (w2p + 1)) // 8) * 8
    xp = jnp.pad(xg, ((0, 0), (0, 0), (1, 1), (1, wp - w - 1), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _gband_down_kernel, cin=cin, relu=relu, out_dtype=xg.dtype
        ),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, dg, h2, w2p, n), xg.dtype),
        scratch_shapes=[
            pltpu.VMEM((5, dg, wp, l), xg.dtype),
            pltpu.VMEM((2, dg, w2p, n), xg.dtype),
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interp,
    )(
        xp,
        km01.astype(xg.dtype),
        km2.astype(xg.dtype),
        ke01.astype(xg.dtype),
        ke2.astype(xg.dtype),
        st,
        bt,
    )
    return out[:, :, :, :w2, :]


def _gband_classif_kernel(
    x_hbm,  # [B, Dg, H+2, Wr, L] padded input (zeros, as roll kernel)
    km1_ref,  # [3, 3, L, L] conv1 mid kernel
    ke1_ref,  # [3, 3, 2*cin, L] conv1 edge kernel
    s1_ref,  # [1, L] conv1 fused BN scale
    b1_ref,  # [1, L] conv1 fused BN bias
    km2_ref,  # [3, 16*L, 128] conv2 packed mid kernel (see caller)
    kl2_ref,  # [3, L, 128] conv2 mid boundary kernel (prev super-column)
    kr2_ref,  # [3, L, 128] conv2 mid boundary kernel (next super-column)
    ke2_ref,  # [3, 16*128, 128] conv2 packed edge kernel (K rows 2cin..127
    # of each column block zero — the edge buffer is 128-lane padded:
    # Mosaic can only merge sublanes into lanes from a 128-lane minor)
    el2_ref,  # [3, 128, 128] conv2 edge boundary (prev super-column)
    er2_ref,  # [3, 128, 128] conv2 edge boundary (next super-column)
    b2_ref,  # [1, 128] conv2 bias over packed lanes (s<4 real, else 0)
    out_hbm,  # [B, Dg, H, Wc, 128] packed cost (lane = 8*(w%16) + slot)
    raw_ref,  # VMEM [4, Dg, Wr, L] rolling raw input rows
    edge_ref,  # VMEM [4, Dg, Wr, 2*cin] rolling input edge rows
    y1_ref,  # VMEM [4, Dg, W16, L] rolling conv1-OUTPUT rows (post BN+ReLU)
    y1e_ref,  # VMEM [4, Dg, W16, 128] rolling conv1-output edge rows
    # (lanes: prev_last cin | next_first cin | zero pad to 128)
    ob_ref,  # VMEM [2, Dg, Wc, 128] output staging
    in_sem,  # DMA sems (4,)
    out_sem,  # DMA sems (2,)
    *,
    cin: int,
    w: int,  # true output width (<= W16 = 16*Wc)
    out_dtype,
):
    """Classification-head cascade: conv1 (grouped stride-1 3^3 conv + BN
    fold + ReLU) and conv2 (grouped 3^3 conv Cout=1 + bias) computed
    back-to-back per H-row — the 32-channel intermediate NEVER leaves VMEM.
    Kills the two known losses of the XLA exit conv (round-4 verdict weak
    #1): the Cout=1 conv XLA runs at 0.9 TF/s, and the full-volume HBM
    round trip of the conv1 activation.

    conv2's 4-lane output is not MXU- or DMA-friendly (a <128-lane staging
    buffer cannot be DMA-sliced, and an N=4 dot wastes 97% of the MXU's
    columns), so its output is PACKED: 16 consecutive W columns x 8 slot
    lanes = one full 128-lane vector, computed by viewing each conv1 row as
    W16/16 super-columns of 16*L lanes and folding the dw taps into a
    block-banded packed kernel (3/16 dense -> ~2.7x fewer MXU cycles than
    the padded N=128 form, 16x less output DMA). The two cross-boundary
    taps (phase 0's dw=0, phase 15's dw=2) come from thin boundary dots on
    the neighbouring super-column."""
    bi = pl.program_id(0)
    dg = raw_ref.shape[1]
    w16 = y1_ref.shape[2]
    wc = ob_ref.shape[2]
    l = raw_ref.shape[3]
    h = out_hbm.shape[2]

    def in_dma(r):
        return pltpu.make_async_copy(
            x_hbm.at[bi, :, r], raw_ref.at[jax.lax.rem(r, 4)],
            in_sem.at[jax.lax.rem(r, 4)],
        )

    def out_dma(r):
        return pltpu.make_async_copy(
            ob_ref.at[jax.lax.rem(r, 2)], out_hbm.at[bi, :, r],
            out_sem.at[jax.lax.rem(r, 2)],
        )

    def build_edge(r):
        s = jax.lax.rem(r, 4)
        x = raw_ref[s]
        z = jnp.zeros_like(x[:1, :, :cin])
        prev_last = jnp.concatenate([z, x[:-1, :, -cin:]], axis=0)
        next_first = jnp.concatenate([x[1:, :, :cin], z], axis=0)
        edge_ref[s] = jnp.concatenate([prev_last, next_first], axis=-1)

    def conv1_row(j):
        """conv1 output row j (uses padded raw rows j..j+2, already built);
        stores post-activation into y1/y1e ring slot j%4. Columns >= w
        (the super-column garbage tail, fed by zero input so they'd hold
        relu(bias)) are zero-masked so conv2's packed taps see true
        W-boundary zero padding."""
        acc = jnp.zeros((dg * w16, l), jnp.float32)
        for dh in range(3):
            s = jax.lax.rem(j + dh, 4)
            xm = raw_ref[s]
            xe = edge_ref[s]
            for dw in range(3):
                am = xm[:, dw : dw + w16, :].reshape(dg * w16, l)
                ae = xe[:, dw : dw + w16, :].reshape(dg * w16, 2 * cin)
                acc = acc + jax.lax.dot_general(
                    am, km1_ref[dh, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = acc + jax.lax.dot_general(
                    ae, ke1_ref[dh, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        y = jnp.maximum(acc * s1_ref[0] + b1_ref[0], 0.0)
        y = y.reshape(dg, w16, l)
        if w16 > w:
            col = jax.lax.broadcasted_iota(jnp.int32, (dg, w16, l), 1)
            y = jnp.where(col < w, y, 0.0)
        y = y.astype(out_dtype)
        sj = jax.lax.rem(j, 4)
        y1_ref[sj] = y
        z = jnp.zeros_like(y[:1, :, :cin])
        prev_last = jnp.concatenate([z, y[:-1, :, -cin:]], axis=0)
        next_first = jnp.concatenate([y[1:, :, :cin], z], axis=0)
        zpad = jnp.zeros((dg, w16, 128 - 2 * cin), y.dtype)
        y1e_ref[sj] = jnp.concatenate([prev_last, next_first, zpad], axis=-1)

    def zero_y1(slot):
        y1_ref[slot] = jnp.zeros_like(y1_ref[0])
        y1e_ref[slot] = jnp.zeros_like(y1e_ref[0])

    # prologue: 4 raw rows in flight; rows 0-2 waited+built; y1 row 0
    # computed (row i+1 is computed inside iteration i — raw row 3 is
    # waited there); the virtual y1 row -1 (conv2's top H zero-pad) =
    # zeroed ring slot 3
    in_dma(0).start()
    in_dma(1).start()
    in_dma(2).start()
    in_dma(3).start()
    in_dma(0).wait()
    build_edge(0)
    in_dma(1).wait()
    build_edge(1)
    in_dma(2).wait()
    build_edge(2)
    zero_y1(3)
    conv1_row(0)

    def loop(i, _):
        # prefetch raw row i+4 FIRST (slot (i+4)%4 held row i, dead now:
        # conv1 row i+1 this iteration reads raw i+1..i+3)
        @pl.when(i + 4 <= h + 1)
        def _():
            in_dma(i + 4).start()

        # conv1 row i+1 (rows 0..h-1 exist; i+1 == h -> zero slot instead:
        # the virtual y1 row h is conv2's bottom H zero-pad)
        @pl.when(i + 1 < h)
        def _():
            in_dma(i + 3).wait()
            build_edge(i + 3)
            conv1_row(i + 1)

        @pl.when(i + 1 == h)
        def _():
            zero_y1(jax.lax.rem(i + 1, 4))

        # conv2 cost row i from y1 rows i-1, i, i+1, packed super-columns
        acc = jnp.zeros((dg * wc, 128), jnp.float32)
        for dh in range(3):
            # +3 ≡ -1 (mod 4): lax.rem is C-style (sign of dividend), so
            # rem(i-1+dh, 4) at i=0 would be -1 — an OOB VMEM read on chip
            # (interpret mode wraps it to slot 3 and hides the bug)
            s = jax.lax.rem(i + 3 + dh, 4)
            ys = y1_ref[s].reshape(dg, wc, 16 * l)  # super-columns
            es = y1e_ref[s].reshape(dg, wc, 16 * 128)
            zy = jnp.zeros_like(ys[:, :1])
            ze = jnp.zeros_like(es[:, :1])
            # prev super-column's LAST column / next's FIRST column (the
            # W zero-pad falls out of the zero rows at both ends)
            yl = jnp.concatenate([zy, ys[:, :-1]], axis=1)[..., 15 * l :]
            yr = jnp.concatenate([ys[:, 1:], zy], axis=1)[..., :l]
            el = jnp.concatenate([ze, es[:, :-1]], axis=1)[..., 15 * 128 :]
            er = jnp.concatenate([es[:, 1:], ze], axis=1)[..., :128]
            for a, kk in (
                (ys, km2_ref),
                (yl, kl2_ref),
                (yr, kr2_ref),
                (es, ke2_ref),
                (el, el2_ref),
                (er, er2_ref),
            ):
                acc = acc + jax.lax.dot_general(
                    a.reshape(dg * wc, a.shape[-1]),
                    kk[dh],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        cost = acc + b2_ref[0]

        @pl.when(i >= 2)
        def _():
            out_dma(i - 2).wait()

        ob_ref[jax.lax.rem(i, 2)] = cost.reshape(dg, wc, 128).astype(out_dtype)
        out_dma(i).start()
        return 0

    jax.lax.fori_loop(0, h, loop, 0)

    @pl.when(h >= 2)
    def _():
        out_dma(h - 2).wait()

    out_dma(h - 1).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def gband_classif_head(
    xg: jax.Array,
    k1: jax.Array,
    scale1: jax.Array,
    bias1: jax.Array,
    k2: jax.Array,
    bias2: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused grouped classification head (reference classif_N: convbn_3d
    C->C + ReLU, then conv3d C->1 with bias — SURVEY.md 2.1 M5).

    xg: [B, Dg, H, W, 4*C]; k1: [3,3,3,C,C]; scale1/bias1: [C] (BN eval
    fold); k2: [3,3,3,C,1]; bias2: [1]. Returns the grouped cost
    [B, Dg, H, W, 4] == ``grouped_conv3d(relu(grouped_conv3d(xg, k1)*s+b),
    k2) + bias2`` (tests/test_pallas_gband.py; on-chip gate
    benchmarks/run_tpu_checks.py). Any W works: conv2's output is packed
    16 columns x 8 slot lanes per 128-lane super-column (kernel doc), with
    W padded up to 128*ceil(W/128) internally (the staging buffer's
    super-column dim must be 8-aligned for the rolling output DMA).
    """
    b, dg, h, w, l = xg.shape
    kd, kh_, kw, cin, cout = k1.shape
    assert kd == kh_ == kw == 3 and cout == cin and l == 4 * cin, (k1.shape, l)
    assert k2.shape == (3, 3, 3, cin, 1), k2.shape

    khalo1 = halo_kernel_s1(k1, 4).reshape(3, 3, 6 * cin, l)
    km1 = khalo1[:, :, cin : cin + l, :].astype(xg.dtype)
    ke1 = jnp.concatenate(
        [khalo1[:, :, :cin, :], khalo1[:, :, cin + l :, :]], axis=2
    ).astype(xg.dtype)
    s1 = tile_channels(scale1.astype(jnp.float32), 4).reshape(1, l)
    b1 = tile_channels(bias1.astype(jnp.float32), 4).reshape(1, l)

    # conv2 packed kernels: lane n = 8*phase + slot (phase = w % 16)
    khalo2 = jnp.pad(
        halo_kernel_s1(k2, 4).reshape(3, 3, 6 * cin, 4), ((0, 0),) * 3 + ((0, 4),)
    )  # slot lanes 4 -> 8 (zero)
    km2h = khalo2[:, :, cin : cin + l, :]  # [3, 3, L, 8]
    ke2h = jnp.pad(
        jnp.concatenate(
            [khalo2[:, :, :cin, :], khalo2[:, :, cin + l :, :]], axis=2
        ),
        ((0, 0), (0, 0), (0, 128 - 2 * cin), (0, 0)),
    )  # [3, 3, 128, 8] (K rows 2cin..127 zero: 128-lane-padded edge buffer)
    # T[dw, phase, psi] = 1 iff input column psi == phase + dw - 1 (within
    # the same super-column); the two out-of-range taps are the boundary dots
    phase = jnp.arange(16)
    T = (phase[None, :, None] + jnp.arange(3)[:, None, None] - 1
         == phase[None, None, :]).astype(km2h.dtype)

    def pack(kh):  # [3, 3, K, 8] -> main [3, 16K, 128], left/right [3, K, 128]
        kdim = kh.shape[2]
        main = jnp.einsum("wfp,dwls->dplfs", T, kh).reshape(3, 16 * kdim, 128)
        left = jnp.einsum(
            "f,dls->dlfs", (phase == 0).astype(kh.dtype), kh[:, 0]
        ).reshape(3, kdim, 128)
        right = jnp.einsum(
            "f,dls->dlfs", (phase == 15).astype(kh.dtype), kh[:, 2]
        ).reshape(3, kdim, 128)
        return main, left, right

    km2, kl2, kr2 = (a.astype(xg.dtype) for a in pack(km2h))
    ke2, el2, er2 = (a.astype(xg.dtype) for a in pack(ke2h))
    b2 = jnp.tile(
        jnp.pad(jnp.tile(bias2.astype(jnp.float32), 4), (0, 4)), 16
    ).reshape(1, 128)

    interp = _interpret() if interpret is None else interpret
    # super-column count 8-aligned (rolling output DMA) -> W16 = 128*k
    wc = -(-(-(-w // 16)) // 8) * 8
    w16 = 16 * wc
    wr = w16 + 2 + ((-(w16 + 2)) % 8)  # raw-row width, 8-aligned
    xp = jnp.pad(xg, ((0, 0), (0, 0), (1, 1), (1, wr - w - 1), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _gband_classif_kernel, cin=cin, w=w, out_dtype=xg.dtype
        ),
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, dg, h, wc, 128), xg.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, dg, wr, l), xg.dtype),
            pltpu.VMEM((4, dg, wr, 2 * cin), xg.dtype),
            pltpu.VMEM((4, dg, w16, l), xg.dtype),
            pltpu.VMEM((4, dg, w16, 128), xg.dtype),
            pltpu.VMEM((2, dg, wc, 128), xg.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interp,
    )(xp, km1, ke1, s1, b1, km2, kl2, kr2, ke2, el2, er2, b2)
    # [B, Dg, H, Wc, 128] -> [B, Dg, H, W16, 8] -> true W, 4 real slot lanes
    return out.reshape(b, dg, h, w16, 8)[:, :, :, :w, :4]


# ---------------------------------------------------------------------------
# Training-path custom VJP (round-4 verdict ask #1: training ran the XLA
# banded chain at MFU 0.14 vs eval's 0.277). Forward AND input-grad run the
# gband Pallas kernel (the input-grad of a stride-1 pad-1 3^3 conv is the
# same conv with a spatially-flipped, channel-transposed kernel — in the
# disparity-folded layout that is again a gband conv). The weight-grad keeps
# XLA's banded weight-grad formulation (all 27 taps in ONE pass over the
# activations; a per-tap dot scheme would re-read the 100 MB volume 27x).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gband_conv_s1(xg: jax.Array, k: jax.Array, g: int = 4) -> jax.Array:
    """Pure grouped stride-1 3x3x3 pad-1 conv (no BN fold, no ReLU) with a
    hand-written VJP — the training-path counterpart of
    :func:`gband_conv_bn_s1`. Equals ``grouped_conv3d(xg, k, 1, g)``
    (tests/test_pallas_gband.py parity incl. grads vs XLA autodiff)."""
    cout = k.shape[-1]
    one = jnp.ones((cout,), jnp.float32)
    zero = jnp.zeros((cout,), jnp.float32)
    return gband_conv_bn_s1(xg, k, one, zero, g=g, relu=False)


def _gband_conv_s1_fwd(xg, k, g):
    return gband_conv_s1(xg, k, g), (xg, k)


def _gband_conv_s1_bwd(g, res, dy):
    from jax import lax

    from ecm_tpu.ops.grouped3d import _band_selector

    xg, k = res
    ci, co = k.shape[3], k.shape[4]
    # input grad: same folded conv, kernel flipped in (dz, dh, dw) and
    # transposed in (cin, cout)
    k_rev = jnp.flip(k, axis=(0, 1, 2)).swapaxes(3, 4)
    one = jnp.ones((ci,), jnp.float32)
    zero = jnp.zeros((ci,), jnp.float32)
    dx = gband_conv_bn_s1(dy, k_rev, one, zero, g=g, relu=False)

    # weight grad: transpose of the banded XLA conv w.r.t. its (expanded)
    # kernel, then the adjoint of the band expansion back to canonical.
    # The closure stays in the NATIVE dtype throughout (no
    # preferred_element_type/astype): a mixed-precision epilogue makes the
    # transposed conv see an f32 cotangent against bf16 activations and
    # conv_general_dilated rejects the dtype mix; the MXU still accumulates
    # the reduction in f32 before the single store-rounding.
    kg_spec = jax.ShapeDtypeStruct((3, 3, 3, g * ci, g * co), k.dtype)

    def banded(kg):
        return lax.conv_general_dilated(
            xg,
            kg,
            window_strides=(1, 1, 1),
            padding=((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    (dkg,) = jax.linear_transpose(banded, kg_spec)(dy)
    sel = jnp.asarray(_band_selector(g, 1), jnp.float32)
    dk = jnp.einsum(
        "dpqz,dhwpiqo->zhwio",
        sel,
        dkg.astype(jnp.float32).reshape(3, 3, 3, g, ci, g, co),
    ).astype(k.dtype)
    return dx, dk


gband_conv_s1.defvjp(_gband_conv_s1_fwd, _gband_conv_s1_bwd)


def gband_classif_reference(
    xg: jax.Array,
    k1: jax.Array,
    scale1: jax.Array,
    bias1: jax.Array,
    k2: jax.Array,
    bias2: jax.Array,
) -> jax.Array:
    """jnp reference for the fused classification head."""
    from ecm_tpu.ops.grouped3d import grouped_conv3d

    y = gband_reference(xg, k1, scale1, bias1, g=4, relu=True)
    cost = grouped_conv3d(y, k2.astype(y.dtype), 1, g=4, impl="banded")
    return (
        cost.astype(jnp.float32) + jnp.tile(bias2.astype(jnp.float32), 4)
    ).astype(xg.dtype)


def gband_down_reference(
    xg: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    relu: bool = True,
) -> jax.Array:
    """jnp reference for the fused down op."""
    from ecm_tpu.ops.grouped3d import grouped_conv3d_down

    y = grouped_conv3d_down(xg, kernel, 4, impl="banded").astype(jnp.float32)
    y = y * tile_channels(scale.astype(jnp.float32), 2) + tile_channels(
        bias.astype(jnp.float32), 2
    )
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(xg.dtype)


def gband_reference(
    xg: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    g: int = 4,
    relu: bool = True,
    add: jax.Array | None = None,
) -> jax.Array:
    """jnp reference for the fused op (tests + CPU fallback)."""
    from ecm_tpu.ops.grouped3d import grouped_conv3d

    y = grouped_conv3d(xg, kernel, 1, g=g, impl="banded").astype(jnp.float32)
    y = y * tile_channels(scale.astype(jnp.float32), g) + tile_channels(
        bias.astype(jnp.float32), g
    )
    if relu:
        y = jnp.maximum(y, 0.0)
    if add is not None:
        y = y + add.astype(jnp.float32)
    return y.astype(xg.dtype)
