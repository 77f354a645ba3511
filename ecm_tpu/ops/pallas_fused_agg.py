"""Fused Pallas 3D-aggregation kernel (native-kernel component 2, SURVEY.md
2.5 item 2 / BASELINE.json:5 "3D conv aggregation + context mapping -> fused
Pallas kernels").

``fused_conv3d_pair`` computes TWO stacked 3x3x3 stride-1 convolutions with
folded-BN scale/bias + ReLU epilogues — plus the explicit context-mapping
broadcast add and/or a residual skip — in ONE kernel, keeping the
intermediate volume in VMEM. It covers the aggregation's stride-1 pairs:

    dres0:   relu(bn(conv 2C->C)) |> relu(bn(conv C->C)) [+ ctx broadcast]
    dres1:   relu(bn(conv C->C))  |> bn(conv C->C) + x   [residual]
    classif: relu(bn(conv C->C))  |> conv C->1 + bias

Why a hand kernel (measured on the v5e chip, benchmarks/AGG_MICROBENCH.json):
XLA lowers these convs at 10-19 TF/s — 5-9 % of the chip's 197 TF/s bf16
peak — because Cout in {1, 32} fills only a quarter (or 1/128th) of the
MXU's 128 output lanes, and every conv round-trips its volume through HBM.
This kernel fixes both:

- **MXU lane packing**: each matmul computes ALL THREE dz kernel planes at
  once — B-matrix ``[Cin, 3*Cout (dz-packed)]`` — so N = 96 for C = 32
  (75 % lane fill instead of 25 %). The dz chunks scatter into the
  accumulator planes p-dz (static-unrolled VPU adds).
- **fusion**: stage-1 output lives only in VMEM; scale/bias/ReLU/context/
  residual run on registers. HBM sees one read of x, one write of out.

Mosaic-shaped layout (probed on the real chip; see git history): the natural
``(rows, cols, C)`` blocks with dx-im2col lane-concats are rejected ("offset
mismatch on non-concat dimension"), and ``pltpu.roll`` rejects bf16
("rotate with non-32-bit data") — but plain STATIC misaligned sublane
slices compile fine, including directly feeding a matmul. So each D-plane
is kept FLAT: ``(S, C)`` with S = rows*(W+4), and every (dy, dx) conv tap
is one static slice ``plane[dy*(W+4)+dx :][:s_out]``. Row-crossing
positions read next-row garbage, but those land exactly in the pad columns
every row carries and are never read by the next stage nor written out
(the output keeps the padded row pitch; the caller slices ``[..., :W, :]``
off the reshaped result).

All accumulation is f32 (matmuls via ``preferred_element_type``); inputs and
the inter-stage value are the model dtype (bf16 in production) — the same
numerics as the unfused conv-BN-ReLU chain, asserted in
tests/test_fused_agg.py and on-chip in benchmarks/fused_agg_bench.py.

Forward-only: the serving path (training keeps the autodiff-friendly XLA
chain, selected automatically by ``ECMAggregation``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_tile(n: int, target: int) -> int:
    """Largest divisor of n that is <= target."""
    for t in range(min(n, target), 0, -1):
        if n % t == 0:
            return t
    return 1


def _pack_kernel(k: jax.Array) -> jax.Array:
    """[3(dz), 3(dy), 3(dx), Cin, Cout] -> [9 (dy*3+dx), Cin, 3*Cout
    (dz-major)] for the dz-packed per-tap matmuls."""
    kd, ky, kx, cin, cout = k.shape
    assert kd == ky == kx == 3, k.shape
    # [dy, dx, ci, dz, co] -> [dy*3+dx, ci, dz*co]
    return jnp.transpose(k, (1, 2, 3, 0, 4)).reshape(9, cin, 3 * cout)


def _conv_stage_flat(
    planes: list,  # list of P (S_in, C) arrays (flat rows, pitch w+4)
    kp,  # packed kernel ref value [9, C, 3*Cout]
    out_planes: int,
    s_out: int,
    pitch: int,
):
    """3x3x3 VALID conv in flat-row form: out[q][f] = sum_{dz,dy,dx}
    planes[q+dz][f + dy*pitch + dx] * k[dz,dy,dx]. Returns list of
    out_planes (s_out, Cout) f32 accumulators."""
    cout3 = kp.shape[-1]
    cout = cout3 // 3
    acc: list = [None] * out_planes
    for p, plane in enumerate(planes):
        for dy in range(3):
            for dx in range(3):
                shift = dy * pitch + dx
                # static misaligned sublane slices compile fine (Mosaic
                # relayouts); rolls do NOT for bf16 ("rotate with non-32-bit
                # data") — probed on-chip, see module docstring
                a = plane[shift : shift + s_out, :]
                y = jax.lax.dot_general(
                    a,
                    kp[dy * 3 + dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (s_out, 3*Cout)
                for dz in range(3):
                    q = p - dz
                    if 0 <= q < out_planes:
                        chunk = y[:, dz * cout : (dz + 1) * cout]
                        acc[q] = chunk if acc[q] is None else acc[q] + chunk
    return acc


def _make_kernel(
    t_d: int,
    t_h: int,
    w: int,
    cin: int,
    cm: int,
    cout: int,
    relu1: bool,
    relu2: bool,
    has_ctx: bool,
    residual: bool,
    out_dtype,
):
    pitch = w + 4
    # +TAIL because conv taps are plain slices (no circular wrap): the
    # largest tap offset is 2*pitch+2, so each stage's planes carry a few
    # extra positions; tail values are garbage but feed only discarded
    # pad-column outputs (see module docstring).
    s_in = (t_h + 4) * pitch + 16
    s_mid = (t_h + 2) * pitch + 8
    s_out = t_h * pitch

    def kernel(*refs):
        if has_ctx:
            (x_hbm, k1_ref, s1_ref, b1_ref, k2_ref, s2_ref, b2_ref, ctx_ref,
             out_ref, x_vmem, sem) = refs
        else:
            (x_hbm, k1_ref, s1_ref, b1_ref, k2_ref, s2_ref, b2_ref,
             out_ref, x_vmem, sem) = refs
        b = pl.program_id(0)
        di = pl.program_id(1)
        hi = pl.program_id(2)
        n_d = pl.num_programs(1)
        n_h = pl.num_programs(2)
        copy = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(di * t_d, t_d + 4), pl.ds(hi * t_h * pitch, s_in)],
            x_vmem,
            sem,
        )
        copy.start()
        copy.wait()

        # ---- stage 1: T_d+2 flat planes of (s_mid, Cm) ----
        x_planes = [x_vmem[p] for p in range(t_d + 4)]
        acc1 = _conv_stage_flat(x_planes, k1_ref[...], t_d + 2, s_mid, pitch)

        # validity of y1 positions (flat index f = r*pitch + c):
        #   abs row = hi*t_h + r - 1 must be in [0, H)
        #   col c: 1 <= c <= w (c=0 / c=w+1 are the global zero pad;
        #   c in {w+2, w+3} is row-crossing garbage, zeroed too)
        fidx = jax.lax.broadcasted_iota(jnp.int32, (s_mid, 1), 0)
        r_abs = fidx // pitch + hi * t_h - 1
        c_idx = fidx % pitch
        row_ok = (r_abs >= 0) & (r_abs < n_h * t_h)
        col_ok = (c_idx >= 1) & (c_idx <= w)
        s1 = s1_ref[0][None, :]
        b1 = b1_ref[0][None, :]
        y1_planes = []
        for q in range(t_d + 2):
            y = acc1[q] * s1 + b1
            if relu1:
                y = jnp.maximum(y, 0.0)
            d_abs = di * t_d + q - 1
            plane_ok = (d_abs >= 0) & (d_abs < n_d * t_d)
            y = jnp.where(row_ok & col_ok & plane_ok, y, 0.0)
            y1_planes.append(y.astype(x_vmem.dtype))

        # ---- stage 2: T_d flat planes of (s_out, Cout) ----
        acc2 = _conv_stage_flat(y1_planes, k2_ref[...], t_d, s_out, pitch)
        s2 = s2_ref[0][None, :]
        b2 = b2_ref[0][None, :]
        for t in range(t_d):
            y = acc2[t] * s2 + b2
            if relu2:
                y = jnp.maximum(y, 0.0)
            if has_ctx:
                y = y + ctx_ref[0].astype(jnp.float32)
            if residual:
                # x itself at out position (t, f): plane t+2, flat offset
                # f + 2*pitch + 2 -> a static (misaligned-ok) slice
                off = 2 * pitch + 2
                res = x_vmem[t + 2, off : off + s_out, :cout]
                y = y + res.astype(jnp.float32)
            out_ref[0, t] = y.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("relu1", "relu2", "residual", "tile_d", "tile_h"),
)
def fused_conv3d_pair(
    x: jax.Array,
    k1: jax.Array,
    scale1: jax.Array,
    bias1: jax.Array,
    k2: jax.Array,
    scale2: jax.Array,
    bias2: jax.Array,
    ctx: jax.Array | None = None,
    *,
    relu1: bool = True,
    relu2: bool = True,
    residual: bool = False,
    tile_d: int = 8,
    tile_h: int = 8,
) -> jax.Array:
    """Two fused 3x3x3 stride-1 convs with scale/bias(+ReLU) epilogues.

    out = E2(conv(E1(conv(x, k1)), k2)) [+ ctx (broadcast over D)] [+ x]
    where Ei(v) = relu?(v * scale_i + bias_i).

    x: [B, D, H, W, Cin]; k1: [3,3,3,Cin,Cm]; k2: [3,3,3,Cm,Cout];
    scale/bias: per-channel f32 (inference-folded BN, or ones/zeros);
    ctx: [B, H, W, Cout] or None; residual requires Cin >= Cout (adds
    x[..., :Cout]). Returns [B, D, H, W, Cout] in x.dtype.
    """
    b, d, h, w, cin = x.shape
    cm = k1.shape[-1]
    cout = k2.shape[-1]
    assert k1.shape == (3, 3, 3, cin, cm), (k1.shape, x.shape)
    assert k2.shape == (3, 3, 3, cm, cout), k2.shape
    if residual:
        assert cin >= cout, (cin, cout)
    t_d = _pick_tile(d, tile_d)
    t_h = _pick_tile(h, tile_h)
    pitch = w + 4

    def vmem_bytes(td: int, th: int) -> int:
        ib = x.dtype.itemsize
        win = (td + 4) * (th + 4) * pitch * cin * ib  # halo window
        y1b = (td + 2) * (th + 2) * pitch * cm * 4  # f32 stage-1 acc
        accb = td * th * pitch * cout * 4
        outb = 2 * td * th * pitch * cout * ib  # double-buffered out block
        return win + y1b + accb + outb

    while t_h > 1 and vmem_bytes(t_d, t_h) > 10 * 2**20:
        t_h = _pick_tile(h, t_h - 1)
    while t_d > 1 and vmem_bytes(t_d, t_h) > 10 * 2**20:
        t_d = _pick_tile(d, t_d - 1)

    # zero-pad D/H by 2, W by 2+2, then flatten rows: [B, D+4, (H+4)*pitch+16, C]
    # (the +16 flat tail backs the last tile's slice-based taps)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (2, 2), (0, 0)))
    xp = xp.reshape(b, d + 4, (h + 4) * pitch, cin)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 16), (0, 0)))
    k1p = _pack_kernel(k1.astype(x.dtype))
    k2p = _pack_kernel(k2.astype(x.dtype))
    f32 = jnp.float32
    vecs = [
        scale1.astype(f32).reshape(1, cm),
        bias1.astype(f32).reshape(1, cm),
        scale2.astype(f32).reshape(1, cout),
        bias2.astype(f32).reshape(1, cout),
    ]

    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),  # x (manual halo DMA)
        vspec(),  # k1p
        vspec(),  # scale1
        vspec(),  # bias1
        vspec(),  # k2p
        vspec(),  # scale2
        vspec(),  # bias2
    ]
    args = [xp, k1p, vecs[0], vecs[1], k2p, vecs[2], vecs[3]]
    if ctx is not None:
        assert ctx.shape == (b, h, w, cout), (ctx.shape, (b, h, w, cout))
        # out flat col c' maps to absolute col c' (taps read the padded row
        # at c'+dx), so ctx pads on the RIGHT only to match the row pitch
        ctxp = jnp.pad(ctx, ((0, 0), (0, 0), (0, 4), (0, 0))).reshape(
            b, h * pitch, cout
        )
        in_specs.append(
            pl.BlockSpec(
                (1, t_h * pitch, cout),
                lambda bi, di, hi: (bi, hi, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(ctxp.astype(x.dtype))

    kernel = _make_kernel(
        t_d, t_h, w, cin, cm, cout,
        relu1, relu2, ctx is not None, residual, x.dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, d // t_d, h // t_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, t_d, t_h * pitch, cout),
            lambda bi, di, hi: (bi, di, hi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, d, h * pitch, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((t_d + 4, (t_h + 4) * pitch + 16, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(*args)
    # un-flatten rows and drop the per-row pad/garbage columns. NOTE: the
    # valid data sits at cols [2, w+2) of the pitch — the kernel's flat
    # coordinate starts at the padded col 0 minus the (dy, dx) offset of +0;
    # out position c' corresponds to flat col c' (taps read c'+dx over the
    # padded row), i.e. cols [0, w).
    return out.reshape(b, d, h, pitch, cout)[:, :, :, :w, :]


def fused_conv3d_pair_reference(
    x, k1, scale1, bias1, k2, scale2, bias2, ctx=None,
    *, relu1=True, relu2=True, residual=False,
):
    """Pure-XLA reference with identical semantics (tests + training path)."""
    from ecm_tpu.ops.conv3d import conv3d_xla

    f32 = jnp.float32
    y = conv3d_xla(x, k1.astype(x.dtype), (1, 1, 1), ((1, 1),) * 3)
    y = y.astype(f32) * scale1 + bias1
    if relu1:
        y = jnp.maximum(y, 0.0)
    y = y.astype(x.dtype)
    y2 = conv3d_xla(y, k2.astype(x.dtype), (1, 1, 1), ((1, 1),) * 3)
    y2 = y2.astype(f32) * scale2 + bias2
    if relu2:
        y2 = jnp.maximum(y2, 0.0)
    if ctx is not None:
        y2 = y2 + ctx.astype(f32)[:, None]
    if residual:
        y2 = y2 + x[..., : y2.shape[-1]].astype(f32)
    return y2.astype(x.dtype)
