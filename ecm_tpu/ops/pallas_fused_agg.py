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

Why a hand kernel was attempted (benchmarks/AGG_MICROBENCH.json): XLA
lowers these convs at 10-19 TF/s — 5-9 % of the chip's 197 TF/s bf16 peak —
because Cout in {1, 32} fills only a quarter (or 1/128th) of the MXU's 128
output lanes, and every conv round-trips its volume through HBM. The design:

- **MXU lane packing**: each matmul computes ALL THREE dz kernel planes at
  once — B-matrix ``[Cin, 3*Cout (dz-packed)]`` — so N = 96 for C = 32
  (75 % lane fill instead of 25 %). The dz chunks scatter into rotating
  accumulator carries (see the pipelined plane loop in the kernel).
- **fusion**: stage-1 output lives only in VMEM; scale/bias/ReLU/context/
  residual run on registers. HBM sees one read of x, one write of out.

MEASURED STATUS (benchmarks/FUSED_AGG.json, real v5e, production shape
B4 48x96x312 bf16): the kernel COMPILES and MATCHES (rel err ~5e-3) but
runs at ~0.9x of the unfused XLA chain (71 vs 64 ms for dres0 at the best
tile (16, 8)). The theoretical ceiling of this formulation is ~3.5x XLA
(28 % average MXU fill), but every conv tap needs glue the VPU must execute
— per-dx relayout copies of the misaligned sublane windows, per-dz lane
sub-slices of the (rows, 96) dot outputs, carry adds, mask/scale/bias —
and that glue traffic (~6 MB/plane-iteration) bounds the kernel ~4x above
its MXU time. Conclusion: XLA's conv3d emitter already wins on this chip;
``ECMAggregation.fused`` therefore defaults to "off" BY MEASUREMENT, and
this kernel is retained as the tested, working native-kernel component
(SURVEY.md 2.5 item 2) and the base for future Mosaic work.

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
tests/test_fused_agg.py (interpret mode). On-chip Mosaic compilation +
parity + perf are asserted by benchmarks/fused_agg_bench.py, whose committed
output is benchmarks/FUSED_AGG.json — if that file is absent or stale, the
kernel must NOT be a TPU default (round-2 verdict).

Forward-only: the serving path (training keeps the autodiff-friendly XLA
chain, selected automatically by ``ECMAggregation``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _use_kernel_off_tpu() -> bool:
    """Off-TPU the kernel only runs in Pallas interpret mode (orders of
    magnitude slower than XLA) — worth it only for parity tests, which set
    ECM_PALLAS_INTERPRET=1 (tests/conftest.py). Production non-TPU callers
    get the equivalent fused_conv3d_pair_reference instead."""
    return os.environ.get("ECM_PALLAS_INTERPRET", "") == "1"


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


def _taps9(base_load, kp, pitch: int, n_rows: int):
    """One plane's 3x3 (dy, dx) tap sweep in flat-row form:
    sum_{dy,dx} tap(dy*pitch + dx) @ kp[dy*3+dx] — (n_rows, 3*C) f32.

    Taps are grouped by dx to amortize relayouts: ``base_load(dx)`` returns
    the (n_rows + 2*pitch, Cin) window at sublane offset dx — the ONLY
    misaligned (→ relayout-copy) slice, one per dx instead of one per tap —
    and the three dy taps are then slices at dy*pitch, which is a multiple
    of the 16-sublane tile (the caller rounds pitch to 16), i.e. free views.
    (bf16 ``pltpu.roll`` is not an option: "rotate with non-32-bit data".)"""
    acc = None
    for dx in range(3):
        base = base_load(dx)
        for dy in range(3):
            a = base[dy * pitch : dy * pitch + n_rows, :]
            y = jax.lax.dot_general(
                a,
                kp[dy * 3 + dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
    return acc


def _make_kernel(
    t_d: int,
    t_h: int,
    w: int,
    pitch: int,
    cin: int,
    cm: int,
    cout: int,
    relu1: bool,
    relu2: bool,
    has_ctx: bool,
    residual: bool,
    out_dtype,
):
    # +TAIL because conv taps are plain slices (no circular wrap): the
    # largest tap offset is 2*pitch+2, so each stage's planes carry a few
    # extra positions; tail values are garbage but feed only discarded
    # pad-column outputs (see module docstring).
    s_in = (t_h + 4) * pitch + 16
    s_mid = (t_h + 2) * pitch + 8
    s_out = t_h * pitch

    def kernel(*refs):
        refs = list(refs)
        x_hbm, k1_ref, s1_ref, b1_ref, k2_ref, s2_ref, b2_ref = refs[:7]
        pos = 7
        ctx_ref = res_ref = None
        if has_ctx:
            ctx_ref = refs[pos]
            pos += 1
        if residual:
            res_ref = refs[pos]
            pos += 1
        out_ref, x_vmem, sem = refs[pos:]
        b = pl.program_id(0)
        di = pl.program_id(1)
        hi = pl.program_id(2)
        n_d = pl.num_programs(1)
        n_h = pl.num_programs(2)
        # Mosaic constraint (round-2 postmortem): an HBM memref slice must be
        # tile-aligned on its two minor dims — lanes (128) and sublanes (8,
        # 16 for bf16's 2-deep packing). The caller pads C to a multiple of
        # 128 and makes pitch a multiple of 16, so this DMA's minor dim is
        # the full (128-mult) channel dim and the flat offset/size are
        # 16-aligned (t_h*pitch, (t_h+4)*pitch + 16).
        copy = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(di * t_d, t_d + 4), pl.ds(hi * t_h * pitch, s_in)],
            x_vmem,
            sem,
        )
        copy.start()
        copy.wait()

        # ---- software-pipelined plane loop ----
        # A fully-unrolled two-stage formulation (round 2) kept every plane,
        # slice and accumulator live simultaneously: Mosaic's register
        # allocator spilled 132 MB to VMEM and compilation OOM'd. Instead,
        # sweep x planes p = 0..t_d+3 ONCE with rotating two-slot accumulator
        # carries (a fori_loop, so the program is 18 matmuls, not ~200):
        #   - each x plane's dz-packed tap matmul contributes chunk dz to y1
        #     plane p-dz; slot A completes y1 plane j0 = p-2 this iteration,
        #     slot B next iteration, chunk dz=0 starts the fresh plane;
        #   - the completed y1 plane immediately feeds the stage-2 tap
        #     matmuls, whose chunks rotate through a second carry pair and
        #     complete out plane t = p-4, written straight to out_ref.
        # Live set at any instant: 2+2 accumulator planes + 1 y1 plane + the
        # current tap slice — a few MB instead of the whole tile's planes.

        # validity of y1 positions (flat index f = r*pitch + c):
        #   abs row = hi*t_h + r - 1 must be in [0, H)
        #   col c: 1 <= c <= w (c=0 / c=w+1 are the global zero pad;
        #   c >= w+2 is row-crossing garbage, zeroed too)
        fidx = jax.lax.broadcasted_iota(jnp.int32, (s_mid, 1), 0)
        r_abs = fidx // pitch + hi * t_h - 1
        c_idx = fidx % pitch
        rc_ok = (
            (r_abs >= 0) & (r_abs < n_h * t_h) & (c_idx >= 1) & (c_idx <= w)
        )
        s1 = s1_ref[0][None, :]
        b1 = b1_ref[0][None, :]
        s2 = s2_ref[0][None, :]
        b2 = b2_ref[0][None, :]
        k1v = k1_ref[...]  # [9, Cin, 3*Cm], dz-major chunks
        k2v = k2_ref[...]  # [9, Cm, 3*Cout]
        f32 = jnp.float32

        ext1 = s_mid + 2 * pitch  # dx window covering dy in {0,1,2}
        ext2 = s_out + 2 * pitch

        def body(p, carry):
            acc1a, acc1b, acc2a, acc2b = carry
            y_x = _taps9(
                lambda dx: x_vmem[p, pl.ds(dx, ext1), :],
                k1v,
                pitch,
                s_mid,
            )  # (s_mid, 3*Cm)
            # y1 plane j0 = p - 2 completes (slot A + this plane's dz=2 chunk)
            y1 = (acc1a + y_x[:, 2 * cm :]) * s1 + b1
            if relu1:
                y1 = jnp.maximum(y1, 0.0)
            d_abs = di * t_d + (p - 2) - 1
            ok = (p >= 2) & (d_abs >= 0) & (d_abs < n_d * t_d)
            # zeroing invalid planes serves the D-halo semantics AND the
            # pipeline warmup (j0 < 0 planes contribute only zeros downstream)
            y1 = jnp.where(rc_ok & ok, y1, 0.0).astype(x_vmem.dtype)

            y_y = _taps9(
                lambda dx: y1[dx : dx + ext2, :], k2v, pitch, s_out
            )  # (s_out, 3*Cout)
            out_v = (acc2a + y_y[:, 2 * cout :]) * s2 + b2
            if relu2:
                out_v = jnp.maximum(out_v, 0.0)
            if has_ctx:
                out_v = out_v + ctx_ref[0].astype(f32)

            t = p - 4  # out plane completing this iteration

            @pl.when(t >= 0)
            def _write():
                v = out_v
                if residual:
                    v = v + res_ref[0, t].astype(f32)
                out_ref[0, t] = v.astype(out_dtype)

            return (
                acc1b + y_x[:, cm : 2 * cm],
                y_x[:, :cm],
                acc2b + y_y[:, cout : 2 * cout],
                y_y[:, :cout],
            )

        zeros = (
            jnp.zeros((s_mid, cm), f32),
            jnp.zeros((s_mid, cm), f32),
            jnp.zeros((s_out, cout), f32),
            jnp.zeros((s_out, cout), f32),
        )
        jax.lax.fori_loop(0, t_d + 4, body, zeros, unroll=False)

    return kernel


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
    tile_d: int = 16,
    tile_h: int = 8,
) -> jax.Array:
    """Two fused 3x3x3 stride-1 convs with scale/bias(+ReLU) epilogues.

    out = E2(conv(E1(conv(x, k1)), k2)) [+ ctx (broadcast over D)] [+ x]
    where Ei(v) = relu?(v * scale_i + bias_i).

    x: [B, D, H, W, Cin]; k1: [3,3,3,Cin,Cm]; k2: [3,3,3,Cm,Cout];
    scale/bias: per-channel f32 (inference-folded BN, or ones/zeros);
    ctx: [B, H, W, Cout] or None; residual requires Cin >= Cout (adds
    x[..., :Cout]). Returns [B, D, H, W, Cout] in x.dtype.

    Dispatch: the Pallas kernel on TPU; off-TPU the equivalent XLA chain
    (fused_conv3d_pair_reference), unless ECM_PALLAS_INTERPRET=1 selects the
    kernel under Pallas interpret mode (parity tests)."""
    if jax.default_backend() != "tpu" and not _use_kernel_off_tpu():
        return fused_conv3d_pair_reference(
            x, k1, scale1, bias1, k2, scale2, bias2, ctx,
            relu1=relu1, relu2=relu2, residual=residual,
        )
    return _fused_conv3d_pair_pallas(
        x, k1, scale1, bias1, k2, scale2, bias2, ctx,
        relu1=relu1, relu2=relu2, residual=residual,
        tile_d=tile_d, tile_h=tile_h,
    )


@functools.partial(
    jax.jit,
    static_argnames=("relu1", "relu2", "residual", "tile_d", "tile_h"),
)
def _fused_conv3d_pair_pallas(
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
    tile_d: int = 16,
    tile_h: int = 8,
) -> jax.Array:
    """Pallas implementation — see fused_conv3d_pair for the contract.
    Default tiles (16, 8) measured fastest at the production shape
    (on-chip sweep: (8,8) 81 ms, (16,8) 71 ms, (24,8) 74 ms, (48,4) 86 ms)."""
    b, d, h, w, cin = x.shape
    cm = k1.shape[-1]
    cout = k2.shape[-1]
    assert k1.shape == (3, 3, 3, cin, cm), (k1.shape, x.shape)
    assert k2.shape == (3, 3, 3, cm, cout), k2.shape
    if residual:
        assert cin >= cout, (cin, cout)
    t_d = _pick_tile(d, tile_d)
    t_h = _pick_tile(h, tile_h)
    # Mosaic HBM-slice alignment (round-2 postmortem): the halo DMA slices
    # the flat (sublane) dim at offset t_h*pitch and the channel (lane) dim
    # in full. pitch is rounded to a multiple of 16 (bf16 sublane tile) so
    # every flat offset/size is tile-aligned, and C is zero-padded to a
    # multiple of 128 (lane tile). The C padding costs HBM read bytes only —
    # MXU time is unchanged (K <= 128 occupies the same systolic passes) and
    # the zero rows of the packed kernel contribute nothing.
    pitch = -(-(w + 4) // 16) * 16
    cin_pad = -(-cin // 128) * 128

    def vmem_bytes(td: int, th: int) -> int:
        ib = x.dtype.itemsize
        win = (td + 4) * ((th + 4) * pitch + 16) * cin_pad * ib  # halo window
        y1b = (td + 2) * ((th + 2) * pitch + 8) * cm * 4  # f32 stage-1 acc
        accb = td * th * pitch * cout * 4
        outb = 2 * td * th * pitch * cout * ib  # double-buffered out block
        resb = 2 * td * th * pitch * cout * ib if residual else 0
        return win + y1b + accb + outb + resb

    # v5e VMEM is 128 MiB; leave headroom for Pallas' own pipelining buffers
    while t_h > 1 and vmem_bytes(t_d, t_h) > 40 * 2**20:
        t_h = _pick_tile(h, t_h - 1)
    while t_d > 1 and vmem_bytes(t_d, t_h) > 40 * 2**20:
        t_d = _pick_tile(d, t_d - 1)

    # zero-pad D/H by 2, W to the row pitch (2 left, pitch-w-2 right), C to
    # the lane tile, then flatten rows: [B, D+4, (H+4)*pitch+16, Cpad]
    # (the +16 flat tail backs the last tile's slice-based taps)
    xp = jnp.pad(
        x, ((0, 0), (2, 2), (2, 2), (2, pitch - w - 2), (0, cin_pad - cin))
    )
    xp = xp.reshape(b, d + 4, (h + 4) * pitch, cin_pad)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 16), (0, 0)))
    k1p = _pack_kernel(
        jnp.pad(k1.astype(x.dtype), ((0, 0),) * 3 + ((0, cin_pad - cin), (0, 0)))
    )
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
        ctxp = jnp.pad(ctx, ((0, 0), (0, 0), (0, pitch - w), (0, 0))).reshape(
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
    if residual:
        # x[..., :cout] in the out layout, as its own blocked input (see
        # kernel comment — lane-slicing the 128-padded window is illegal)
        resp = jnp.pad(
            x[..., :cout], ((0, 0), (0, 0), (0, 0), (0, pitch - w), (0, 0))
        ).reshape(b, d, h * pitch, cout)
        in_specs.append(
            pl.BlockSpec(
                (1, t_d, t_h * pitch, cout),
                lambda bi, di, hi: (bi, di, hi, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(resp)

    kernel = _make_kernel(
        t_d, t_h, w, pitch, cin_pad, cm, cout,
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
            pltpu.VMEM((t_d + 4, (t_h + 4) * pitch + 16, cin_pad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        # the pipelined loop's live set (carries + tap slices + dot outputs)
        # exceeds Mosaic's 16 MB default scoped-vmem stack; the chip has
        # 128 MB — grant the kernel most of it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
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
