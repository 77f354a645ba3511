"""Fused Pallas transposed-conv kernel emitting the grouped layout directly
(reference M4 hourglass decoder convs, SURVEY.md 2.1; the ConvTranspose3d
k=3 s=2 p=1 op=1 exit op of each hourglass).

Why: the XLA path (ops/grouped3d.conv_transpose3d_phased_grouped) computes
one packed 2x2x2 VALID conv and then INTERLEAVES subpixel phases into the
output volume with a reshape + transpose — measured at ~2.3 ms/pair PER
HOURGLASS of pure relayout at the production shape (benchmarks/
AGG_TRACE.json rows ``hourglass*/conv6/reshape`` + ``conv6/transpose``,
round-4 verdict ask #3). This kernel removes the relayout entirely:

- An output group-row ``[2W, 4C]`` (W-interleaved, 4 plane-slots in lanes)
  is BYTE-IDENTICAL to ``[W, 8C]`` super-columns (2 output columns per
  128-lane-aligned block). The kernel computes each output row as
  ``[W, 8C]`` dots — the (rw, slot, c) lane arrangement is baked into the
  packed kernel matrices — and the caller's final reshape to
  ``[B, D/2, 2H, 2W, 4C]`` is a free contiguous-dims reshape.
- The three input planes an output group needs (d = 2g, 2g+1, 2g+2 of the
  zero-padded input) arrive as overlapping BlockSpec refs (grid over
  (batch, out-group)); rows are walked with a fori_loop, 8 MXU dots per
  output row pair.
- BN eval-fold scale rides in the packed kernels (linear), the shift is a
  lane-tiled bias epilogue, and the hourglass residual add (``out +
  cost0``) is fused via an optional addend input in the same byte layout —
  saving the separate full-volume read-modify-write pass.

Output matches ``conv_transpose3d_phased_grouped(x, k, 4) * tile(scale) +
tile(bias) [+ add]`` exactly up to dot order (tests/test_pallas_gdeconv.py;
on-chip gate benchmarks/run_tpu_checks.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tap(r: int, p: int) -> int | None:
    """Transposed-conv tap convention (ops/conv3d.conv_transpose3d_phased):
    output phase r, input offset p -> canonical kernel tap index (None =
    no contribution)."""
    if r == 0:
        return 1 if p == 0 else None
    return 0 if p == 0 else 2


@functools.lru_cache(maxsize=None)
def _pack_selector() -> np.ndarray:
    """0/1 selector S[rh, ph, pw, td, th, tw, r, rw, s, rd]: canonical tap
    (td, th, tw) contributes to packed kernel (rh, ph, pw) at K-row block r
    and lane block (rw, s, rd) iff td == tap(rd, r - s), th == tap(rh, ph),
    tw == tap(rw, pw) with r - s in {0, 1} and every tap legal."""
    s_ = np.zeros((2, 2, 2, 3, 3, 3, 3, 2, 2, 2), np.float32)
    for rh in (0, 1):
        for ph in (0, 1):
            th = _tap(rh, ph)
            if th is None:
                continue
            for pw in (0, 1):
                for rw in (0, 1):
                    tw = _tap(rw, pw)
                    if tw is None:
                        continue
                    for s in (0, 1):
                        for pd in (0, 1):
                            for rd in (0, 1):
                                td = _tap(rd, pd)
                                if td is None:
                                    continue
                                s_[rh, ph, pw, td, th, tw, s + pd, rw, s, rd] = 1.0
    return s_


def _pack_kernels(kernel: jax.Array, scale: jax.Array) -> jax.Array:
    """Build the 8 packed dot kernels ``K[rh, ph, pw][3*Cin, 8*Cout]``
    (selector contraction — jit/trace safe).

    K[(r*Cin+ci), (rw*4 + 2s + rd)*Cout + co] =
        kernel[tap(rd, r-s), tap(rh, ph), tap(rw, pw), ci, co] * scale[co]
    summed over the legal (s, pd=r-s) pairs (pd in {0,1}); zero otherwise.
    """
    k = (kernel * scale).astype(jnp.float32)  # BN eval fold (linear)
    kd, kh, kw, cin, cout = k.shape
    assert kd == kh == kw == 3, k.shape
    sel = jnp.asarray(_pack_selector())
    # [RPQ dhw r x(rw) s z(rd)] x [dhwio] -> [RPQ r i x s z o]
    kp = jnp.einsum("RPQdhwrxsz,dhwio->RPQrixszo", sel, k)
    return kp.reshape(2, 2, 2, 3 * cin, 8 * cout)


def _gdeconv4_kernel(
    x0_ref,  # [1, 1, H+1, Wp, Cin] padded input plane 2g
    x1_ref,  # plane 2g+1
    x2_ref,  # plane 2g+2 (zero pad plane at the top group)
    kp_ref,  # [2, 2, 2, 3*Cin, 8*Cout] packed kernels (VMEM)
    b_ref,  # [1, 8*Cout] lane-tiled bias
    *rest,  # [add_ref,] out_ref
    w: int,  # output super-column count (= input W before pad)
    relu: bool,
    out_dtype,
    has_add: bool,
):
    if has_add:
        add_ref, out_ref = rest  # both [1, 1, H, 2, W, 8*Cout]
    else:
        (out_ref,) = rest
        add_ref = None
    h2 = x0_ref.shape[2] - 1  # input H (padded by one row)
    n = out_ref.shape[-1]

    # all H rows in one dot per (rh, ph, pw): a per-row loop makes M=W dots
    # that cannot amortize the MXU weight load (measured 1.08x vs XLA; this
    # form ~2x). Output rows 2i+rh are addressed as out[i, rh] — the
    # (H, 2) -> 2H interleave is a pure index relabeling, not a relayout.
    a = jnp.concatenate(
        [x0_ref[0, 0], x1_ref[0, 0], x2_ref[0, 0]], axis=-1
    )  # [H+1, Wp, 3*Cin]
    for rh in range(2):
        acc = jnp.zeros((h2 * w, n), jnp.float32)
        for ph in range(2):
            if _tap(rh, ph) is None:
                continue
            rows = a[ph : ph + h2]  # [H, Wp, 3*Cin]
            for pw in range(2):
                acc = acc + jax.lax.dot_general(
                    rows[:, pw : pw + w].reshape(h2 * w, a.shape[-1]),
                    kp_ref[rh, ph, pw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        y = acc + b_ref[0]
        if relu:
            y = jnp.maximum(y, 0.0)
        y = y.reshape(h2, w, n)
        if has_add:
            y = y + add_ref[0, 0, :, rh].astype(jnp.float32)
        out_ref[0, 0, :, rh] = y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def gdeconv4_bn(
    x: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    add: jax.Array | None = None,
    relu: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """ConvTranspose3d(k=3, s=2, p=1, op=1) + BN affine [+ residual add],
    UNGROUPED input -> grouped (g=4) output, no relayout (module doc).

    x: [B, D, H, W, Cin] (D even); kernel: [3,3,3,Cin,Cout]; scale/bias:
    [Cout] (BN eval fold; pass ones/zeros for a bare deconv). ``add``:
    optional fused addend [B, D/2, 2H, 2W, 4*Cout] (the hourglass
    ``out + cost0``). Returns [B, D/2, 2H, 2W, 4*Cout].
    """
    b, d, h2, w2, cin = x.shape
    kd, kh, kw, kci, cout = kernel.shape
    assert kd == kh == kw == 3 and kci == cin, (kernel.shape, cin)
    assert d % 2 == 0, d
    n = 8 * cout
    dg = d // 2

    kp = _pack_kernels(kernel, scale.astype(kernel.dtype)).astype(x.dtype)
    bt = jnp.tile(jnp.tile(bias.astype(jnp.float32), 4), 2).reshape(1, n)

    # pad: one zero plane (D), one zero row (H), one zero col + sublane
    # alignment (W)
    wp = w2 + 1 + ((-(w2 + 1)) % 8)
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, wp - w2), (0, 0)))

    def plane_spec(dd):
        return pl.BlockSpec(
            (1, 1, h2 + 1, wp, cin),
            lambda bi, gi, _dd=dd: (bi, 2 * gi + _dd, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    interp = _interpret() if interpret is None else interpret
    inputs = [xp, xp, xp, kp, bt]
    in_specs = [
        plane_spec(0),
        plane_spec(1),
        plane_spec(2),
        pl.BlockSpec(kp.shape, lambda bi, gi: (0,) * kp.ndim,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(bt.shape, lambda bi, gi: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    has_add = add is not None
    if has_add:
        assert add.shape == (b, dg, 2 * h2, 2 * w2, 4 * cout), add.shape
        addv = add.reshape(b, dg, h2, 2, w2, n)  # free contiguous reshape
        inputs.append(addv)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, h2, 2, w2, n),
                lambda bi, gi: (bi, gi, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out = pl.pallas_call(
        functools.partial(
            _gdeconv4_kernel,
            w=w2,
            relu=relu,
            out_dtype=x.dtype,
            has_add=has_add,
        ),
        grid=(b, dg),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, h2, 2, w2, n),
            lambda bi, gi: (bi, gi, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, dg, h2, 2, w2, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interp,
    )(*inputs)
    # [B, Dg, H, 2, W, 8C] == bytes of [B, Dg, 2H, 2W, 4C]
    return out.reshape(b, dg, 2 * h2, 2 * w2, 4 * cout)


def gdeconv4_reference(
    x: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    add: jax.Array | None = None,
    relu: bool = False,
) -> jax.Array:
    """jnp reference (tests + CPU fallback)."""
    from ecm_tpu.ops.grouped3d import conv_transpose3d_phased_grouped, tile_channels

    y = conv_transpose3d_phased_grouped(
        x, (kernel * scale).astype(x.dtype), 4
    ).astype(jnp.float32)
    y = y + tile_channels(bias.astype(jnp.float32), 4)
    if relu:
        y = jnp.maximum(y, 0.0)
    if add is not None:
        y = y + add.astype(jnp.float32)
    return y.astype(x.dtype)
