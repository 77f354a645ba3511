"""Grouped-layout (disparity-folded) counterparts of the 3D conv/BN building
blocks in :mod:`ecm_tpu.models.layers` — same parameter trees, same math,
TPU-friendly ``[B, D/4, H, W, 4*C]`` activations (see
:mod:`ecm_tpu.ops.grouped3d` for the why and the measured wins).

Parameter-tree compatibility is a hard contract here: ``GConvBN`` scopes its
kernel at ``<name>/conv/kernel`` and BN at ``<name>/bn/{scale,bias}`` +
batch_stats ``<name>/bn/{mean,var}`` with CANONICAL shapes ([3,3,3,Cin,Cout]
kernels, per-channel [C] BN vectors) — identical to ``ConvBN``/
``ConvTransposeBN`` — so a checkpoint trained in either layout loads in the
other, and the torch importer (ecm_tpu/checkpoint_import.py) needs no
layout awareness. The grouped banded kernel is expanded from the canonical
parameter at apply time (a [3,g,g,3] one-hot einsum — negligible next to the
conv itself).

BatchNorm semantics note: in grouped layout each canonical channel c appears
as g plane-slot copies. ``BatchNormG`` reduces over (B, D/g, H, W) per
(slot, c) and then averages the g slots, which equals the canonical
per-channel batch statistics exactly (equal counts per slot); running-stat
updates therefore match flax ``nn.BatchNorm`` on the ungrouped tensor
(asserted in tests/test_grouped3d.py).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp
from flax import linen as nn

from ecm_tpu.models.layers import BN_EPS, conv_init
from ecm_tpu.ops.grouped3d import (
    G,
    conv_transpose3d_phased_grouped,
    from_grouped,
    grouped_conv3d,
    grouped_conv3d_down,
    tile_channels,
)


class BatchNormG(nn.Module):
    """flax ``nn.BatchNorm``-equivalent on a grouped volume (module doc)."""

    groups: int = G
    momentum: float = 0.9
    epsilon: float = BN_EPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xg: jax.Array, use_running_average: bool) -> jax.Array:
        g = self.groups
        gc = xg.shape[-1]
        assert gc % g == 0, (gc, g)
        c = gc // g
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = xg.astype(jnp.float32)
            m_gc = jnp.mean(xf, axis=(0, 1, 2, 3)).reshape(g, c)
            sq_gc = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3)).reshape(g, c)
            mean = m_gc.mean(axis=0)
            var = sq_gc.mean(axis=0) - jnp.square(mean)  # biased, as flax
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        mt = tile_channels(mean, g)
        st = tile_channels(scale * jax.lax.rsqrt(var + self.epsilon), g)
        bt = tile_channels(bias, g)
        y = (xg.astype(jnp.float32) - mt) * st + bt
        return y.astype(self.dtype)


class GConv3D(nn.Module):
    """Grouped 3x3x3 conv; param-compatible with ``Conv3DOpt`` ("kernel"
    [3,3,3,Cin,Cout], optional "bias" [Cout]). ``groups`` picks the folding
    factor (4 for the 32-channel full-res stack, 2 for the 64-channel
    hourglass interior — both present 128 output lanes; g=2 pays only x2
    dense-FLOP inflation, measured faster at 64 channels)."""

    features: int
    strides: int = 1
    use_bias: bool = False
    groups: int = G
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xg: jax.Array) -> jax.Array:
        cin = xg.shape[-1] // self.groups
        kernel = self.param(
            "kernel", conv_init, (3, 3, 3, cin, self.features), jnp.float32
        )
        if (
            self.strides == 1
            and self.groups == 4
            and 4 * self.features == 128  # kernel output-DMA lane width
            and _gband_train_enabled()
        ):
            # training/autodiff path: Pallas gband forward + hand VJP
            # (input-grad = gband conv of dy with the flipped-transposed
            # kernel; weight-grad = XLA banded weight-grad) — see
            # ops/pallas_gband.gband_conv_s1
            from ecm_tpu.ops.pallas_gband import gband_conv_s1

            out = gband_conv_s1(
                xg.astype(self.dtype), kernel.astype(self.dtype), 4
            )
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros_init(), (self.features,),
                    jnp.float32,
                )
                out = out + tile_channels(bias, self.groups).astype(out.dtype)
            return out
        out = grouped_conv3d(
            xg.astype(self.dtype),
            kernel.astype(self.dtype),
            self.strides,
            g=self.groups,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            out = out + tile_channels(bias, self.groups).astype(out.dtype)
        return out


# Pallas gband-kernel dispatch for GConvBN's eval path. Read ONCE at import
# (jit bakes the choice into the trace — same lesson as
# grouped3d._IMPL_DEFAULT). "on" | "off" | "auto" (= on when the backend is
# TPU). Policy: may default to "auto" only with the on-chip gate green and a
# committed perf artifact showing it winning (benchmarks/run_tpu_checks.py,
# benchmarks/GBAND_BENCH.json).
# Default "auto" (on for TPU eval) BY MEASUREMENT: gate green at HEAD
# (TPU_CHECKS.json gband_*), GBAND_BENCH.json shows the dispatched g4
# full-res shapes winning 1.2-1.6x over the XLA banded chain, and the
# FULL-MODEL bench confirms the win composes: 19.6 vs 18.0 pairs/s.
_GBAND_DEFAULT = _os.environ.get("ECM_TPU_GBAND", "auto")


def _gband_enabled() -> bool:
    if _GBAND_DEFAULT == "on":
        return True
    if _GBAND_DEFAULT == "auto":
        return jax.default_backend() == "tpu"
    return False


# Train-path gband dispatch (GConv3D -> gband_conv_s1 custom VJP). Same
# policy discipline as _GBAND_DEFAULT: may default to "auto" only with the
# on-chip gate green and a committed TRAIN_BENCH/TRAIN_BREAKDOWN artifact
# showing the custom-VJP path winning end-to-end.
# Default "auto" BY MEASUREMENT (benchmarks/TRAIN_BREAKDOWN{,_ON}.json,
# config-2 shape on the v5e): full train step 12.98 -> 16.30 pairs/s with
# remat (fwd 82.9 -> 73.7 ms, bwd-fwd 224 -> 171 ms), 14.33 -> 18.09
# without; grad parity vs the XLA banded chain is tested in f32 AND bf16
# (tests/test_pallas_gband.py::test_gband_conv_s1_vjp_matches_autodiff).
_GBAND_TRAIN_DEFAULT = _os.environ.get("ECM_TPU_GBAND_TRAIN", "auto")


def _gband_train_enabled() -> bool:
    if _GBAND_TRAIN_DEFAULT == "on":
        return True
    if _GBAND_TRAIN_DEFAULT == "auto":
        return jax.default_backend() == "tpu"
    return False


class GConvBN(nn.Module):
    """Grouped ``ConvBN`` (3D hot path only: k=3, pad=1, stride 1|2).

    Eval with ``_gband_enabled()`` routes stride-1 calls through the fused
    Pallas gband kernel (``ecm_tpu.ops.pallas_gband``): same parameters
    (read from the conv/bn children), BN running stats folded into the
    epilogue — numerics equal to conv + BN(eval) + ReLU up to dot order
    (tests/test_pallas_gband.py). Training and stride-2 keep the XLA chain
    (autodiff + batch-stat BN)."""

    features: int
    strides: int = 1
    relu: bool = True
    groups: int = G
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xg: jax.Array, train: bool = False) -> jax.Array:
        if (
            not train
            and self.strides == 1
            and self.groups == 4  # g2 (/8, /16) measured SLOWER than XLA:
            # GBAND_BENCH.json hg_conv2 0.74x / hg_conv4 0.92x — the kernel's
            # 3x H-halo input re-read dominates at interior shapes
            and _gband_enabled()
            and self.has_variable("params", "conv")  # init ran (train path)
        ):
            from ecm_tpu.ops.pallas_gband import gband_conv_bn_s1

            p = self.variables["params"]
            s = self.variables["batch_stats"]
            scale = p["bn"]["scale"] / jnp.sqrt(s["bn"]["var"] + BN_EPS)
            bias = p["bn"]["bias"] - s["bn"]["mean"] * scale
            return gband_conv_bn_s1(
                xg.astype(self.dtype),
                p["conv"]["kernel"].astype(self.dtype),
                scale,
                bias,
                g=self.groups,
                relu=self.relu,
            )
        if not train and self.has_variable("params", "conv"):
            # eval XLA path (g2 interiors, stride-2): fold the BN scale into
            # the conv kernel and the shift into a bias epilogue — the
            # bias+ReLU pattern XLA's conv output fusion recognizes, instead
            # of the standalone full-volume BN pass it was measured NOT to
            # fuse (round-4 verdict weak #1: ~4.5 ms/pair of BN/ReLU passes)
            p = self.variables["params"]
            s = self.variables["batch_stats"]
            scale = p["bn"]["scale"] / jnp.sqrt(s["bn"]["var"] + BN_EPS)
            bias = p["bn"]["bias"] - s["bn"]["mean"] * scale
            k = (p["conv"]["kernel"] * scale).astype(self.dtype)
            out = grouped_conv3d(
                xg.astype(self.dtype), k, self.strides, g=self.groups
            )
            out = out + tile_channels(bias, self.groups).astype(out.dtype)
            return nn.relu(out) if self.relu else out
        xg = GConv3D(
            self.features,
            strides=self.strides,
            groups=self.groups,
            dtype=self.dtype,
            name="conv",
        )(xg)
        xg = BatchNormG(groups=self.groups, dtype=self.dtype, name="bn")(
            xg, use_running_average=not train
        )
        if self.relu:
            xg = nn.relu(xg)
        return xg


class GConvBNDown(nn.Module):
    """Grouped stride-2 ``ConvBN`` that transitions g=4 input to g=2 output
    (the hourglass-encoder entry conv — see grouped_kernel_down).

    Eval with ``_gband_enabled()`` routes through the rolling-DMA Pallas
    down kernel (``pallas_gband.gband_down_conv_bn``) with BN folded into
    the epilogue — same params, numerics equal up to dot order."""

    features: int
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xg: jax.Array, train: bool = False) -> jax.Array:
        if (
            not train
            and _gband_enabled()
            and self.has_variable("params", "conv")
        ):
            from ecm_tpu.ops.pallas_gband import gband_down_conv_bn

            p = self.variables["params"]
            s = self.variables["batch_stats"]
            scale = p["bn"]["scale"] / jnp.sqrt(s["bn"]["var"] + BN_EPS)
            bias = p["bn"]["bias"] - s["bn"]["mean"] * scale
            return gband_down_conv_bn(
                xg.astype(self.dtype),
                p["conv"]["kernel"].astype(self.dtype),
                scale,
                bias,
                relu=self.relu,
            )
        if not train and self.has_variable("params", "conv"):
            # eval XLA fallback: BN fold into the kernel (see GConvBN)
            p = self.variables["params"]
            s = self.variables["batch_stats"]
            scale = p["bn"]["scale"] / jnp.sqrt(s["bn"]["var"] + BN_EPS)
            bias = p["bn"]["bias"] - s["bn"]["mean"] * scale
            k = (p["conv"]["kernel"] * scale).astype(self.dtype)
            out = grouped_conv3d_down(xg.astype(self.dtype), k, G)
            out = out + tile_channels(bias, G // 2).astype(out.dtype)
            return nn.relu(out) if self.relu else out
        class _Down(nn.Module):
            features: int
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, xg: jax.Array) -> jax.Array:
                cin = xg.shape[-1] // G
                kernel = self.param(
                    "kernel", conv_init, (3, 3, 3, cin, self.features), jnp.float32
                )
                return grouped_conv3d_down(
                    xg.astype(self.dtype), kernel.astype(self.dtype), G
                )

        xg = _Down(self.features, dtype=self.dtype, name="conv")(xg)
        xg = BatchNormG(groups=G // 2, dtype=self.dtype, name="bn")(
            xg, use_running_average=not train
        )
        if self.relu:
            xg = nn.relu(xg)
        return xg


class GDeconv3D(nn.Module):
    """Grouped ``Deconv3DOpt``: un-groups the (cheap, low-res) input, runs the
    subpixel-phased transposed conv, and emits the output directly in grouped
    layout (``out_groups`` 2 or 4). Param-compatible ("kernel"
    [3,3,3,Cin,Cout])."""

    features: int
    in_groups: int = G
    out_groups: int = G
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xg: jax.Array) -> jax.Array:
        cin = xg.shape[-1] // self.in_groups
        kernel = self.param(
            "kernel", conv_init, (3, 3, 3, cin, self.features), jnp.float32
        )
        x = from_grouped(xg, self.in_groups)  # low-res input: cheap to ungroup
        return conv_transpose3d_phased_grouped(
            x.astype(self.dtype), kernel.astype(self.dtype), self.out_groups
        )


class GDeconvBN(nn.Module):
    """Grouped ``ConvTransposeBN`` (k=3, s=2, p=1, op=1 — exact doubling).

    ``add``: optional POST-BN addend (the hourglass ``out + cost0``
    residual), applied after the optional ReLU — fused into the Pallas
    gdeconv epilogue on the dispatched path (saves the separate
    full-volume read-modify-write pass).

    Eval with ``_gband_enabled()`` and ``out_groups == 4`` routes through
    ``ops.pallas_gdeconv.gdeconv4_bn``: the transposed conv, BN fold, bias,
    and residual are computed per output group-row with the subpixel
    interleave baked into the packed kernels' lane arrangement — no
    relayout (the XLA phased path paid ~2.3 ms/pair per hourglass of
    reshape+transpose, AGG_TRACE.json / round-4 verdict ask #3)."""

    features: int
    relu: bool = False
    in_groups: int = G
    out_groups: int = G
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xg: jax.Array,
        train: bool = False,
        add: jax.Array | None = None,
    ) -> jax.Array:
        if not train and self.has_variable("params", "deconv"):
            # eval: fold the BN scale into the (linear) transposed-conv
            # kernel, shift as a bias epilogue — removes the standalone
            # full-volume BN pass after each hourglass deconv (see GConvBN)
            p = self.variables["params"]
            s = self.variables["batch_stats"]
            scale = p["bn"]["scale"] / jnp.sqrt(s["bn"]["var"] + BN_EPS)
            bias = p["bn"]["bias"] - s["bn"]["mean"] * scale
            x = from_grouped(xg, self.in_groups)
            if self.out_groups == 4 and not self.relu and _gband_enabled():
                from ecm_tpu.ops.pallas_gdeconv import gdeconv4_bn

                return gdeconv4_bn(
                    x.astype(self.dtype),
                    p["deconv"]["kernel"].astype(self.dtype),
                    scale,
                    bias,
                    add=add,
                )
            k = (p["deconv"]["kernel"] * scale).astype(self.dtype)
            out = conv_transpose3d_phased_grouped(
                x.astype(self.dtype), k, self.out_groups
            )
            out = out + tile_channels(bias, self.out_groups).astype(out.dtype)
            if self.relu:
                out = nn.relu(out)
            return out if add is None else out + add.astype(out.dtype)
        xg = GDeconv3D(
            self.features,
            in_groups=self.in_groups,
            out_groups=self.out_groups,
            dtype=self.dtype,
            name="deconv",
        )(xg)
        xg = BatchNormG(groups=self.out_groups, dtype=self.dtype, name="bn")(
            xg, use_running_average=not train
        )
        if self.relu:
            xg = nn.relu(xg)
        return xg if add is None else xg + add.astype(xg.dtype)
