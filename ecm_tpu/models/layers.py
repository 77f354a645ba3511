"""Shared conv/BN building blocks (reference ``models/submodule.py`` convbn /
convbn_3d / BasicBlock, SURVEY.md 2.1 M1/M4).

TPU-native conventions:

- channels-last layouts everywhere (NHWC for 2D, NDHWC for 3D) — minor dims
  feed the MXU/VPU directly.
- *explicit* symmetric padding ``dilation * (k // 2)`` per spatial dim, which
  reproduces torch's ``padding=dilation`` semantics exactly (XLA ``SAME``
  padding differs by a one-pixel shift for stride-2 even-sized inputs; parity
  with the torch-CPU oracle is asserted in tests/test_torch_parity.py).
- He-normal (fan_out) conv init, the canonical init of this model family.
- BatchNorm: torch semantics (momentum 0.1 -> flax momentum 0.9, eps 1e-5).
  Under ``jit`` over a sharded global batch the batch statistics are computed
  over the *global* batch (GSPMD inserts the cross-replica reductions), i.e.
  sync-BN — a documented, intentional divergence from the reference's
  per-GPU ``nn.DataParallel`` BN (SURVEY.md section 7 stage 2).
- mixed precision: ``dtype`` (compute) can be bfloat16 while ``param_dtype``
  and BN statistics stay float32.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# He-normal with fan_out: canonical PSMNet-family conv init
# (reference submodule.py weight init: normal(0, sqrt(2 / (k*k*out_ch)))).
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")

# single source of truth for BatchNorm epsilon (torch default): the eval
# BN-folds in grouped_layers/aggregation must use the SAME value as the
# train-path BatchNorm modules or the fused serving path silently diverges
BN_EPS = 1e-5


def _to_tuple(v: int | Sequence[int], n: int) -> tuple[int, ...]:
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


class Conv3DOpt(nn.Module):
    """3D conv with a switchable lowering (``ecm_tpu.ops.conv3d``): XLA's
    native conv3d vs the decomposed batched-2D form that profiles ~MXU-
    friendlier on TPU. Param layout matches ``nn.Conv`` ([*k, I, O] kernel
    named "kernel"), so checkpoints are interchangeable across impls."""

    features: int
    strides: int = 1
    use_bias: bool = False
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ecm_tpu.ops.conv3d import conv3d

        kernel = self.param(
            "kernel", conv_init, (3, 3, 3, x.shape[-1], self.features), jnp.float32
        )
        s = self.strides
        out = conv3d(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            strides=(s, s, s),
            impl=self.impl,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            out = out + bias.astype(out.dtype)
        return out


class Deconv3DOpt(nn.Module):
    """ConvTranspose3d(k=3, s=2, p=1, op=1) with a switchable lowering:
    flax ``nn.ConvTranspose`` (dense conv over the 2x-dilated input — 7/8 of
    MACs hit zeros) vs the subpixel phase decomposition
    (``ecm_tpu.ops.conv3d.conv_transpose3d_phased``, 8x fewer MACs). Param
    layout matches ``nn.ConvTranspose`` ([3, 3, 3, I, O] kernel named
    "kernel"), so checkpoints are interchangeable across impls.

    ``ECM_TPU_DECONV_IMPL``: "phased" (default) | "xla".
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import os

        from ecm_tpu.ops.conv3d import accum_dtype, conv_transpose3d_phased

        kernel = self.param(
            "kernel", conv_init, (3, 3, 3, x.shape[-1], self.features), jnp.float32
        )
        impl = os.environ.get("ECM_TPU_DECONV_IMPL", "phased")
        if impl == "phased":
            return conv_transpose3d_phased(
                x.astype(self.dtype), kernel.astype(self.dtype)
            )
        xc = x.astype(self.dtype)
        return jax.lax.conv_transpose(
            xc,
            kernel.astype(self.dtype),
            strides=(2, 2, 2),
            padding=[(1, 2)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=accum_dtype(xc),
        ).astype(self.dtype)


class ConvBN(nn.Module):
    """Conv (2D or 3D by input rank) + BatchNorm, optional ReLU.

    Matches reference ``convbn`` / ``convbn_3d``: bias-free conv with explicit
    torch-style padding, BN, then (optionally) ReLU.
    """

    features: int
    kernel_size: int | Sequence[int] = 3
    strides: int | Sequence[int] = 1
    dilation: int | Sequence[int] = 1
    relu: bool = True
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ndim = x.ndim - 2  # spatial rank: 2 for NHWC, 3 for NDHWC
        kernel = _to_tuple(self.kernel_size, ndim)
        strides = _to_tuple(self.strides, ndim)
        dilation = _to_tuple(self.dilation, ndim)
        padding = [(d * (k // 2), d * (k // 2)) for k, d in zip(kernel, dilation)]
        if ndim == 3 and kernel == (3, 3, 3) and dilation == (1, 1, 1):
            # hot path: switchable conv3d lowering (see ops/conv3d.py)
            x = Conv3DOpt(
                self.features,
                strides=strides[0],
                use_bias=not self.use_bn,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=kernel,
                strides=strides,
                padding=padding,
                kernel_dilation=dilation,
                use_bias=not self.use_bn,
                kernel_init=conv_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=BN_EPS,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ConvTransposeBN(nn.Module):
    """Transposed conv (2D/3D) + BatchNorm, matching torch
    ``ConvTranspose{2,3}d(kernel=3, stride=2, padding=1, output_padding=1)``
    which exactly doubles each spatial dim.

    torch equivalence: ``lax.conv_transpose`` padding per dim is
    ``(k - 1 - p, k - 1 - p + output_padding) = (1, 2)``.
    """

    features: int
    kernel_size: int | Sequence[int] = 3
    strides: int | Sequence[int] = 2
    relu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ndim = x.ndim - 2
        kernel = _to_tuple(self.kernel_size, ndim)
        strides = _to_tuple(self.strides, ndim)
        if ndim == 3 and kernel == (3, 3, 3) and strides == (2, 2, 2):
            # hot path: switchable deconv lowering (see Deconv3DOpt)
            x = Deconv3DOpt(self.features, dtype=self.dtype, name="deconv")(x)
        else:
            # (k - 1 - p, k - 1 - p + op) with p = k // 2, op = s - 1.
            padding = [
                (k - 1 - k // 2, k - 1 - k // 2 + s - 1)
                for k, s in zip(kernel, strides)
            ]
            x = nn.ConvTranspose(
                self.features,
                kernel_size=kernel,
                strides=strides,
                padding=padding,
                use_bias=False,
                kernel_init=conv_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="deconv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=BN_EPS,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """Reference ``submodule.py::BasicBlock`` (expansion=1 residual block):

    ``out = convbn(x, s, d) |> relu |> convbn(s=1, d)``; identity (or strided
    1x1-conv downsample) skip; NO final ReLU (the PSMNet-family quirk: the
    block returns ``out + shortcut`` without activation).
    """

    features: int
    strides: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = ConvBN(
            self.features,
            strides=self.strides,
            dilation=self.dilation,
            relu=True,
            dtype=self.dtype,
            name="conv1",
        )(x, train)
        out = ConvBN(
            self.features,
            strides=1,
            dilation=self.dilation,
            relu=False,
            dtype=self.dtype,
            name="conv2",
        )(out, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = nn.Conv(
                self.features,
                kernel_size=(1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                kernel_init=conv_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="downsample",
            )(x)
        return out + x
