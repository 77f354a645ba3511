"""Siamese feature extractor (reference component M1, SURVEY.md 2.1).

Reference: ``models/submodule.py::feature_extraction`` — CNN stem (3x 3x3
conv-BN-ReLU, first stride 2), residual stages (32x3, 64x16 s2, 128x3 dil2,
128x3 dil4), SPP branches (avg-pool 64/32/16/8 -> 1x1 conv -> 32ch -> bilinear
upsample), concat(layer2 64ch, layer4 128ch, 4x SPP 32ch) = 320ch -> 3x3 conv
128 -> 1x1 conv 32. Output ``[B, H/4, W/4, 32]`` per image; the SAME module
(shared weights) runs on left and right images (siamese).

TPU-native: NHWC layout; avg-pool windows are clipped to the input size so
small test images work; the 1x1 output conv has no BN/ReLU (reference quirk —
the feature map feeding the cost volume is unbounded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ecm_tpu.models.layers import BasicBlock, ConvBN, conv_init
from ecm_tpu.ops.upsample import upsample_bilinear


class SPPBranch(nn.Module):
    """One spatial-pyramid-pooling branch: avg-pool(s) -> 1x1 convbn-relu ->
    bilinear upsample back to the feature resolution."""

    pool: int
    features: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        _, h, w, _ = x.shape
        win = (min(self.pool, h), min(self.pool, w))
        y = nn.avg_pool(x, window_shape=win, strides=win, padding="VALID")
        y = ConvBN(
            self.features, kernel_size=1, relu=True, dtype=self.dtype, name="conv"
        )(y, train)
        return upsample_bilinear(y, (h, w))


class FeatureExtraction(nn.Module):
    """Shared-weight feature CNN: images ``[B, H, W, 3]`` -> ``[B, H/4, W/4, C]``."""

    out_channels: int = 32
    num_layer2_blocks: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from ecm_tpu.parallel.sharding import constrain_features as _cf

        dt = self.dtype
        x = x.astype(dt)
        # firstconv: 3x (3x3 conv-BN-ReLU), first stride 2  (H -> H/2)
        x = ConvBN(32, strides=2, dtype=dt, name="firstconv1")(x, train)
        x = ConvBN(32, strides=1, dtype=dt, name="firstconv2")(x, train)
        x = _cf(ConvBN(32, strides=1, dtype=dt, name="firstconv3")(x, train))
        # layer1: 3x BasicBlock 32ch stride 1
        for i in range(3):
            x = BasicBlock(32, dtype=dt, name=f"layer1_{i}")(x, train)
        # layer2: 16x BasicBlock 64ch, first stride 2  (H/2 -> H/4)
        x = _cf(BasicBlock(64, strides=2, dtype=dt, name="layer2_0")(x, train))
        for i in range(1, self.num_layer2_blocks):
            x = BasicBlock(64, dtype=dt, name=f"layer2_{i}")(x, train)
        raw = _cf(x)  # 64ch skip into the fusion concat
        x = raw
        # layer3: 3x BasicBlock 128ch dilation 2
        for i in range(3):
            x = BasicBlock(128, dilation=2, dtype=dt, name=f"layer3_{i}")(x, train)
        # layer4: 3x BasicBlock 128ch dilation 4
        for i in range(3):
            x = BasicBlock(128, dilation=4, dtype=dt, name=f"layer4_{i}")(x, train)
        skip = _cf(x)  # 128ch
        # SPP: 4 pooling branches, 32ch each
        branches = [
            SPPBranch(pool=p, dtype=dt, name=f"branch{p}")(x, train)
            for p in (64, 32, 16, 8)
        ]
        fused = jnp.concatenate([raw, skip, *branches], axis=-1)  # 320ch
        fused = ConvBN(128, kernel_size=3, dtype=dt, name="lastconv1")(fused, train)
        # final 1x1 conv: no BN, no ReLU (reference quirk)
        fused = nn.Conv(
            self.out_channels,
            kernel_size=(1, 1),
            use_bias=False,
            kernel_init=conv_init,
            dtype=dt,
            param_dtype=jnp.float32,
            name="lastconv2",
        )(fused)
        return _cf(fused)
