"""End-to-end ECM stereo model (reference ``models/stackhourglass.py`` +
``models/basic.py`` forward — SURVEY.md 3.4; components M1-M8 wired together).

Pipeline (train): left/right ``[B, H, W, 3]`` ->
  siamese features ``[B, H/4, W/4, 32]`` ->
  cost volume ``[B, D/4, H/4, W/4, 64]`` (concat) ->
  context-mapped stacked-hourglass 3D aggregation -> 3 cost maps ->
  per-stage trilinear upsample to ``[B, D, H, W]`` -> soft-argmin ->
  3 disparity maps ``[B, H, W]`` (eval: last only).

H and W must be multiples of 4 (callers pad — see
``ecm_tpu.data.preprocess.pad_to_multiple``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ecm_tpu.models.aggregation import ClassifHead, ECMAggregation
from ecm_tpu.models.features import FeatureExtraction
from ecm_tpu.models.layers import ConvBN
from ecm_tpu.ops.cost_volume import cost_volume
from ecm_tpu.ops.softargmin import disparity_regression
from ecm_tpu.ops.upsample import upsample_trilinear
from ecm_tpu.parallel.sharding import constrain_volume


class ECMStereo(nn.Module):
    """Flagship stacked-hourglass ECM model (reference ``--model stackhourglass``)."""

    max_disp: int = 192
    feature_channels: int = 32
    cost_mode: str = "concat"  # "concat" | "correlation"
    context_fusion: str = "add"
    context_stages: tuple[int, ...] = (0, 1, 2, 3)
    num_hourglass: int = 3
    use_pallas: bool = False
    remat: bool = True
    # "fullres": reference-canonical — trilinear-upsample the cost volume to
    #   [B, D, H, W] then soft-argmin (SURVEY.md 3.4 M5/M6).
    # "lowres": soft-argmin at quarter resolution, scale x4, bilinear-upsample
    #   the disparity map — avoids materializing the 368 MB full-res volume;
    #   different (cheaper) numerics, offered as the fast serving path.
    regress_mode: str = "fullres"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, left: jax.Array, right: jax.Array, train: bool = False
    ) -> list[jax.Array]:
        b, h, w, _ = left.shape
        assert h % 4 == 0 and w % 4 == 0, f"H,W must be multiples of 4, got {h}x{w}"
        d4 = self.max_disp // 4
        dt = self.dtype

        feat = FeatureExtraction(self.feature_channels, dtype=dt, name="feature")
        fl = feat(left, train)  # [B, H/4, W/4, C] — shared weights (siamese)
        fr = feat(right, train)

        vol = cost_volume(
            fl, fr, d4, mode=self.cost_mode, use_pallas=self.use_pallas
        )  # [B, D/4, H/4, W/4, 2C or 1]
        vol = constrain_volume(vol)  # disparity-axis sharding hint (no-op w/o mesh)

        costs4 = ECMAggregation(
            channels=self.feature_channels,
            num_hourglass=self.num_hourglass,
            context_fusion=self.context_fusion,
            context_stages=self.context_stages,
            remat=self.remat,
            dtype=dt,
            name="aggregation",
        )(vol, fl, train)  # list of [B, D/4, H/4, W/4]

        disps = []
        for cost4 in costs4:
            if self.regress_mode == "lowres":
                from ecm_tpu.ops.softargmin import softargmin_jnp
                from ecm_tpu.ops.upsample import upsample_bilinear

                d4_map = softargmin_jnp(cost4) * 4.0  # [B, H/4, W/4]
                disp = upsample_bilinear(d4_map[..., None], (h, w))[..., 0]
            elif self.regress_mode == "fused" and not train:
                # Pallas-fused upsample+soft-argmin (identical numerics to
                # fullres; forward-only, so train falls through to fullres)
                from ecm_tpu.ops.pallas_regression import fused_upsample_softargmin

                disp = fused_upsample_softargmin(cost4, self.max_disp)
            else:
                cost = upsample_trilinear(cost4, (self.max_disp, h, w))
                disp = disparity_regression(cost, self.max_disp)  # [B, H, W]
            disps.append(disp)
        return disps


class ECMBasic(nn.Module):
    """Basic (non-stacked) variant (reference ``models/basic.py``, M8):
    dres0 + 4 residual 3D-conv blocks, single classification head."""

    max_disp: int = 192
    feature_channels: int = 32
    cost_mode: str = "concat"
    context_fusion: str = "add"
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, left: jax.Array, right: jax.Array, train: bool = False
    ) -> list[jax.Array]:
        from ecm_tpu.models.context import ContextMapping

        b, h, w, _ = left.shape
        d4 = self.max_disp // 4
        c = self.feature_channels
        dt = self.dtype

        feat = FeatureExtraction(c, dtype=dt, name="feature")
        fl = feat(left, train)
        fr = feat(right, train)
        vol = cost_volume(fl, fr, d4, mode=self.cost_mode, use_pallas=self.use_pallas)
        vol = constrain_volume(vol)

        x = ConvBN(c, relu=True, dtype=dt, name="dres0_1")(vol, train)
        x = ConvBN(c, relu=True, dtype=dt, name="dres0_2")(x, train)
        if self.context_fusion != "none":
            x = ContextMapping(
                channels3d=c, fusion=self.context_fusion, dtype=dt, name="context0"
            )(fl, x, train)
        for i in range(4):
            y = ConvBN(c, relu=True, dtype=dt, name=f"dres{i + 1}_1")(x, train)
            y = ConvBN(c, relu=False, dtype=dt, name=f"dres{i + 1}_2")(y, train)
            x = x + y
        cost4 = ClassifHead(c, dtype=dt, name="classif")(x, train)
        cost4 = jnp.squeeze(cost4, axis=-1)
        cost = upsample_trilinear(cost4, (self.max_disp, h, w))
        return [disparity_regression(cost, self.max_disp)]


def build_model(name: str = "stackhourglass", **kwargs) -> nn.Module:
    """Model factory (reference ``models/__init__`` select by ``--model`` flag)."""
    if name in ("stackhourglass", "ecm"):
        return ECMStereo(**kwargs)
    if name == "basic":
        return ECMBasic(**kwargs)
    raise ValueError(f"unknown model {name!r}; expected stackhourglass|ecm|basic")
