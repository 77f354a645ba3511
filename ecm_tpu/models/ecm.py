"""End-to-end ECM stereo model (reference ``models/stackhourglass.py`` +
``models/basic.py`` forward — SURVEY.md 3.4; components M1-M8 wired together).

Pipeline (train): left/right ``[B, H, W, 3]`` ->
  siamese features ``[B, H/4, W/4, 32]`` ->
  cost volume ``[B, D/4, H/4, W/4, 64]`` (concat) ->
  context-mapped stacked-hourglass 3D aggregation -> 3 cost maps ->
  per-stage trilinear upsample to ``[B, D, H, W]`` -> soft-argmin ->
  3 disparity maps ``[B, H, W]`` (eval: last only).

Shape contract: ``ECMStereo`` needs H, W multiples of 16 (features are /4
and the hourglass encoder strides by 2 twice on the /4 volume, so the
decoder skip-adds only line up when H/4 and W/4 are even-even);
``ECMBasic`` (no hourglass) needs multiples of 4. Callers pad — see
``ecm_tpu.data.preprocess.pad_to_multiple`` and
``ecm_tpu.data.pipeline.make_eval_iterator``.
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


def regress_disparity(
    cost4: jax.Array,
    max_disp: int,
    h: int,
    w: int,
    mode: str,
    train: bool,
) -> jax.Array:
    """Shared regression tail (M5+M6): quarter-res cost map
    ``[B, D/4, H/4, W/4]`` -> disparity ``[B, H, W]``.

    - "fullres": reference-canonical — trilinear-upsample the cost volume to
      [B, D, H, W] then soft-argmin (SURVEY.md 3.4 M5/M6).
    - "fused" (eval only): Pallas kernel computing the identical numerics
      without materializing the full-res volume; train falls through to
      fullres (the kernel is forward-only).
    - "auto" (default): "fused" at eval on TPU backends, "fullres"
      otherwise (train, CPU) — the measured-best exact serving path
      (benchmarks/REGRESSION_PROBE.json) without interpret-mode Pallas on
      CPU. Mirrors ``ECMStereo.agg_layout="auto"``.
    - "lowres": upsample only the DISPARITY axis (4 phase mixes per low-res
      plane), soft-argmin at quarter spatial resolution, then bilinear-
      upsample the disparity map. Approximate (spatial cost mixing happens
      after the softmax instead of before) but measured 12x closer to exact
      than the old x4-scaled low-res softargmin at the same speed
      (benchmarks/REGRESSION_PROBE.json: mean 0.12 px vs 1.50 px, 0.78 ms vs
      0.83 ms/pair) — the fast serving path.
    """
    if mode == "auto":
        mode = (
            "fused"
            if not train and jax.default_backend() == "tpu"
            else "fullres"
        )
    if mode == "lowres":
        from ecm_tpu.ops.upsample import upsample_bilinear

        b, _, h4, w4 = cost4.shape
        cd = upsample_trilinear(cost4, (max_disp, h4, w4))  # D-phase interp
        d_low = disparity_regression(cd, max_disp)  # [B, H/4, W/4]
        return upsample_bilinear(d_low[..., None], (h, w))[..., 0]
    if mode == "fused" and not train:
        from ecm_tpu.ops.pallas_regression import fused_upsample_softargmin

        return fused_upsample_softargmin(cost4, max_disp)
    cost = upsample_trilinear(cost4, (max_disp, h, w))
    return disparity_regression(cost, max_disp)  # [B, H, W]


class ECMStereo(nn.Module):
    """Flagship stacked-hourglass ECM model (reference ``--model stackhourglass``)."""

    max_disp: int = 192
    feature_channels: int = 32
    cost_mode: str = "concat"  # "concat" | "correlation"
    context_fusion: str = "add"
    context_stages: tuple[int, ...] = (0, 1, 2, 3)
    num_hourglass: int = 3
    use_pallas: bool = False
    # fused Pallas aggregation pairs (dres0+ctx / dres1 / classif) at eval:
    # "auto" = on when the backend is TPU. Default "off" BY MEASUREMENT —
    # the kernel compiles+matches on-chip but is ~0.9x the XLA chain
    # (benchmarks/FUSED_AGG.json). See ECMAggregation.fused.
    agg_fused: str = "off"
    # aggregation-volume layout: "standard" (NDHWC), "grouped" (disparity-
    # folded [B, D/16, H/4, W/4, 4*2C] — ecm_tpu.ops.grouped3d; the measured-
    # fastest TPU path, ~2x on the dominant convs), or "auto" = grouped on
    # TPU backends when max_disp permits (D/4 % 16 == 0). Parameters are
    # identical across layouts; checkpoints are interchangeable.
    agg_layout: str = "auto"
    remat: bool = True
    # "auto" (default): "fused" at eval on TPU, "fullres" otherwise.
    # "fullres": reference-canonical — trilinear-upsample the cost volume to
    #   [B, D, H, W] then soft-argmin (SURVEY.md 3.4 M5/M6).
    # "fused": Pallas kernel, exact fullres numerics without the 368 MB
    #   full-res volume. "lowres": approximate fast path (see
    #   regress_disparity docstring / benchmarks/REGRESSION_PROBE.json).
    regress_mode: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, left: jax.Array, right: jax.Array, train: bool = False
    ) -> list[jax.Array]:
        b, h, w, _ = left.shape
        assert h % 16 == 0 and w % 16 == 0, (
            f"ECMStereo needs H,W multiples of 16 (stride-2 hourglass x2 on "
            f"the /4 volume), got {h}x{w} — pad inputs with "
            f"ecm_tpu.data.preprocess.pad_to_multiple(img, 16)"
        )
        d4 = self.max_disp // 4
        dt = self.dtype

        feat = FeatureExtraction(self.feature_channels, dtype=dt, name="feature")
        fl = feat(left, train)  # [B, H/4, W/4, C] — shared weights (siamese)
        fr = feat(right, train)

        layout = self.agg_layout
        if layout == "auto":
            # grouped needs D/4 divisible by 16 (G=4 folding survives the two
            # stride-2 hourglass encoder levels); it wins on TPU, loses on CPU
            layout = (
                "grouped"
                if jax.default_backend() == "tpu" and d4 % 16 == 0
                else "standard"
            )
        if layout == "grouped":
            assert d4 % 16 == 0, (
                f"agg_layout='grouped' needs max_disp/4 % 16 == 0, got {d4}"
            )

        vol = cost_volume(
            fl,
            fr,
            d4,
            mode=self.cost_mode,
            use_pallas=self.use_pallas,
            grouped=layout == "grouped",
        )  # [B, D/4(/G), H/4, W/4, (G*)2C or (G*)1]
        vol = constrain_volume(vol)  # disparity-axis sharding hint (no-op w/o mesh)

        costs4 = ECMAggregation(
            channels=self.feature_channels,
            num_hourglass=self.num_hourglass,
            context_fusion=self.context_fusion,
            context_stages=self.context_stages,
            layout=layout,
            remat=self.remat,
            fused=self.agg_fused,
            dtype=dt,
            name="aggregation",
        )(vol, fl, train)  # list of [B, D/4, H/4, W/4]

        return [
            regress_disparity(cost4, self.max_disp, h, w, self.regress_mode, train)
            for cost4 in costs4
        ]


class ECMBasic(nn.Module):
    """Basic (non-stacked) variant (reference ``models/basic.py``, M8):
    dres0 + 4 residual 3D-conv blocks, single classification head."""

    max_disp: int = 192
    feature_channels: int = 32
    cost_mode: str = "concat"
    context_fusion: str = "add"
    use_pallas: bool = False
    remat: bool = True
    regress_mode: str = "auto"  # see ECMStereo.regress_mode
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, left: jax.Array, right: jax.Array, train: bool = False
    ) -> list[jax.Array]:
        from ecm_tpu.models.context import ContextMapping

        b, h, w, _ = left.shape
        assert h % 4 == 0 and w % 4 == 0, (
            f"ECMBasic needs H,W multiples of 4, got {h}x{w}"
        )
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

        class _ResBlock(nn.Module):
            """dres residual: convBN-ReLU + convBN, identity skip."""

            channels: int
            train: bool = False
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x: jax.Array) -> jax.Array:
                y = ConvBN(self.channels, relu=True, dtype=self.dtype, name="c1")(
                    x, self.train
                )
                y = ConvBN(self.channels, relu=False, dtype=self.dtype, name="c2")(
                    y, self.train
                )
                return x + y

        block_cls = nn.remat(_ResBlock) if self.remat else _ResBlock
        for i in range(4):
            x = block_cls(c, train=train, dtype=dt, name=f"dres{i + 1}")(x)
        cost4 = ClassifHead(c, dtype=dt, name="classif")(x, train)
        cost4 = jnp.squeeze(cost4, axis=-1)
        return [regress_disparity(cost4, self.max_disp, h, w, self.regress_mode, train)]


def build_model(name: str = "stackhourglass", **kwargs) -> nn.Module:
    """Model factory (reference ``models/__init__`` select by ``--model`` flag)."""
    if name in ("stackhourglass", "ecm"):
        return ECMStereo(**kwargs)
    if name == "basic":
        return ECMBasic(**kwargs)
    raise ValueError(f"unknown model {name!r}; expected stackhourglass|ecm|basic")
