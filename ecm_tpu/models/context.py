"""Explicit context-mapping module (reference component M3 — the paper's
novelty, SURVEY.md 2.1).

The reference injects *global scene context*, derived from the 2D image
features, into each 3D cost-aggregation stage (BASELINE.json:5: "explicit
context-mapping modules that inject global scene context into aggregation").
The exact reference wiring could not be verified (empty mount — SURVEY.md
section 0), so per SURVEY.md section 7 ("build it behind a narrow interface")
this module is parameterizable over the fusion mechanism:

- ``"add"`` (default): a *spatial context map* — 2D features -> 3x3 convBN-ReLU
  -> 1x1 conv to the 3D channel width -> broadcast along the disparity axis ->
  added into the volume. This is the literal "explicit context mapping":
  a learned per-pixel context signal replicated across all disparity
  hypotheses, letting aggregation see monocular scene structure.
- ``"film"``: a *global context vector* — global-avg-pooled features -> MLP ->
  per-channel scale (1 + tanh) and shift applied to the volume (feature-wise
  linear modulation).
- ``"both"``: add + film.
- ``"none"``: disabled (ablation / pure-PSMNet behavior).

Interface: ``ContextMapping(channels3d)(ctx2d, volume, train) -> volume`` with
``ctx2d: [B, H, W, C2]`` (left-image features) and
``volume: [B, D, H, W, C3]``. The broadcast along D is free under XLA fusion
(no materialized D copies); the Pallas fused-aggregation kernel folds the add
into the first 3D-conv read (SURVEY.md 2.5 item 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ecm_tpu.models.layers import ConvBN, conv_init


class ContextMapping(nn.Module):
    """Maps 2D scene context into a 3D cost-aggregation volume.

    ``return_map=True`` (valid for ``fusion="add"`` only) returns the 2D
    context map ``[B, H, W, C3]`` INSTEAD of applying it — the fused Pallas
    aggregation kernel folds the broadcast add into its epilogue
    (``ecm_tpu.ops.pallas_fused_agg``), so the caller needs the raw map.
    Parameters are shared with the applying form (same name/scope).
    """

    channels3d: int
    fusion: str = "add"  # "add" | "film" | "both" | "none"
    hidden: int = 128
    return_map: bool = False
    # volume arrives disparity-folded [B, D/4, H, W, 4*channels3d]
    # (ecm_tpu.ops.grouped3d): the per-channel map/FiLM vectors tile x4 along
    # the grouped channel dim — same math, same parameters.
    grouped: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, ctx2d: jax.Array, volume: jax.Array | None, train: bool = False
    ) -> jax.Array:
        if self.return_map:
            assert self.fusion == "add", self.fusion
            m = ConvBN(self.hidden, kernel_size=3, dtype=self.dtype, name="map_conv")(
                ctx2d, train
            )
            return nn.Conv(
                self.channels3d,
                kernel_size=(1, 1),
                use_bias=True,
                kernel_init=conv_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="map_proj",
            )(m)
        if self.fusion == "none":
            return volume
        c3 = self.channels3d
        gmul = 1
        if self.grouped:
            from ecm_tpu.ops.grouped3d import G as gmul
        assert volume.shape[-1] == gmul * c3, (volume.shape, c3, gmul)
        out = volume
        if self.fusion in ("add", "both"):
            m = ConvBN(self.hidden, kernel_size=3, dtype=self.dtype, name="map_conv")(
                ctx2d, train
            )
            m = nn.Conv(
                c3,
                kernel_size=(1, 1),
                use_bias=True,
                kernel_init=conv_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="map_proj",
            )(m)
            if self.grouped:
                m = jnp.tile(m, (1, 1, 1, gmul))  # [B, H, W, G*C3]
            # [B, H, W, (G*)C3] -> broadcast over D(-groups): [B, 1, H, W, .]
            out = out + m[:, None].astype(out.dtype)
        if self.fusion in ("film", "both"):
            g = jnp.mean(ctx2d.astype(jnp.float32), axis=(1, 2))  # [B, C2]
            g = nn.Dense(
                self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name="film_h"
            )(g.astype(self.dtype))
            g = nn.relu(g)
            ss = nn.Dense(
                2 * c3, dtype=self.dtype, param_dtype=jnp.float32, name="film_out"
            )(g)
            scale, shift = jnp.split(ss, 2, axis=-1)  # [B, C3] each
            if self.grouped:
                scale = jnp.tile(scale, (1, gmul))
                shift = jnp.tile(shift, (1, gmul))
            scale = (1.0 + jnp.tanh(scale))[:, None, None, None, :]
            shift = shift[:, None, None, None, :]
            out = out * scale.astype(out.dtype) + shift.astype(out.dtype)
        return out
