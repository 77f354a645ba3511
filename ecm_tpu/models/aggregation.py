"""3D-conv cost aggregation + classification heads (reference components
M4 + M5, SURVEY.md 2.1; canonical ``models/stackhourglass.py``).

Volume layout is channels-last ``[B, D, H, W, C]`` (NDHWC) — XLA lowers the
3D convs onto the MXU with C minor. The stacked-hourglass wiring follows the
canonical reference exactly (see SURVEY.md 3.4):

    cost0 = dres1(dres0(cost)) + dres0(cost)          # residual base
    out1, pre1, post1 = hourglass1(cost0, None, None);   out1 += cost0
    out2, pre2, post2 = hourglass2(out1, pre1, post1);   out2 += cost0
    out3, _,    _     = hourglass3(out2, pre1, post2);   out3 += cost0
    cost_i = classif_i(out_i)   (train: cost2 += cost1; cost3 += cost2;
                                 eval: classif3 alone, no additive chain)

The explicit context mapping (M3) is injected at configurable stages: after
dres0 (stage 0) and/or at each hourglass input (stages 1-3).

``jax.checkpoint`` (flax ``nn.remat``) wraps each hourglass: the
[B,D,H/4,W/4,C] volumes through ~25 3D convs would otherwise blow HBM under
autograd (SURVEY.md section 7 "hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ecm_tpu.models.context import ContextMapping
from ecm_tpu.models.layers import BN_EPS, ConvBN, ConvTransposeBN, conv_init


class Hourglass(nn.Module):
    """One 3D encoder-decoder stage (reference ``hourglass`` class).

    __call__(x, presqu, postsqu, residual=None) -> (out, pre, post):
      out1  = relu(bn(conv s2 C->2C))(x)
      pre   = bn(conv 2C->2C); pre = relu(pre + postsqu) if postsqu else relu(pre)
      out   = relu(bn(conv s2 2C->2C)) |> relu(bn(conv 2C->2C))
      post  = relu(deconvbn 2C->2C + (presqu or pre))
      out   = deconvbn 2C->C + residual   (no relu; residual = the caller's
              ``out_i + cost0``, fused into the grouped Pallas gdeconv)

    ``train`` is a module attribute (not a call arg) so ``nn.remat`` needs no
    static_argnums; in ``nn.compact`` parents the module is rebuilt per call,
    so this costs nothing.

    ``layout="grouped"`` runs on a disparity-folded volume (see
    ``ecm_tpu.ops.grouped3d``) with identical parameters and math.
    """

    channels: int  # C (input/output width); internal width is 2C
    train: bool = False
    layout: str = "standard"  # "standard" | "grouped"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        presqu: jax.Array | None,
        postsqu: jax.Array | None,
        residual: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        c = self.channels
        dt = self.dtype
        train = self.train
        if self.layout == "grouped":
            # full-res x is g=4 (C channels -> 128 lanes); the 2C-channel
            # interior runs at g=2 (also 128 lanes, but only x2 dense-FLOP
            # inflation — measured faster at 64 channels, see GConv3D doc).
            # conv1 transitions 4->2; conv6 emits g=4 back at full res.
            from ecm_tpu.models.grouped_layers import (
                GConvBN,
                GConvBNDown,
                GDeconvBN,
            )

            conv1 = GConvBNDown(2 * c, relu=True, dtype=dt, name="conv1")
            conv2 = GConvBN(
                2 * c, strides=1, relu=False, groups=2, dtype=dt, name="conv2"
            )
            conv3 = GConvBN(
                2 * c, strides=2, relu=True, groups=2, dtype=dt, name="conv3"
            )
            conv4 = GConvBN(
                2 * c, strides=1, relu=True, groups=2, dtype=dt, name="conv4"
            )
            conv5 = GDeconvBN(
                2 * c, relu=False, in_groups=2, out_groups=2, dtype=dt, name="conv5"
            )
            conv6 = GDeconvBN(
                c, relu=False, in_groups=2, out_groups=4, dtype=dt, name="conv6"
            )
        else:
            conv1 = ConvBN(2 * c, strides=2, relu=True, dtype=dt, name="conv1")
            conv2 = ConvBN(2 * c, strides=1, relu=False, dtype=dt, name="conv2")
            conv3 = ConvBN(2 * c, strides=2, relu=True, dtype=dt, name="conv3")
            conv4 = ConvBN(2 * c, strides=1, relu=True, dtype=dt, name="conv4")
            conv5 = ConvTransposeBN(2 * c, relu=False, dtype=dt, name="conv5")
            conv6 = ConvTransposeBN(c, relu=False, dtype=dt, name="conv6")
        # per-stage disp/data sharding re-constraints: GSPMD drops the disp
        # axis through this block otherwise and silently replicates the
        # convs over it (benchmarks/SHARD_DIAG.json — the (4,2) mesh's
        # 0.449 partition efficiency was replicated compute, not comms);
        # no-ops without an active mesh
        from ecm_tpu.parallel.sharding import constrain_volume as _cv

        out = _cv(conv1(x, train))
        pre = _cv(conv2(out, train))
        if postsqu is not None:
            pre = nn.relu(pre + postsqu)
        else:
            pre = nn.relu(pre)
        out = conv3(pre, train)
        out = _cv(conv4(out, train))
        post = _cv(conv5(out, train))
        post = nn.relu(post + (presqu if presqu is not None else pre))
        if self.layout == "grouped":
            # residual (the caller's ``out + cost0``) fused into the conv6
            # Pallas gdeconv epilogue on the dispatched eval path
            out = conv6(post, train, add=residual)
        else:
            out = conv6(post, train)
            if residual is not None:
                out = out + residual
        return _cv(out), pre, post


class ClassifHead(nn.Module):
    """Per-stage head: 3D convBN-ReLU C->C, then 3D conv C->1 (bias, no BN).

    Standard layout returns ``[B, D, H, W, 1]``; grouped layout returns the
    grouped single-channel cost ``[B, D/4, H, W, 4]`` (un-group with
    ``ecm_tpu.ops.grouped3d.ungroup_cost``)."""

    channels: int = 32
    layout: str = "standard"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.layout == "grouped":
            from ecm_tpu.models.grouped_layers import (
                GConv3D,
                GConvBN,
                _gband_enabled,
            )

            if (
                not train
                and _gband_enabled()
                and self.has_variable("params", "conv1")
            ):
                # fused cascade kernel: conv1 + conv2 per row, the 32-ch
                # intermediate stays in VMEM (ops/pallas_gband.py)
                from ecm_tpu.models.layers import BN_EPS
                from ecm_tpu.ops.pallas_gband import gband_classif_head

                p = self.variables["params"]
                s = self.variables["batch_stats"]
                scale = p["conv1"]["bn"]["scale"] / jnp.sqrt(
                    s["conv1"]["bn"]["var"] + BN_EPS
                )
                bias = p["conv1"]["bn"]["bias"] - s["conv1"]["bn"]["mean"] * scale
                return gband_classif_head(
                    x.astype(self.dtype),
                    p["conv1"]["conv"]["kernel"].astype(self.dtype),
                    scale,
                    bias,
                    p["conv2"]["kernel"].astype(self.dtype),
                    p["conv2"]["bias"],
                )
            x = GConvBN(self.channels, relu=True, dtype=self.dtype, name="conv1")(
                x, train
            )
            return GConv3D(1, use_bias=True, dtype=self.dtype, name="conv2")(x)
        from ecm_tpu.models.layers import Conv3DOpt

        x = ConvBN(self.channels, relu=True, dtype=self.dtype, name="conv1")(x, train)
        x = Conv3DOpt(1, use_bias=True, dtype=self.dtype, name="conv2")(x)
        return x  # [B, D, H, W, 1]


class ECMAggregation(nn.Module):
    """Stacked-hourglass aggregation with explicit context mapping.

    Input: cost volume ``[B, D, H/4, W/4, Cin]`` + 2D context features
    ``[B, H/4, W/4, C2]``. Output: list of per-stage cost maps
    ``[B, D, H/4, W/4]`` (3 in train mode, last-only in eval).

    ``fused``: "auto" | "on" | "off" — route the stride-1 conv pairs (dres0
    with the context add folded in, dres1 with its residual, the classif
    head) through the fused Pallas kernel
    (``ecm_tpu.ops.pallas_fused_agg.fused_conv3d_pair``) with
    inference-folded BN. Eval-only (training keeps the autodiff XLA chain;
    BN batch stats cannot fold). "auto" = on when running on a TPU backend.
    Parameters are IDENTICAL across modes (the fused path reads the ConvBN
    param/stat tree directly), so checkpoints are interchangeable.
    """

    channels: int = 32
    num_hourglass: int = 3
    context_fusion: str = "add"  # see ContextMapping
    context_stages: tuple[int, ...] = (0, 1, 2, 3)  # 0 = after dres0
    # "standard": NDHWC volume [B, D, H, W, C]. "grouped": disparity-folded
    # [B, D/4, H, W, 4C] (ecm_tpu.ops.grouped3d) — the measured-fastest TPU
    # layout (benchmarks/CONV3D_PROBE*.json); the input volume must already
    # be grouped (cost_volume(..., grouped=True)). Same parameters either way.
    layout: str = "standard"
    remat: bool = True
    # "auto" | "on" | "off". Default OFF by measurement: the kernel compiles
    # and matches on-chip (benchmarks/TPU_CHECKS.json) but runs at ~0.9x of
    # the XLA chain at the production shape (benchmarks/FUSED_AGG.json).
    # Flipping to "auto" as default requires a committed FUSED_AGG.json
    # showing it winning — see benchmarks/run_tpu_checks.py and the policy
    # note in .claude/skills/verify/SKILL.md.
    fused: str = "off"
    dtype: jnp.dtype = jnp.float32

    def _fold_convbn(self, name: str):
        """Inference-fold a ConvBN child's BN into (kernel, scale, bias).
        ``name`` may be a nested "a/b" path into the param tree."""
        p = self.variables["params"]
        s = self.variables["batch_stats"]
        for part in name.split("/"):
            p, s = p[part], s[part]
        scale = p["bn"]["scale"] / jnp.sqrt(s["bn"]["var"] + BN_EPS)
        bias = p["bn"]["bias"] - s["bn"]["mean"] * scale
        return p["conv"]["kernel"], scale, bias

    @nn.compact
    def __call__(
        self, volume: jax.Array, ctx2d: jax.Array, train: bool = False
    ) -> list[jax.Array]:
        c = self.channels
        dt = self.dtype
        grouped = self.layout == "grouped"

        use_fused = (
            not train
            and not grouped  # the fused kernel reads the NDHWC layout
            and self.context_fusion in ("add", "none")
            and (
                self.fused == "on"
                or (self.fused == "auto" and jax.default_backend() == "tpu")
            )
            and self.has_variable("params", "dres0_1")  # init ran (train path)
        )
        # grouped eval: run the dres0/dres1 block through the gband Pallas
        # kernel with the context broadcast-add and the dres1 residual fused
        # into its epilogue (each otherwise costs a separate full-volume HBM
        # read-modify-write pass) — same gate as GConvBN's dispatch
        from ecm_tpu.models.grouped_layers import _gband_enabled

        use_gband_block = (
            not train
            and grouped
            and self.context_fusion in ("add", "none")
            and _gband_enabled()
            and self.has_variable("params", "dres0_1")
        )

        def ctx(stage: int, name: str):
            if self.context_fusion != "none" and stage in self.context_stages:
                return ContextMapping(
                    channels3d=c,
                    fusion=self.context_fusion,
                    grouped=grouped,
                    dtype=dt,
                    name=name,
                )
            return None

        if use_fused:
            from ecm_tpu.ops.pallas_fused_agg import fused_conv3d_pair

            ctx_map = None
            if self.context_fusion == "add" and 0 in self.context_stages:
                ctx_map = ContextMapping(
                    channels3d=c,
                    fusion="add",
                    dtype=dt,
                    return_map=True,
                    name="context0",
                )(ctx2d, None, train)
            x = fused_conv3d_pair(
                volume,
                *self._fold_convbn("dres0_1"),
                *self._fold_convbn("dres0_2"),
                ctx=ctx_map,
            )
            cost0 = fused_conv3d_pair(
                x,
                *self._fold_convbn("dres1_1"),
                *self._fold_convbn("dres1_2"),
                relu2=False,
                residual=True,
            )
        elif use_gband_block:
            from ecm_tpu.ops.pallas_gband import gband_conv_bn_s1

            ctx_map = None
            if self.context_fusion == "add" and 0 in self.context_stages:
                m = ContextMapping(
                    channels3d=c,
                    fusion="add",
                    dtype=dt,
                    return_map=True,
                    name="context0",
                )(ctx2d, None, train)  # [B, H, W, C]
                ctx_map = jnp.tile(m, (1, 1, 1, 4))[:, None]  # [B,1,H,W,4C]
            w = volume.shape[3]
            if w % 8 == 0:
                # padded flow: interior results stay in the kernels' padded
                # form so the chain pays ONE pad pass instead of four
                # (each XLA pad is a full-volume copy, ~0.3-0.6 ms/pair —
                # AGG_TRACE.json jit(_pad) rows)
                x = gband_conv_bn_s1(
                    volume, *self._fold_convbn("dres0_1"), emit_padded=True
                )
                x = gband_conv_bn_s1(
                    x, *self._fold_convbn("dres0_2"), add=ctx_map,
                    prepadded_w=w, emit_padded=True,
                )
                y = gband_conv_bn_s1(
                    x, *self._fold_convbn("dres1_1"),
                    prepadded_w=w, emit_padded=True,
                )
                cost0 = gband_conv_bn_s1(
                    y, *self._fold_convbn("dres1_2"), relu=False, add=x,
                    prepadded_w=w, add_padded=True,
                )
            else:
                x = gband_conv_bn_s1(volume, *self._fold_convbn("dres0_1"))
                x = gband_conv_bn_s1(
                    x, *self._fold_convbn("dres0_2"), add=ctx_map
                )
                y = gband_conv_bn_s1(x, *self._fold_convbn("dres1_1"))
                cost0 = gband_conv_bn_s1(
                    y, *self._fold_convbn("dres1_2"), relu=False, add=x
                )
        else:
            from ecm_tpu.parallel.sharding import constrain_volume as _cv

            if grouped:
                from ecm_tpu.models.grouped_layers import GConvBN as _CBN
            else:
                _CBN = ConvBN
            # dres0: 2x 3D convBN-ReLU, 2C -> C (per-stage sharding
            # re-constraints: see Hourglass.__call__ / SHARD_DIAG.json)
            x = _cv(_CBN(c, relu=True, dtype=dt, name="dres0_1")(volume, train))
            x = _cv(_CBN(c, relu=True, dtype=dt, name="dres0_2")(x, train))
            cm0 = ctx(0, "context0")
            if cm0 is not None:
                x = cm0(ctx2d, x, train)
            # dres1: residual (convBN-ReLU, convBN) + x
            y = _cv(_CBN(c, relu=True, dtype=dt, name="dres1_1")(x, train))
            y = _cv(_CBN(c, relu=False, dtype=dt, name="dres1_2")(y, train))
            cost0 = y + x

        hg_cls = nn.remat(Hourglass) if self.remat else Hourglass

        outs: list[jax.Array] = []
        pre1 = post_prev = None
        inp = cost0
        for i in range(self.num_hourglass):
            cmi = ctx(i + 1, f"context{i + 1}")
            if cmi is not None:
                inp = cmi(ctx2d, inp, train)
            presqu = pre1 if i > 0 else None
            postsqu = post_prev if i > 0 else None
            out, pre, post = hg_cls(
                c, train=train, layout=self.layout, dtype=dt, name=f"hourglass{i + 1}"
            )(inp, presqu, postsqu, cost0)  # cost0 residual fused into conv6
            if i == 0:
                pre1 = pre
            post_prev = post
            outs.append(out)
            inp = out

        costs: list[jax.Array] = []
        prev_cost = None
        for i, out in enumerate(outs):
            last = i == len(outs) - 1
            if not (train or last):
                continue  # eval: only the last head runs (reference semantics)
            if use_fused:
                from ecm_tpu.ops.pallas_fused_agg import fused_conv3d_pair

                p2 = self.variables["params"][f"classif{i + 1}"]["conv2"]
                cost = fused_conv3d_pair(
                    out,
                    *self._fold_convbn(f"classif{i + 1}/conv1"),
                    p2["kernel"],
                    jnp.ones((1,), jnp.float32),
                    p2["bias"],
                    relu2=False,
                )
            else:
                cost = ClassifHead(
                    c, layout=self.layout, dtype=dt, name=f"classif{i + 1}"
                )(out, train)
            if train and prev_cost is not None:
                cost = cost + prev_cost
            prev_cost = cost if train else None
            from ecm_tpu.parallel.sharding import constrain_volume as _cvc

            if grouped:
                from ecm_tpu.ops.grouped3d import ungroup_cost

                costs.append(_cvc(ungroup_cost(cost)))  # [B, D, H/4, W/4]
            else:
                costs.append(_cvc(jnp.squeeze(cost, axis=-1)))
        return costs
