"""Parity tests for the disparity-folded (grouped) aggregation layout
(ecm_tpu/ops/grouped3d.py, ecm_tpu/models/grouped_layers.py) against the
standard NDHWC path — same parameters, same math, TPU-friendly lanes.

Tolerance note: op- and layer-level checks are near-exact (f32 reorder
noise). Full-stack eval checks use the same envelope as the conv3d-lowering
tests: at untrained weights the ~25-layer stack amplifies impl-order noise
to ~0.5% of activation magnitude (measured identically BETWEEN the standard
xla/packed/decomposed lowerings), so stack-level assertions are relative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.models.aggregation import ECMAggregation
from ecm_tpu.models.grouped_layers import BatchNormG, GConvBN, GDeconvBN
from ecm_tpu.models.layers import ConvBN, ConvTransposeBN
from ecm_tpu.ops.conv3d import conv3d_xla, conv_transpose3d_phased
from ecm_tpu.ops.cost_volume import (
    cost_volume_concat_jnp,
    cost_volume_correlation_jnp,
    cost_volume_grouped_jnp,
)
from ecm_tpu.ops.grouped3d import (
    conv_transpose3d_phased_grouped,
    from_grouped,
    grouped_conv3d,
    to_grouped,
    ungroup_cost,
)

RNG = np.random.default_rng(7)


def _arr(*shape):
    return jnp.asarray(RNG.normal(size=shape).astype(np.float32))


def test_grouped_roundtrip():
    x = _arr(2, 16, 6, 10, 6)
    assert jnp.array_equal(from_grouped(to_grouped(x)), x)


@pytest.mark.parametrize("impl", ["banded", "halo", "auto"])
@pytest.mark.parametrize("stride", [1, 2])
def test_grouped_conv3d_matches_xla(stride, impl):
    x = _arr(2, 16, 8, 12, 6)
    k = _arr(3, 3, 3, 6, 5)
    ref = conv3d_xla(x, k, (stride,) * 3, ((1, 1),) * 3)
    out = from_grouped(grouped_conv3d(to_grouped(x), k, stride, impl=impl))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("impl", ["banded", "halo", "auto"])
def test_grouped_down_conv_matches_xla(impl):
    from ecm_tpu.ops.grouped3d import grouped_conv3d_down

    x = _arr(2, 16, 8, 12, 6)
    k = _arr(3, 3, 3, 6, 5)
    ref = conv3d_xla(x, k, (2, 2, 2), ((1, 1),) * 3)
    out = from_grouped(grouped_conv3d_down(to_grouped(x, 4), k, 4, impl=impl), 2)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("g", [2, 4])
def test_halo_conv3d_matches_banded_and_xla(g):
    from ecm_tpu.ops.grouped3d import grouped_conv3d_halo

    x = _arr(2, 16, 8, 12, 6)
    k = _arr(3, 3, 3, 6, 5)
    ref = conv3d_xla(x, k, (1, 1, 1), ((1, 1),) * 3)
    out = from_grouped(grouped_conv3d_halo(to_grouped(x, g), k, g), g)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("g_in", [2, 4])
def test_halo_down_conv_matches_xla(g_in):
    from ecm_tpu.ops.grouped3d import grouped_conv3d_down_halo

    x = _arr(2, 16, 8, 12, 6)
    k = _arr(3, 3, 3, 6, 5)
    ref = conv3d_xla(x, k, (2, 2, 2), ((1, 1),) * 3)
    out = from_grouped(
        grouped_conv3d_down_halo(to_grouped(x, g_in), k, g_in), g_in // 2
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)


def test_slot_halo_layout():
    from ecm_tpu.ops.grouped3d import slot_halo

    x = _arr(1, 8, 4, 6, 3)  # D=8, C=3, g=4 -> Dg=2
    xg = to_grouped(x)
    xh = np.asarray(slot_halo(xg))
    xn = np.asarray(x)
    # halo block p holds plane slot p-1 of the group (zeros off-range)
    for dg in range(2):
        for p in range(6):
            d = 4 * dg + p - 1
            want = xn[:, d] if 0 <= d < 8 else np.zeros_like(xn[:, 0])
            np.testing.assert_array_equal(xh[:, dg, :, :, 3 * p : 3 * (p + 1)], want)


def test_grouped_deconv_matches_phased():
    x = _arr(2, 16, 8, 12, 6)
    k = _arr(3, 3, 3, 6, 5)
    ref = conv_transpose3d_phased(x, k)
    out = from_grouped(conv_transpose3d_phased_grouped(x, k))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)


def test_ungroup_cost():
    c = _arr(2, 4, 6, 10, 4)
    u = np.asarray(ungroup_cost(c))
    cn = np.asarray(c)
    for dg in range(4):
        for p in range(4):
            np.testing.assert_array_equal(u[:, 4 * dg + p], cn[:, dg, :, :, p])


@pytest.mark.parametrize("mode", ["concat", "correlation"])
def test_grouped_cost_volume(mode):
    fl, fr = _arr(2, 8, 12, 6), _arr(2, 8, 12, 6)
    std = (
        cost_volume_concat_jnp(fl, fr, 16)
        if mode == "concat"
        else cost_volume_correlation_jnp(fl, fr, 16)
    )
    grp = cost_volume_grouped_jnp(fl, fr, 16, mode=mode)
    np.testing.assert_array_equal(grp, to_grouped(std))


@pytest.mark.parametrize("stride", [1, 2])
def test_gconvbn_matches_convbn(stride):
    x = _arr(2, 16, 8, 12, 6)
    xg = to_grouped(x)
    cs, cg = ConvBN(10, strides=stride), GConvBN(10, strides=stride)
    v = cs.init({"params": jax.random.PRNGKey(1)}, x, True)
    vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
    # train: outputs AND running-stat updates must agree
    ys, ms = cs.apply(vars_, x, True, mutable=["batch_stats"])
    yg, mg = cg.apply(vars_, xg, True, mutable=["batch_stats"])
    np.testing.assert_allclose(from_grouped(yg), ys, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        ms["batch_stats"],
        mg["batch_stats"],
    )
    # eval (running-average stats)
    ys = cs.apply(vars_, x, False)
    yg = cg.apply(vars_, xg, False)
    np.testing.assert_allclose(from_grouped(yg), ys, atol=1e-4)


def test_gdeconvbn_matches_convtransposebn():
    x = _arr(2, 8, 6, 10, 6)
    xg = to_grouped(x)
    ds, dg = ConvTransposeBN(10), GDeconvBN(10)
    v = ds.init({"params": jax.random.PRNGKey(1)}, x, True)
    vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
    ys, ms = ds.apply(vars_, x, True, mutable=["batch_stats"])
    yg, mg = dg.apply(vars_, xg, True, mutable=["batch_stats"])
    np.testing.assert_allclose(from_grouped(yg), ys, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        ms["batch_stats"],
        mg["batch_stats"],
    )


def test_batchnormg_matches_flax_batchnorm():
    x = _arr(2, 8, 6, 10, 12)
    xg = to_grouped(x)
    import flax.linen as nn

    bns = nn.BatchNorm(momentum=0.9, epsilon=1e-5, param_dtype=jnp.float32)
    bng = BatchNormG()
    v = bns.init(jax.random.PRNGKey(0), x, use_running_average=False)
    vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
    ys, ms = bns.apply(vars_, x, use_running_average=False, mutable=["batch_stats"])
    yg, mg = bng.apply(vars_, xg, use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(from_grouped(yg), ys, atol=1e-5)
    np.testing.assert_allclose(
        ms["batch_stats"]["mean"], mg["batch_stats"]["mean"], atol=1e-6
    )
    np.testing.assert_allclose(
        ms["batch_stats"]["var"], mg["batch_stats"]["var"], atol=1e-6
    )


def test_aggregation_grouped_matches_standard_train():
    """Train path (batch-stat BN contracts per layer): tight parity."""
    vol = _arr(2, 16, 8, 12, 12)
    ctx2d = _arr(2, 8, 12, 6)
    agg_s = ECMAggregation(channels=6, layout="standard")
    agg_g = ECMAggregation(channels=6, layout="grouped")
    v = agg_s.init({"params": jax.random.PRNGKey(0)}, vol, ctx2d, True)
    vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
    os_, ms = agg_s.apply(vars_, vol, ctx2d, True, mutable=["batch_stats"])
    og_, mg = agg_g.apply(vars_, to_grouped(vol), ctx2d, True, mutable=["batch_stats"])
    assert len(os_) == len(og_) == 3
    for a, b in zip(os_, og_):
        assert a.shape == b.shape
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3),
        ms["batch_stats"],
        mg["batch_stats"],
    )


def test_model_grouped_matches_standard():
    """Full flagship model, eval: relative tolerance at the measured
    impl-to-impl envelope (module docstring)."""
    from ecm_tpu.models import build_model

    left, right = _arr(1, 32, 48, 3), _arr(1, 32, 48, 3)
    m_s = build_model("stackhourglass", max_disp=64, agg_layout="standard")
    m_g = build_model("stackhourglass", max_disp=64, agg_layout="grouped")
    v = m_s.init({"params": jax.random.PRNGKey(0)}, left, right, train=True)
    vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
    o_s, _ = m_s.apply(vars_, left, right, train=True, mutable=["batch_stats"])
    o_g, _ = m_g.apply(vars_, left, right, train=True, mutable=["batch_stats"])
    assert len(o_s) == len(o_g) == 3
    for a, b in zip(o_s, o_g):
        # disparity maps in [0, 64): soft-argmin amplifies the conv-order
        # noise of ANY two lowerings to ~0.5 px at untrained weights
        assert float(jnp.max(jnp.abs(a - b))) < 2.0
        assert float(jnp.mean(jnp.abs(a - b))) < 0.2


def test_model_grouped_gradients():
    """Grouped layout is fully differentiable: one train-style grad step
    produces finite grads matching the standard layout's within tolerance."""
    from ecm_tpu.models import build_model

    left, right = _arr(1, 32, 48, 3), _arr(1, 32, 48, 3)
    gt = jnp.abs(_arr(1, 32, 48)) * 10.0

    def loss_fn(params, model, bs):
        outs, _ = model.apply(
            {"params": params, "batch_stats": bs},
            left,
            right,
            train=True,
            mutable=["batch_stats"],
        )
        mask = (gt > 0) & (gt < 64)
        return sum(
            w * jnp.sum(jnp.abs(o - gt) * mask) / jnp.maximum(mask.sum(), 1)
            for w, o in zip((0.5, 0.7, 1.0), outs)
        )

    m_s = build_model("stackhourglass", max_disp=64, agg_layout="standard")
    m_g = build_model("stackhourglass", max_disp=64, agg_layout="grouped")
    v = m_s.init({"params": jax.random.PRNGKey(0)}, left, right, train=True)
    gs = jax.grad(loss_fn)(v["params"], m_s, v["batch_stats"])
    gg = jax.grad(loss_fn)(v["params"], m_g, v["batch_stats"])
    norm_s = float(
        jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(gs)))
    )
    norm_g = float(
        jnp.sqrt(sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(gg)))
    )
    assert np.isfinite(norm_s) and np.isfinite(norm_g)
    assert abs(norm_s - norm_g) / norm_s < 0.05
