"""Parity tests for the Pallas gband kernel (ecm_tpu/ops/pallas_gband.py):
fused grouped stride-1 conv + BN-affine + ReLU vs the banded XLA chain.
CPU runs in interpret mode (the Mosaic compile is gated on-chip by
benchmarks/run_tpu_checks.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.models.grouped_layers import GConvBN
from ecm_tpu.ops.grouped3d import from_grouped, to_grouped
from ecm_tpu.ops.pallas_gband import gband_conv_bn_s1, gband_reference

RNG = np.random.default_rng(11)


def _arr(*shape):
    return jnp.asarray(RNG.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("impl", ["refs", "roll"])
@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("g,cin,cout", [(4, 6, 5), (4, 8, 4), (2, 6, 6)])
def test_gband_matches_reference(g, cin, cout, relu, impl):
    xg = to_grouped(_arr(2, 4 * g, 6, 8, cin), g)
    k = _arr(3, 3, 3, cin, cout)
    scale = jnp.abs(_arr(cout)) + 0.5
    bias = _arr(cout)
    out = gband_conv_bn_s1(xg, k, scale, bias, g=g, relu=relu, impl=impl)
    ref = gband_reference(xg, k, scale, bias, g=g, relu=relu)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("impl", ["refs", "roll"])
def test_gband_cout1_bias_only(impl):
    """The classif-head exit conv: Cout=1, identity scale, bias epilogue."""
    xg = to_grouped(_arr(1, 16, 6, 8, 6), 4)
    k = _arr(3, 3, 3, 6, 1)
    bias = _arr(1)
    out = gband_conv_bn_s1(xg, k, jnp.ones((1,)), bias, g=4, relu=False, impl=impl)
    ref = gband_reference(xg, k, jnp.ones((1,)), bias, g=4, relu=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("impl", ["refs", "roll"])
@pytest.mark.parametrize("add_dg", [1, None, "full"])
def test_gband_fused_add(impl, add_dg):
    """Fused post-activation add: ctx broadcast ([B,1,H,W,N]) and residual
    ([B,Dg,H,W,N]) forms, both impls."""
    g, cin, cout = 4, 6, 5
    xg = to_grouped(_arr(2, 16, 6, 8, cin), g)
    k = _arr(3, 3, 3, cin, cout)
    scale = jnp.abs(_arr(cout)) + 0.5
    bias = _arr(cout)
    b, dg, h, w, _ = xg.shape
    if add_dg is None:
        add = None
    else:
        dga = 1 if add_dg == 1 else dg
        add = _arr(b, dga, h, w, g * cout)
    out = gband_conv_bn_s1(xg, k, scale, bias, g=g, impl=impl, add=add)
    ref = gband_reference(xg, k, scale, bias, g=g, add=add)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("cin,cout", [(6, 5), (8, 4)])
def test_gband_down_matches_reference(cin, cout, relu):
    from ecm_tpu.ops.pallas_gband import gband_down_conv_bn, gband_down_reference

    xg = to_grouped(_arr(2, 16, 6, 8, cin), 4)
    k = _arr(3, 3, 3, cin, cout)
    scale = jnp.abs(_arr(cout)) + 0.5
    bias = _arr(cout)
    out = gband_down_conv_bn(xg, k, scale, bias, relu=relu)
    ref = gband_down_reference(xg, k, scale, bias, relu=relu)
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_gconvbndown_gband_dispatch_matches_xla(monkeypatch):
    import ecm_tpu.models.grouped_layers as gl
    from ecm_tpu.models.grouped_layers import GConvBNDown

    xg = to_grouped(_arr(2, 16, 6, 8, 6), 4)
    m = GConvBNDown(5)
    v = m.init({"params": jax.random.PRNGKey(0)}, xg, True)
    vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
    y_xla = m.apply(vars_, xg, False)
    monkeypatch.setattr(gl, "_GBAND_DEFAULT", "on")
    y_gb = m.apply(vars_, xg, False)
    np.testing.assert_allclose(
        np.asarray(y_gb), np.asarray(y_xla), atol=1e-4, rtol=1e-4
    )


def test_aggregation_gband_block_matches_generic(monkeypatch):
    """ECMAggregation grouped eval with the gband dres-block dispatch ==
    the generic grouped path, same params (reads dres*/context0 children)."""
    import ecm_tpu.models.grouped_layers as gl
    from ecm_tpu.models.aggregation import ECMAggregation

    vol = _arr(1, 16, 8, 12, 12)
    ctx2d = _arr(1, 8, 12, 6)
    agg = ECMAggregation(channels=6, layout="grouped", remat=False)
    v = agg.init({"params": jax.random.PRNGKey(0)}, to_grouped(vol), ctx2d, True)
    vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
    out_gen = agg.apply(vars_, to_grouped(vol), ctx2d, False)
    monkeypatch.setattr(gl, "_GBAND_DEFAULT", "on")
    out_gb = agg.apply(vars_, to_grouped(vol), ctx2d, False)
    assert len(out_gen) == len(out_gb) == 1
    scale = float(jnp.max(jnp.abs(out_gen[0]))) + 1e-9
    assert float(jnp.max(jnp.abs(out_gen[0] - out_gb[0]))) / scale < 2e-3


def test_gconvbn_gband_dispatch_matches_xla(monkeypatch):
    """GConvBN eval with the gband gate forced on == the XLA chain, with the
    SAME parameter tree (dispatch reads conv/bn children's params)."""
    import ecm_tpu.models.grouped_layers as gl

    x = _arr(2, 16, 6, 8, 6)
    xg = to_grouped(x)
    m = GConvBN(5, strides=1, relu=True)
    v = m.init({"params": jax.random.PRNGKey(0)}, xg, True)
    vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
    y_xla = m.apply(vars_, xg, False)
    monkeypatch.setattr(gl, "_GBAND_DEFAULT", "on")
    y_gband = m.apply(vars_, xg, False)
    np.testing.assert_allclose(
        np.asarray(from_grouped(y_gband, 4)),
        np.asarray(from_grouped(y_xla, 4)),
        atol=1e-4,
        rtol=1e-4,
    )
    # train path must NOT dispatch (batch-stat BN + autodiff)
    y_train_on, _ = m.apply(vars_, xg, True, mutable=["batch_stats"])
    monkeypatch.setattr(gl, "_GBAND_DEFAULT", "off")
    y_train_off, _ = m.apply(vars_, xg, True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y_train_on), np.asarray(y_train_off), atol=1e-6
    )


def test_gband_classif_head_matches_reference():
    from ecm_tpu.ops.pallas_gband import (
        gband_classif_head,
        gband_classif_reference,
    )

    xg = to_grouped(_arr(2, 12, 6, 16, 6), 4)  # W=16 (8-aligned)
    k1 = _arr(3, 3, 3, 6, 6) * 0.2
    k2 = _arr(3, 3, 3, 6, 1) * 0.2
    scale1 = jnp.abs(_arr(6)) + 0.5
    bias1 = _arr(6) * 0.1
    bias2 = _arr(1) * 0.1
    out = gband_classif_head(xg, k1, scale1, bias1, k2, bias2)
    ref = gband_classif_reference(xg, k1, scale1, bias1, k2, bias2)
    assert out.shape == ref.shape == (2, 3, 6, 16, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_classif_head_cascade_dispatch_matches_module(monkeypatch):
    """ClassifHead grouped-eval cascade == the module chain (GConvBN+GConv3D)."""
    import ecm_tpu.models.grouped_layers as gl
    from ecm_tpu.models.aggregation import ClassifHead

    xg = to_grouped(_arr(1, 12, 6, 16, 3), 4)  # C == head channels (square)
    head = ClassifHead(channels=3, layout="grouped")
    vars_ = head.init({"params": jax.random.PRNGKey(0)}, xg, train=True)
    vars_ = {
        "params": vars_["params"],
        "batch_stats": vars_.get("batch_stats", {}),
    }
    ref = head.apply(vars_, xg, train=False)
    monkeypatch.setattr(gl, "_GBAND_DEFAULT", "on")
    out = head.apply(vars_, xg, train=False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("g,cin,cout", [(4, 6, 5), (4, 8, 8)])
def test_gband_conv_s1_vjp_matches_autodiff(g, cin, cout, dtype):
    """Training custom VJP: forward, input-grad and weight-grad of
    gband_conv_s1 == XLA autodiff of the banded grouped conv (f32 AND the
    production bf16 — the weight-grad transpose must stay dtype-uniform)."""
    from ecm_tpu.ops.grouped3d import grouped_conv3d
    from ecm_tpu.ops.pallas_gband import gband_conv_s1

    xg = to_grouped(_arr(2, 4 * g, 5, 8, cin), g).astype(dtype)
    k = _arr(3, 3, 3, cin, cout).astype(dtype)
    dy = to_grouped(_arr(2, 4 * g, 5, 8, cout), g).astype(dtype)

    def f_ref(xg, k):
        return grouped_conv3d(xg, k, 1, g=g, impl="banded")

    def f_new(xg, k):
        return gband_conv_s1(xg, k, g)

    tol = dict(atol=1e-4, rtol=1e-4) if dtype == jnp.float32 else dict(
        atol=0.15, rtol=0.05
    )
    ktol = dict(atol=2e-3, rtol=2e-3) if dtype == jnp.float32 else dict(
        atol=1.5, rtol=0.05  # dk sums ~600 bf16 products; compare loosely
    )
    out_ref, pull_ref = jax.vjp(f_ref, xg, k)
    out_new, pull_new = jax.vjp(f_new, xg, k)
    np.testing.assert_allclose(
        np.asarray(out_new, np.float32), np.asarray(out_ref, np.float32), **tol
    )
    dx_ref, dk_ref = pull_ref(dy)
    dx_new, dk_new = pull_new(dy)
    np.testing.assert_allclose(
        np.asarray(dx_new, np.float32), np.asarray(dx_ref, np.float32), **tol
    )
    np.testing.assert_allclose(
        np.asarray(dk_new, np.float32), np.asarray(dk_ref, np.float32), **ktol
    )


def test_gconv3d_train_dispatch_matches_xla(monkeypatch):
    """GConv3D with the train-path gband VJP forced on: same forward and
    same parameter gradients as the XLA banded chain."""
    import ecm_tpu.models.grouped_layers as gl
    from ecm_tpu.models.grouped_layers import GConv3D

    xg = to_grouped(_arr(2, 16, 6, 8, 6), 4)
    m = GConv3D(8, strides=1, groups=4)
    v = m.init({"params": jax.random.PRNGKey(0)}, xg)

    def loss(params, mod):
        return jnp.sum(mod.apply({"params": params}, xg) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss)(v["params"], m)
    monkeypatch.setattr(gl, "_GBAND_TRAIN_DEFAULT", "on")
    l_new, g_new = jax.value_and_grad(loss)(v["params"], m)
    np.testing.assert_allclose(float(l_new), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_new["kernel"]), np.asarray(g_ref["kernel"]),
        atol=1e-3, rtol=1e-3,
    )


@pytest.mark.parametrize("impl", ["roll"])
def test_gband_padded_flow_chain(impl):
    """Padded-flow chain (emit_padded / prepadded_w / add_padded) == the
    unpadded reference chain; also the padded output IS pad(reference)."""
    g, cin, cout = 4, 6, 6
    xg = to_grouped(_arr(2, 16, 5, 16, cin), 4)
    k1, k2, k3 = _arr(3, 3, 3, cin, cout), _arr(3, 3, 3, cout, cout), _arr(
        3, 3, 3, cout, cout
    )
    s1 = jnp.abs(_arr(cout)) + 0.5
    b1 = _arr(cout)
    add_u = _arr(2, 1, 5, 16, 4 * cout)  # ctx broadcast, unpadded
    p1 = gband_conv_bn_s1(xg, k1, s1, b1, impl=impl, emit_padded=True)
    p2 = gband_conv_bn_s1(
        p1, k2, s1, b1, impl=impl, add=add_u, prepadded_w=16, emit_padded=True
    )
    out = gband_conv_bn_s1(
        p2, k3, s1, b1, impl=impl, relu=False, add=p1,
        prepadded_w=16, add_padded=True,
    )
    r1 = gband_reference(xg, k1, s1, b1)
    r2 = gband_reference(r1, k2, s1, b1, add=add_u)
    rout = gband_reference(r2, k3, s1, b1, relu=False, add=r1)
    # 3-conv chain: values reach ~1e3 and dot-order noise compounds — bound
    # relative to the chain's scale, not absolutely
    scale_out = float(jnp.max(jnp.abs(rout)))
    np.testing.assert_allclose(
        np.asarray(out) / scale_out, np.asarray(rout) / scale_out,
        atol=1e-4, rtol=0,
    )
    wpad = (-(16 + 2)) % 8
    np.testing.assert_allclose(
        np.asarray(p1),
        np.asarray(
            jnp.pad(r1, ((0, 0), (0, 0), (1, 1), (1, 1 + wpad), (0, 0)))
        ),
        atol=1e-4, rtol=1e-4,
    )


def test_aggregation_gband_padded_flow_matches_generic(monkeypatch):
    """ECMAggregation grouped eval with w % 8 == 0 (padded dres-chain flow)
    == the generic grouped path, same params."""
    import ecm_tpu.models.grouped_layers as gl
    from ecm_tpu.models.aggregation import ECMAggregation
    from ecm_tpu.ops.grouped3d import to_grouped

    vol = _arr(1, 16, 8, 16, 12)
    ctx2d = _arr(1, 8, 16, 6)
    agg = ECMAggregation(channels=6, layout="grouped", remat=False)
    v = agg.init({"params": jax.random.PRNGKey(0)}, to_grouped(vol), ctx2d, True)
    vars_ = {"params": v["params"], "batch_stats": v["batch_stats"]}
    out_gen = agg.apply(vars_, to_grouped(vol), ctx2d, False)
    monkeypatch.setattr(gl, "_GBAND_DEFAULT", "on")
    out_gb = agg.apply(vars_, to_grouped(vol), ctx2d, False)
    scale = float(jnp.max(jnp.abs(out_gen[0]))) + 1e-9
    assert float(jnp.max(jnp.abs(out_gen[0] - out_gb[0]))) / scale < 2e-3
