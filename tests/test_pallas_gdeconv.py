"""Parity tests for the fused grouped-emission transposed-conv kernel
(ecm_tpu/ops/pallas_gdeconv.py) vs the phased XLA reference. CPU interpret
mode; Mosaic compile is gated on-chip by benchmarks/run_tpu_checks.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.ops.pallas_gdeconv import gdeconv4_bn, gdeconv4_reference

RNG = np.random.default_rng(13)


def _arr(*shape):
    return jnp.asarray(RNG.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("cin,cout", [(6, 5), (8, 4)])
def test_gdeconv4_matches_reference(cin, cout, relu):
    x = _arr(2, 6, 4, 7, cin)
    k = _arr(3, 3, 3, cin, cout)
    scale = jnp.abs(_arr(cout)) + 0.5
    bias = _arr(cout)
    out = gdeconv4_bn(x, k, scale, bias, relu=relu)
    ref = gdeconv4_reference(x, k, scale, bias, relu=relu)
    assert out.shape == ref.shape == (2, 3, 8, 14, 4 * cout)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_gdeconv4_fused_residual():
    cin, cout = 6, 5
    x = _arr(1, 4, 4, 5, cin)
    k = _arr(3, 3, 3, cin, cout)
    scale = jnp.abs(_arr(cout)) + 0.5
    bias = _arr(cout)
    add = _arr(1, 2, 8, 10, 4 * cout)
    out = gdeconv4_bn(x, k, scale, bias, add=add)
    ref = gdeconv4_reference(x, k, scale, bias, add=add)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_gdeconv4_equals_ungrouped_transpose_conv():
    """End-to-end identity vs the canonical (ungrouped) transposed conv +
    to_grouped — the reference chain the phased op itself is tested
    against."""
    from ecm_tpu.ops.conv3d import conv_transpose3d_phased
    from ecm_tpu.ops.grouped3d import to_grouped

    cin, cout = 6, 8
    x = _arr(1, 4, 4, 5, cin)
    k = _arr(3, 3, 3, cin, cout)
    one = jnp.ones((cout,))
    zero = jnp.zeros((cout,))
    out = gdeconv4_bn(x, k, one, zero)
    ref = to_grouped(conv_transpose3d_phased(x, k), 4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )
