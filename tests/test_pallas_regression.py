"""Fused upsample+soft-argmin kernel vs the jnp reference path (exact
trilinear semantics, interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.ops.pallas_regression import fused_upsample_softargmin
from ecm_tpu.ops.softargmin import disparity_regression
from ecm_tpu.ops.upsample import upsample_trilinear


def reference(cost4, max_disp):
    b, d4, h4, w4 = cost4.shape
    cost = upsample_trilinear(cost4, (max_disp, h4 * 4, w4 * 4))
    return disparity_regression(cost, max_disp)


class TestFusedRegression:
    @pytest.mark.parametrize("shape", [(1, 8, 6, 8), (2, 12, 4, 16)])
    def test_matches_reference(self, rng, shape):
        cost4 = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 3)
        d = shape[1] * 4
        ref = reference(cost4, d)
        out = fused_upsample_softargmin(cost4, d)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_one_hot_peak(self):
        """Low-res one-hot at disparity k upsamples to a peak near 4k."""
        b, d4, h4, w4 = 1, 12, 4, 8
        cost4 = np.zeros((b, d4, h4, w4), np.float32)
        cost4[:, 7] = -200.0
        out = np.asarray(fused_upsample_softargmin(jnp.asarray(cost4), 48))
        ref = np.asarray(reference(jnp.asarray(cost4), 48))
        np.testing.assert_allclose(out, ref, atol=1e-3)
        assert np.all(np.abs(out - 28.0) < 2.0)  # 4*7 = 28 +- interp spread

    def test_uniform(self):
        cost4 = jnp.zeros((1, 12, 4, 8))
        out = np.asarray(fused_upsample_softargmin(cost4, 48))
        np.testing.assert_allclose(out, (48 - 1) / 2.0, atol=1e-4)


class TestModelFusedMode:
    def test_model_fused_matches_fullres(self, rng):
        import jax
        from ecm_tpu.models import build_model

        L = jnp.asarray(rng.normal(size=(1, 32, 48, 3)).astype(np.float32))
        R = jnp.asarray(rng.normal(size=(1, 32, 48, 3)).astype(np.float32))
        m_full = build_model(
            "stackhourglass", max_disp=16, feature_channels=8, remat=False
        )
        variables = m_full.init({"params": jax.random.PRNGKey(0)}, L, R, train=True)
        m_fused = build_model(
            "stackhourglass",
            max_disp=16,
            feature_channels=8,
            remat=False,
            regress_mode="fused",
        )
        out_full = np.asarray(m_full.apply(variables, L, R, train=False)[0])
        out_fused = np.asarray(m_fused.apply(variables, L, R, train=False)[0])
        np.testing.assert_allclose(out_fused, out_full, rtol=1e-3, atol=1e-3)
