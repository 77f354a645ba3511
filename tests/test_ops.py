"""Unit tests for core ops: cost volume semantics, soft-argmin analytics,
trilinear upsample (SURVEY.md section 4 unit-test list)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.ops.cost_volume import (
    cost_volume_concat_jnp,
    cost_volume_correlation_jnp,
)
from ecm_tpu.ops.softargmin import disparity_regression, softargmin_jnp
from ecm_tpu.ops.upsample import upsample_trilinear


class TestCostVolume:
    def _feats(self, rng, b=2, h=6, w=16, c=4):
        fl = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        fr = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        return fl, fr

    def test_concat_semantics(self, rng):
        """vol[b,d,h,w,:C] == fL[w], vol[...,C:] == fR[w-d]; zero for w<d —
        the reference shifted-slice assignment (SURVEY.md 3.4)."""
        fl, fr = self._feats(rng)
        d_max = 5
        vol = np.asarray(cost_volume_concat_jnp(fl, fr, d_max))
        b, h, w, c = fl.shape
        assert vol.shape == (b, d_max, h, w, 2 * c)
        for d in range(d_max):
            np.testing.assert_allclose(vol[:, d, :, d:, :c], np.asarray(fl)[:, :, d:])
            if d > 0:
                np.testing.assert_allclose(
                    vol[:, d, :, d:, c:], np.asarray(fr)[:, :, : w - d]
                )
                assert np.all(vol[:, d, :, :d] == 0.0)

    def test_correlation_semantics(self, rng):
        fl, fr = self._feats(rng)
        d_max = 4
        vol = np.asarray(cost_volume_correlation_jnp(fl, fr, d_max))
        b, h, w, c = fl.shape
        assert vol.shape == (b, d_max, h, w, 1)
        for d in range(d_max):
            expect = np.mean(
                np.asarray(fl)[:, :, d:] * np.asarray(fr)[:, :, : w - d or None],
                axis=-1,
            )
            np.testing.assert_allclose(
                vol[:, d, :, d:, 0], expect, rtol=1e-5, atol=1e-5
            )
            if d > 0:
                assert np.all(vol[:, d, :, :d] == 0.0)

    def test_matching_feature_gives_diagonal_peak(self, rng):
        """A right image == left shifted by d* should peak correlation at d*."""
        b, h, w, c = 1, 4, 32, 8
        fl = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        d_true = 7
        fr = jnp.roll(fl, -d_true, axis=2)  # fR[w] = fL[w + d]... build so fL[w] = fR[w - d_true]
        vol = np.asarray(cost_volume_correlation_jnp(fl, fr, 16))[0, :, :, :, 0]
        # restrict to valid interior columns
        valid = vol[:, :, 16 : w - 1]
        best = np.argmax(valid.mean(axis=(1, 2)))
        assert best == d_true


class TestSoftArgmin:
    def test_one_hot(self):
        """Large negative cost at disparity k -> regresses to exactly k."""
        d, h, w = 12, 3, 4
        k = 7
        cost = np.zeros((1, d, h, w), np.float32)
        cost[:, k] = -1000.0
        out = np.asarray(softargmin_jnp(jnp.asarray(cost)))
        np.testing.assert_allclose(out, k, atol=1e-4)

    def test_uniform(self):
        d = 10
        cost = jnp.zeros((2, d, 3, 4))
        out = np.asarray(softargmin_jnp(cost))
        np.testing.assert_allclose(out, (d - 1) / 2.0, atol=1e-5)

    def test_disparity_regression_shape(self, rng):
        cost = jnp.asarray(rng.normal(size=(2, 24, 8, 8)).astype(np.float32))
        out = disparity_regression(cost, 24)
        assert out.shape == (2, 8, 8)
        assert np.all(np.isfinite(np.asarray(out)))
        assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 23)


class TestUpsample:
    def test_identity(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 4, 6, 8)).astype(np.float32))
        y = upsample_trilinear(x, (4, 6, 8))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_shape_and_range(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 4, 6, 8)).astype(np.float32))
        y = np.asarray(upsample_trilinear(x, (16, 24, 32)))
        assert y.shape == (1, 16, 24, 32)
        # linear interp stays within input range
        assert y.min() >= np.asarray(x).min() - 1e-5
        assert y.max() <= np.asarray(x).max() + 1e-5
