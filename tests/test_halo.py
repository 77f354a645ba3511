"""Explicit shard_map disparity-sharding primitives vs unsharded numerics
(SURVEY.md section 4 'disparity-axis cost-volume sharding numerics')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.ops.softargmin import softargmin_jnp
from ecm_tpu.parallel.halo import conv3d_d_sharded, softargmin_d_sharded
from ecm_tpu.parallel.sharding import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 (fake) devices"
)


class TestConv3dDSharded:
    def test_matches_unsharded_same_conv(self, rng):
        b, d, h, w, cin, cout = 2, 16, 8, 8, 4, 6
        vol = jnp.asarray(rng.normal(size=(b, d, h, w, cin)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            vol,
            k,
            (1, 1, 1),
            ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        mesh = make_mesh(data=1, disp=4)
        out = conv3d_d_sharded(vol, k, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


class TestSoftargminDSharded:
    def test_matches_unsharded(self, rng):
        b, d, h, w = 2, 24, 8, 8
        cost = jnp.asarray(rng.normal(size=(b, d, h, w)).astype(np.float32) * 5)
        ref = softargmin_jnp(cost)
        mesh = make_mesh(data=1, disp=4)
        out = softargmin_d_sharded(cost, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_one_hot_sharded(self):
        d = 32
        cost = np.zeros((1, d, 4, 4), np.float32)
        cost[:, 21] = -1000.0
        mesh = make_mesh(data=1, disp=8)
        out = softargmin_d_sharded(jnp.asarray(cost), mesh)
        np.testing.assert_allclose(np.asarray(out), 21.0, atol=1e-4)
