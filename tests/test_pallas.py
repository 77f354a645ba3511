"""Pallas kernel parity tests (interpret mode on CPU — SURVEY.md section 4:
'Pallas cost-volume kernel vs. pure-jnp reference implementation, exact
match'). The same kernels run compiled on the real chip via
benchmarks/run_tpu_checks.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.ops.cost_volume import (
    cost_volume_concat_jnp,
    cost_volume_correlation_jnp,
)
from ecm_tpu.ops.pallas_cost_volume import cost_volume_pallas

B, H, W, C = 2, 8, 32, 8
D = 8


@pytest.fixture
def feats(rng):
    fl = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    return fl, fr


class TestConcatKernel:
    def test_exact_match_vs_jnp(self, feats):
        fl, fr = feats
        ref = cost_volume_concat_jnp(fl, fr, D)
        out = cost_volume_pallas(fl, fr, D, mode="concat")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_grad_matches_jnp(self, feats):
        fl, fr = feats

        def loss_p(fl, fr):
            v = cost_volume_pallas(fl, fr, D, mode="concat")
            return jnp.sum(v * jnp.sin(jnp.arange(v.size).reshape(v.shape) * 0.01))

        def loss_j(fl, fr):
            v = cost_volume_concat_jnp(fl, fr, D)
            return jnp.sum(v * jnp.sin(jnp.arange(v.size).reshape(v.shape) * 0.01))

        gp = jax.grad(loss_p, argnums=(0, 1))(fl, fr)
        gj = jax.grad(loss_j, argnums=(0, 1))(fl, fr)
        for a, b in zip(gp, gj):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_bf16(self, feats):
        fl, fr = feats
        fl, fr = fl.astype(jnp.bfloat16), fr.astype(jnp.bfloat16)
        ref = cost_volume_concat_jnp(fl, fr, D)
        out = cost_volume_pallas(fl, fr, D, mode="concat")
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)), np.asarray(ref.astype(jnp.float32))
        )

    def test_odd_row_count(self, rng):
        """H not a power of two still divides into row blocks."""
        fl = jnp.asarray(rng.normal(size=(1, 6, 16, 4)).astype(np.float32))
        fr = jnp.asarray(rng.normal(size=(1, 6, 16, 4)).astype(np.float32))
        ref = cost_volume_concat_jnp(fl, fr, 4)
        out = cost_volume_pallas(fl, fr, 4, mode="concat")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestCorrelationKernel:
    def test_match_vs_jnp(self, feats):
        fl, fr = feats
        ref = cost_volume_correlation_jnp(fl, fr, D)
        out = cost_volume_pallas(fl, fr, D, mode="correlation")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_grad_matches_jnp(self, feats):
        fl, fr = feats

        def loss(cv_fn):
            def f(fl, fr):
                v = cv_fn(fl, fr)
                return jnp.sum(v**2)

            return f

        gp = jax.grad(
            loss(lambda a, b: cost_volume_pallas(a, b, D, mode="correlation")),
            argnums=(0, 1),
        )(fl, fr)
        gj = jax.grad(
            loss(lambda a, b: cost_volume_correlation_jnp(a, b, D)), argnums=(0, 1)
        )(fl, fr)
        for a, b in zip(gp, gj):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


class TestGroupedConcatKernel:
    def test_exact_match_vs_grouped_jnp(self, feats):
        from ecm_tpu.ops.cost_volume import cost_volume_grouped_jnp
        from ecm_tpu.ops.pallas_cost_volume import (
            cost_volume_concat_grouped_pallas,
        )

        fl, fr = feats
        ref = cost_volume_grouped_jnp(fl, fr, D, "concat")
        out = cost_volume_concat_grouped_pallas(fl, fr, D)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_grad_matches_grouped_jnp(self, feats):
        from ecm_tpu.ops.cost_volume import cost_volume_grouped_jnp
        from ecm_tpu.ops.pallas_cost_volume import (
            cost_volume_concat_grouped_pallas,
        )

        fl, fr = feats

        def loss(fn):
            def f(fl, fr):
                v = fn(fl, fr)
                return jnp.sum(
                    v * jnp.sin(jnp.arange(v.size).reshape(v.shape) * 0.01)
                )

            return jax.grad(f, argnums=(0, 1))(fl, fr)

        gp = loss(lambda a, b: cost_volume_concat_grouped_pallas(a, b, D))
        gj = loss(lambda a, b: cost_volume_grouped_jnp(a, b, D, "concat"))
        for a, b in zip(gp, gj):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )

    def test_dispatch_via_cost_volume(self, feats):
        from ecm_tpu.ops.cost_volume import cost_volume, cost_volume_grouped_jnp

        fl, fr = feats
        ref = cost_volume_grouped_jnp(fl, fr, D, "concat")
        out = cost_volume(fl, fr, D, mode="concat", use_pallas=True, grouped=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
