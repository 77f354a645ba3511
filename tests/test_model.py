"""Model tests: shapes, train/eval parity of the param tree, loss masking,
finite outputs (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.models import build_model
from ecm_tpu.train.loss import masked_smooth_l1, stereo_loss, valid_mask
from ecm_tpu.train.metrics import disparity_metrics

MAXD = 16  # small disparity range for fast CPU tests
H, W = 32, 48


@pytest.fixture(scope="module")
def small_model_and_vars():
    m = build_model(
        "stackhourglass", max_disp=MAXD, feature_channels=8, remat=False
    )
    k = jax.random.PRNGKey(0)
    L = jnp.zeros((1, H, W, 3))
    variables = m.init({"params": k}, L, L, train=True)
    return m, variables


class TestECMStereo:
    def test_train_eval_shapes(self, small_model_and_vars):
        m, variables = small_model_and_vars
        L = jnp.ones((2, H, W, 3)) * 0.1
        outs, _ = m.apply(variables, L, L, train=True, mutable=["batch_stats"])
        assert len(outs) == 3
        assert all(o.shape == (2, H, W) for o in outs)
        outs_e = m.apply(variables, L, L, train=False)
        assert len(outs_e) == 1 and outs_e[0].shape == (2, H, W)

    def test_outputs_finite_and_in_range(self, small_model_and_vars, rng):
        m, variables = small_model_and_vars
        L = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
        R = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
        (out,) = m.apply(variables, L, R, train=False)
        out = np.asarray(out)
        assert np.all(np.isfinite(out))
        assert out.min() >= 0 and out.max() <= MAXD - 1

    def test_identical_images_give_near_zero_disparity_signal(self):
        """Not a strict invariant at random init, but the model must run with
        identical inputs and produce finite output."""
        m = build_model("basic", max_disp=MAXD, feature_channels=8)
        k = jax.random.PRNGKey(1)
        L = jax.random.normal(jax.random.PRNGKey(2), (1, H, W, 3))
        variables = m.init({"params": k}, L, L, train=True)
        (out,) = m.apply(variables, L, L, train=False)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_basic_variant_single_output_in_train(self):
        m = build_model("basic", max_disp=MAXD, feature_channels=8)
        k = jax.random.PRNGKey(0)
        L = jnp.zeros((1, H, W, 3))
        variables = m.init({"params": k}, L, L, train=True)
        outs, _ = m.apply(variables, L, L, train=True, mutable=["batch_stats"])
        assert len(outs) == 1

    def test_correlation_mode_runs(self):
        m = build_model(
            "stackhourglass",
            max_disp=MAXD,
            feature_channels=8,
            cost_mode="correlation",
            remat=False,
        )
        k = jax.random.PRNGKey(0)
        L = jnp.zeros((1, H, W, 3))
        variables = m.init({"params": k}, L, L, train=True)
        (out,) = m.apply(variables, L, L, train=False)
        assert out.shape == (1, H, W)

    def test_context_fusion_variants(self):
        for fusion in ("none", "film", "both"):
            m = build_model(
                "stackhourglass",
                max_disp=MAXD,
                feature_channels=8,
                context_fusion=fusion,
                remat=False,
            )
            k = jax.random.PRNGKey(0)
            L = jnp.zeros((1, H, W, 3))
            variables = m.init({"params": k}, L, L, train=True)
            (out,) = m.apply(variables, L, L, train=False)
            assert out.shape == (1, H, W), fusion

    def test_context_mapping_changes_output(self, rng):
        """The ECM module must actually influence the result (vs 'none')."""
        outs = {}
        L = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
        R = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
        for fusion in ("none", "add"):
            m = build_model(
                "stackhourglass",
                max_disp=MAXD,
                feature_channels=8,
                context_fusion=fusion,
                remat=False,
            )
            variables = m.init({"params": jax.random.PRNGKey(0)}, L, R, train=True)
            outs[fusion] = np.asarray(m.apply(variables, L, R, train=False)[0])
        assert not np.allclose(outs["none"], outs["add"])


class TestLoss:
    def test_mask_excludes_invalid(self):
        pred = jnp.full((1, 4, 4), 5.0)
        gt = jnp.zeros((1, 4, 4))  # all invalid (0)
        assert float(masked_smooth_l1(pred, gt, valid_mask(gt, 192))) == 0.0

    def test_smooth_l1_values(self):
        pred = jnp.array([[[0.5]], [[3.0]]])  # |err| 0.5 (quad), 3.0 (linear)
        gt = jnp.array([[[1.0]], [[0.5]]])
        m = valid_mask(gt, 192)
        # elementwise: 0.5*0.5^2 = 0.125 ; 2.5 - 0.5 = 2.0 -> mean 1.0625
        np.testing.assert_allclose(
            float(masked_smooth_l1(pred, gt, m)), (0.125 + 2.0) / 2, rtol=1e-6
        )

    def test_stage_weights(self):
        gt = jnp.ones((1, 2, 2)) * 5.0
        preds = [gt + 2.0, gt + 2.0, gt + 2.0]  # each stage loss = 1.5
        total = float(stereo_loss(preds, gt, 192))
        np.testing.assert_allclose(total, (0.5 + 0.7 + 1.0) * 1.5, rtol=1e-6)

    def test_metrics(self):
        gt = jnp.ones((1, 10, 10)) * 50.0
        pred = gt.at[0, 0, :].add(10.0)  # 10 px error on 10 of 100 pixels
        m = {k: float(v) for k, v in disparity_metrics(pred, gt).items()}
        np.testing.assert_allclose(m["epe"], 1.0, rtol=1e-5)
        np.testing.assert_allclose(m["d1_all"], 0.10, rtol=1e-5)  # >3px & >5%
        np.testing.assert_allclose(m["px3"], 0.10, rtol=1e-5)
        assert m["valid_px"] == 100
