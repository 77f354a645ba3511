"""Regression tests for the SceneFlow full-image eval path (VERDICT r1 weak
#1): SceneFlow test frames are 540x960, H/4 = 135 is odd, and the stride-2
hourglass decoder skip-adds crash on any H or W not a multiple of 16. The
eval iterator must pad (top/right, zeros) and the padding must be metric-
neutral (zero disparity is masked invalid).

Also covers the --epochs resolution (VERDICT r1 weak #4).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.data.pipeline import make_eval_iterator
from ecm_tpu.data.preprocess import unpad
from ecm_tpu.models import build_model


def _fake_loader(h, w):
    def load(spec, crop=None, rng=None):
        r = np.random.default_rng(spec)
        return {
            "left": r.normal(size=(h, w, 3)).astype(np.float32),
            "right": r.normal(size=(h, w, 3)).astype(np.float32),
            "disparity": r.uniform(1.0, 10.0, size=(h, w)).astype(np.float32),
        }

    return load


class TestEvalPadding:
    def test_sceneflow_shape_padded_to_16(self):
        """540x960 (real SceneFlow test frame size) -> 544x960."""
        batches = list(make_eval_iterator([0], _fake_loader(540, 960)))
        (b,) = batches
        assert b["left"].shape == (1, 544, 960, 3)
        assert b["disparity"].shape == (1, 544, 960)
        assert tuple(b["pads"][0]) == (4, 0)
        # padded rows are zero -> masked invalid in every metric
        assert np.all(b["disparity"][0, :4] == 0.0)
        assert np.all(b["disparity"][0, 4:] > 0.0)

    def test_odd_quarter_res_full_model_eval(self):
        """H/4 odd (the exact r1 crash class): 120x168 -> pad to 128x176,
        model runs, unpad restores the original frame."""
        h, w = 120, 168  # H/4 = 30 (odd), W/4 = 42 (not div by 4)
        (batch,) = list(make_eval_iterator([7], _fake_loader(h, w)))
        assert batch["left"].shape == (1, 128, 176, 3)

        m = build_model("stackhourglass", max_disp=16, feature_channels=8,
                        remat=False)
        L = jnp.asarray(batch["left"])
        R = jnp.asarray(batch["right"])
        variables = m.init({"params": jax.random.PRNGKey(0)}, L, R, train=True)
        (disp,) = m.apply(variables, L, R, train=False)
        assert disp.shape == (1, 128, 176)
        assert np.all(np.isfinite(np.asarray(disp)))
        restored = unpad(np.asarray(disp)[0], tuple(batch["pads"][0]))
        assert restored.shape == (h, w)

    def test_unpadded_odd_shape_raises(self):
        m = build_model("stackhourglass", max_disp=16, feature_channels=8,
                        remat=False)
        L = jnp.zeros((1, 120, 168, 3))
        with pytest.raises(AssertionError, match="multiples of 16"):
            m.init({"params": jax.random.PRNGKey(0)}, L, L, train=True)


class TestEpochsResolution:
    def _cfg(self, dataset="sceneflow", epochs=None, batch=4):
        from ecm_tpu.configs import CONFIGS

        cfg = CONFIGS["sceneflow_single"]
        return dataclasses.replace(
            cfg,
            data=dataclasses.replace(cfg.data, dataset=dataset, global_batch=batch),
            train=dataclasses.replace(cfg.train, epochs=epochs),
        )

    def test_epochs_to_steps(self):
        from ecm_tpu.cli.common import steps_from_epochs

        cfg = self._cfg(epochs=3, batch=4)
        assert steps_from_epochs(cfg, n_samples=10) == 3 * (10 // 4)

    def test_no_epochs_keeps_num_steps(self):
        from ecm_tpu.cli.common import steps_from_epochs

        cfg = self._cfg(epochs=None)
        assert steps_from_epochs(cfg, n_samples=10) == cfg.train.num_steps

    def test_epochs_on_synthetic_rejected(self):
        from ecm_tpu.cli.common import steps_from_epochs

        cfg = self._cfg(dataset="synthetic", epochs=2)
        with pytest.raises(ValueError, match="finite dataset"):
            steps_from_epochs(cfg, n_samples=None)
