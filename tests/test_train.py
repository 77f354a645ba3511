"""Training-stack tests: step runs + loss decreases (mini overfit gate),
checkpoint save/restore round-trip, LR schedule (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ecm_tpu.data.synthetic import make_batch
from ecm_tpu.models import build_model
from ecm_tpu.train.state import TrainState, create_train_state, make_optimizer
from ecm_tpu.train.steps import make_eval_step, make_train_step

MAXD = 16
H, W = 32, 64


def tiny_setup(lr=1e-3):
    model = build_model(
        "stackhourglass", max_disp=MAXD, feature_channels=8, remat=False
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), (H, W, 3), make_optimizer(lr), batch_size=1
    )
    return model, state


class TestTrainStep:
    def test_overfit_tiny(self):
        """~30 steps on one fixed synthetic batch must cut the loss by >2x
        (the fast CPU version of the tiny-overfit correctness gate)."""
        model, state = tiny_setup(lr=3e-3)
        step = make_train_step(model, MAXD)
        batch = {
            k: jnp.asarray(v)
            for k, v in make_batch(0, 2, h=H, w=W, max_disp=12.0).items()
        }
        first = None
        for i in range(30):
            state, metrics = step(state, batch)
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(last)
        assert last < first / 2, (first, last)

    def test_batch_stats_update(self):
        model, state = tiny_setup()
        step = make_train_step(model, MAXD)
        batch = {
            k: jnp.asarray(v)
            for k, v in make_batch(1, 1, h=H, w=W, max_disp=12.0).items()
        }
        stats_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.batch_stats)
        state, _ = step(state, batch)
        leaves_b = jax.tree.leaves(stats_before)
        leaves_a = jax.tree.leaves(state.batch_stats)
        changed = any(
            not np.allclose(np.asarray(a), b) for a, b in zip(leaves_a, leaves_b)
        )
        assert changed, "batch_stats must update during training"

    def test_eval_step(self):
        model, state = tiny_setup()
        estep = make_eval_step(model, MAXD)
        batch = {
            k: jnp.asarray(v)
            for k, v in make_batch(2, 1, h=H, w=W, max_disp=12.0).items()
        }
        disp, metrics = estep(state, batch)
        assert disp.shape == (1, H, W)
        assert np.isfinite(float(metrics["epe"]))


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from ecm_tpu.train import checkpoint as ckpt

        model, state = tiny_setup()
        step = make_train_step(model, MAXD)
        batch = {
            k: jnp.asarray(v)
            for k, v in make_batch(0, 1, h=H, w=W, max_disp=12.0).items()
        }
        state, _ = step(state, batch)

        mgr = ckpt.make_manager(str(tmp_path / "ckpt"), keep=2)
        ckpt.save(mgr, int(state.step), state)
        ckpt.wait(mgr)

        _, fresh = tiny_setup()
        restored, step_no = ckpt.restore_latest(mgr, fresh)
        assert step_no == int(state.step)
        for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_restore_latest_empty(self, tmp_path):
        from ecm_tpu.train import checkpoint as ckpt

        mgr = ckpt.make_manager(str(tmp_path / "empty"))
        _, state = tiny_setup()
        restored, step_no = ckpt.restore_latest(mgr, state)
        assert step_no == 0 and restored is state


class TestOptimizer:
    def test_lr_schedule_boundaries(self):
        tx = make_optimizer(1e-3, boundaries_and_lrs=[(100, 1e-4)])
        params = {"w": jnp.ones((3,))}
        opt_state = tx.init(params)
        g = {"w": jnp.ones((3,))}
        # step through boundary; effective LR must drop 10x
        updates_before, opt_state = tx.update(g, opt_state, params)
        for _ in range(100):
            updates_after, opt_state = tx.update(g, opt_state, params)
        # Adam normalizes, so compare magnitudes: after boundary ~0.1x before
        r = float(jnp.abs(updates_after["w"][0] / updates_before["w"][0]))
        assert r < 0.15, r
