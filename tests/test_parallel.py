"""Parallelism tests on the 8-fake-CPU-device mesh (SURVEY.md section 4):
sharded training step == single-device step on the same global batch (DP
gradient psum equivalence), and disparity-axis-sharded eval == unsharded
numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.data.synthetic import make_batch
from ecm_tpu.models import build_model
from ecm_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    replicate,
    use_mesh,
)
from ecm_tpu.train.state import create_train_state, make_optimizer
from ecm_tpu.train.steps import make_eval_step, make_train_step

MAXD = 16
H, W = 32, 64

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 (fake) devices"
)


def setup(seed=0):
    model = build_model(
        "stackhourglass", max_disp=MAXD, feature_channels=8, remat=False
    )
    state = create_train_state(
        model, jax.random.PRNGKey(seed), (H, W, 3), make_optimizer(1e-3), batch_size=1
    )
    return model, state


def batch_of(n):
    return {k: jnp.asarray(v) for k, v in make_batch(0, n, h=H, w=W, max_disp=12.0).items()}


class TestDataParallel:
    def test_dp_grads_match_single_device(self):
        """Gradients of one step on mesh (4, 1) must equal the unsharded
        gradients on the same global batch (the psum GSPMD inserts is exact up
        to f32 reduction order). Compared pre-optimizer: Adam normalization
        amplifies near-zero-gradient noise into sign flips."""
        from ecm_tpu.train.loss import stereo_loss

        batch = batch_of(4)
        model, state = setup()

        @jax.jit
        def grad_fn(params, batch_stats, batch):
            def loss_fn(p):
                preds, _ = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch["left"],
                    batch["right"],
                    train=True,
                    mutable=["batch_stats"],
                )
                return stereo_loss(preds, batch["disparity"], MAXD)

            return jax.value_and_grad(loss_fn)(params)

        loss_a, grads_a = grad_fn(state.params, state.batch_stats, batch)

        mesh = make_mesh(data=4, disp=1)
        with use_mesh(mesh):
            loss_b, grads_b = grad_fn(
                jax.device_put(state.params, replicate(mesh)),
                jax.device_put(state.batch_stats, replicate(mesh)),
                jax.device_put(batch, batch_sharding(mesh)),
            )

        np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-4)
        scale = max(
            float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(grads_a)
        )
        # f32 reduction-order divergence through 25+ conv layers with BN is
        # a few 1e-3 absolute on O(1) gradients; anything semantic (missing
        # psum, per-shard BN) would be O(1) off.
        for a, b in zip(jax.tree.leaves(grads_a), jax.tree.leaves(grads_b)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-2, atol=3e-3 * scale
            )

    def test_bn_stats_are_global(self):
        """Batch stats after a sharded step equal the unsharded ones — proof
        of sync-BN semantics under GSPMD."""
        batch = batch_of(4)
        model, state_a = setup()
        step = make_train_step(model, MAXD)
        state_a, _ = step(state_a, batch)

        model, state_b = setup()
        mesh = make_mesh(data=4, disp=1)
        with use_mesh(mesh):
            state_b, _ = step(
                jax.device_put(state_b, replicate(mesh)),
                jax.device_put(batch, batch_sharding(mesh)),
            )
        for a, b in zip(
            jax.tree.leaves(state_a.batch_stats), jax.tree.leaves(state_b.batch_stats)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


class TestDispSharding:
    def test_disp_sharded_eval_matches_unsharded(self):
        """Eval with the cost volume sharded over ("disp",) must reproduce the
        unsharded disparity (GSPMD halo exchange + 2-pass-psum soft-argmin)."""
        model, state = setup()
        estep = make_eval_step(model, MAXD)
        batch = batch_of(2)

        disp_ref, m_ref = estep(state, batch)

        mesh = make_mesh(data=2, disp=2)
        with use_mesh(mesh):
            disp_sh, m_sh = estep(
                jax.device_put(state, replicate(mesh)),
                jax.device_put(batch, batch_sharding(mesh)),
            )
        np.testing.assert_allclose(
            np.asarray(disp_ref), np.asarray(disp_sh), rtol=1e-3, atol=1e-3
        )

    def test_train_step_disp_sharded(self):
        """Full train step under (2, 2) mesh: runs, finite, close to ref."""
        batch = batch_of(2)
        model, state_a = setup()
        step = make_train_step(model, MAXD)
        state_a, metrics_a = step(state_a, batch)

        model, state_b = setup()
        mesh = make_mesh(data=2, disp=2)
        with use_mesh(mesh):
            state_b, metrics_b = step(
                jax.device_put(state_b, replicate(mesh)),
                jax.device_put(batch, batch_sharding(mesh)),
            )
        np.testing.assert_allclose(
            float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-3
        )


class TestConfig4EvalPath:
    def test_cli_eval_mesh_disp_sharded_matches_unsharded(self):
        """The config-4 CLI path (BASELINE.json:10): ``eval_mesh`` builds the
        (data=1, disp=N) mesh from ``mesh_disp`` and a batch-1 padded
        high-res pair evaluated under it matches the unsharded disparity —
        the exact flow ``ecm_tpu.cli.evaluate``/``submission`` now run."""
        import dataclasses

        from ecm_tpu.cli.common import eval_mesh
        from ecm_tpu.configs import CONFIGS

        cfg = CONFIGS["middlebury_disp_sharded"]
        assert cfg.train.mesh_disp == 4  # preset is the config-4 contract
        # f32 for the parity assert: in bf16 the per-shard reduction-order
        # noise (~1e-2 rel after 25 convs) flips the random-init soft-argmin
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, max_disp=MAXD, feature_channels=8, remat=False,
                bf16=False,
            ),
        )
        model = cfg.model.build()
        # "high-res" relative to the other tests; batch 1 like the CLI
        h, w = 48, 96
        state = create_train_state(
            model, jax.random.PRNGKey(0), (h, w, 3), batch_size=1
        )
        batch = {
            k: jnp.asarray(v)
            for k, v in make_batch(0, 1, h=h, w=w, max_disp=12.0).items()
        }
        estep = make_eval_step(model, MAXD)
        disp_ref, _ = estep(state, batch)

        mesh = eval_mesh(cfg)
        assert mesh is not None and mesh.shape == {"data": 1, "disp": 4}
        with use_mesh(mesh):
            disp_sh, _ = estep(
                jax.device_put(state, replicate(mesh)),
                jax.device_put(batch, replicate(mesh)),
            )
        np.testing.assert_allclose(
            np.asarray(disp_ref), np.asarray(disp_sh), rtol=1e-3, atol=1e-3
        )


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(data=4, disp=2)
        assert mesh.shape == {"data": 4, "disp": 2}
        mesh = make_mesh(disp=2)  # auto data = n // disp
        assert mesh.shape["disp"] == 2

    def test_constrain_noop_without_mesh(self):
        from ecm_tpu.parallel.sharding import constrain_volume

        x = jnp.ones((2, 4, 4, 4, 8))
        assert constrain_volume(x) is x


class TestGroupedDispSharding:
    def test_grouped_disp_sharded_eval_matches_standard(self):
        """The grouped (disparity-folded) layout under a ("data","disp") mesh:
        the cost volume's group dim shards over "disp" (4 groups -> 2 per
        chip), GSPMD halos the group-window convs, and the result must match
        the unsharded STANDARD layout within the impl-to-impl envelope
        (tests/test_grouped3d.py docstring)."""
        maxd = 64  # grouped needs D/4 % 16 == 0
        model_s = build_model(
            "stackhourglass",
            max_disp=maxd,
            feature_channels=8,
            remat=False,
            agg_layout="standard",
        )
        model_g = build_model(
            "stackhourglass",
            max_disp=maxd,
            feature_channels=8,
            remat=False,
            agg_layout="grouped",
        )
        state = create_train_state(
            model_s, jax.random.PRNGKey(0), (H, W, 3), make_optimizer(1e-3), 1
        )
        batch = batch_of(2)
        estep_s = make_eval_step(model_s, maxd)
        estep_g = make_eval_step(model_g, maxd)

        disp_ref, _ = estep_s(state, batch)

        mesh = make_mesh(data=2, disp=2)
        with use_mesh(mesh):
            disp_sh, _ = estep_g(
                jax.device_put(state, replicate(mesh)),
                jax.device_put(batch, batch_sharding(mesh)),
            )
        # soft-argmin amplifies conv-order noise at random weights: compare
        # with the same tolerance class as the layout-parity tests
        assert float(jnp.mean(jnp.abs(disp_ref - disp_sh))) < 0.5
        assert np.isfinite(np.asarray(disp_sh)).all()
