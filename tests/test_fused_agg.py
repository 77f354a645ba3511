"""Fused Pallas aggregation kernel (ecm_tpu/ops/pallas_fused_agg.py):
exact parity vs the unfused conv-BN-ReLU chain across every epilogue
variant, and model-level parity of ECMAggregation/ECMStereo with the fused
path on vs off (CPU interpret mode; Mosaic compilation is exercised on-chip
by benchmarks/fused_agg_bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.ops.pallas_fused_agg import (
    fused_conv3d_pair,
    fused_conv3d_pair_reference,
)


@pytest.fixture(scope="module")
def tensors():
    rng = np.random.default_rng(0)
    B, D, H, W, Cin, Cm, Cout = 2, 8, 8, 20, 6, 5, 5
    return {
        "x": jnp.asarray(rng.normal(size=(B, D, H, W, Cin)).astype(np.float32)),
        "k1": jnp.asarray(rng.normal(size=(3, 3, 3, Cin, Cm)).astype(np.float32) * 0.2),
        "k2": jnp.asarray(rng.normal(size=(3, 3, 3, Cm, Cout)).astype(np.float32) * 0.2),
        "s1": jnp.asarray(rng.uniform(0.5, 1.5, Cm).astype(np.float32)),
        "b1": jnp.asarray(rng.normal(size=Cm).astype(np.float32)),
        "s2": jnp.asarray(rng.uniform(0.5, 1.5, Cout).astype(np.float32)),
        "b2": jnp.asarray(rng.normal(size=Cout).astype(np.float32)),
        "ctx": jnp.asarray(rng.normal(size=(B, H, W, Cout)).astype(np.float32)),
    }


class TestFusedPairKernel:
    @pytest.mark.parametrize(
        "opts",
        [
            {},
            {"relu2": False},
            {"use_ctx": True},
            {"relu2": False, "residual": True},
            {"use_ctx": True, "relu2": False, "residual": True},
        ],
    )
    def test_parity_vs_reference(self, tensors, opts):
        opts = dict(opts)
        ctx = tensors["ctx"] if opts.pop("use_ctx", False) else None
        args = (tensors["x"], tensors["k1"], tensors["s1"], tensors["b1"],
                tensors["k2"], tensors["s2"], tensors["b2"])
        out = fused_conv3d_pair(*args, ctx=ctx, tile_d=4, tile_h=4, **opts)
        ref = fused_conv3d_pair_reference(*args, ctx=ctx, **opts)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_uneven_tiles_and_cout1(self, tensors):
        """Head shape: Cout=1, tiles that don't divide evenly fall back to
        divisors."""
        rng = np.random.default_rng(1)
        x = tensors["x"]
        cm, cout = 5, 1
        k1, s1, b1 = tensors["k1"], tensors["s1"], tensors["b1"]
        k2 = jnp.asarray(rng.normal(size=(3, 3, 3, cm, cout)).astype(np.float32))
        s2 = jnp.ones((cout,), jnp.float32)
        b2 = jnp.asarray(rng.normal(size=cout).astype(np.float32))
        out = fused_conv3d_pair(
            x, k1, s1, b1, k2, s2, b2, relu2=False, tile_d=3, tile_h=5
        )
        ref = fused_conv3d_pair_reference(x, k1, s1, b1, k2, s2, b2, relu2=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_bf16(self, tensors):
        xb = tensors["x"].astype(jnp.bfloat16)
        args = (xb, tensors["k1"], tensors["s1"], tensors["b1"],
                tensors["k2"], tensors["s2"], tensors["b2"])
        out = fused_conv3d_pair(*args, ctx=tensors["ctx"], tile_d=4, tile_h=4)
        ref = fused_conv3d_pair_reference(*args, ctx=tensors["ctx"])
        a, b = np.asarray(out, np.float32), np.asarray(ref, np.float32)
        assert np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-9) < 0.02


class TestFusedAggregationModel:
    def _vars_with_random_stats(self, model, *args, seed=3):
        """init, then randomize BN stats so the fold is non-trivial."""
        variables = model.init({"params": jax.random.PRNGKey(0)}, *args, train=True)
        rng = np.random.default_rng(seed)

        def perturb(path, v):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name == "mean":
                return jnp.asarray(rng.normal(0, 0.3, v.shape).astype(np.float32))
            if name == "var":
                return jnp.asarray(rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
            return v

        stats = jax.tree_util.tree_map_with_path(
            perturb, variables["batch_stats"]
        )
        return {"params": variables["params"], "batch_stats": stats}

    def test_aggregation_fused_matches_unfused(self):
        from ecm_tpu.models.aggregation import ECMAggregation

        rng = np.random.default_rng(0)
        c = 8
        vol = jnp.asarray(rng.normal(size=(1, 8, 8, 16, 2 * c)).astype(np.float32))
        ctx2d = jnp.asarray(rng.normal(size=(1, 8, 16, c)).astype(np.float32))
        outs = {}
        for mode in ("off", "on"):
            m = ECMAggregation(channels=c, remat=False, fused=mode)
            variables = self._vars_with_random_stats(m, vol, ctx2d)
            (cost,) = m.apply(variables, vol, ctx2d, train=False)
            outs[mode] = np.asarray(cost)
        np.testing.assert_allclose(outs["on"], outs["off"], rtol=1e-4, atol=1e-4)

    def test_full_model_fused_matches_unfused(self):
        from ecm_tpu.models import build_model

        rng = np.random.default_rng(0)
        L = jnp.asarray(rng.normal(size=(1, 32, 48, 3)).astype(np.float32))
        R = jnp.asarray(rng.normal(size=(1, 32, 48, 3)).astype(np.float32))
        outs = {}
        for mode in ("off", "on"):
            m = build_model(
                "stackhourglass",
                max_disp=16,
                feature_channels=8,
                remat=False,
                agg_fused=mode,
            )
            variables = m.init({"params": jax.random.PRNGKey(0)}, L, R, train=True)
            (disp,) = m.apply(variables, L, R, train=False)
            outs[mode] = np.asarray(disp)
        np.testing.assert_allclose(outs["on"], outs["off"], rtol=1e-3, atol=1e-3)

    def test_train_path_unaffected(self):
        """fused='on' must not change the training forward (it is eval-only)."""
        from ecm_tpu.models.aggregation import ECMAggregation

        rng = np.random.default_rng(0)
        c = 8
        vol = jnp.asarray(rng.normal(size=(1, 8, 8, 16, 2 * c)).astype(np.float32))
        ctx2d = jnp.asarray(rng.normal(size=(1, 8, 16, c)).astype(np.float32))
        outs = {}
        for mode in ("off", "on"):
            m = ECMAggregation(channels=c, remat=False, fused=mode)
            variables = m.init({"params": jax.random.PRNGKey(0)}, vol, ctx2d,
                               train=True)
            costs, _ = m.apply(
                variables, vol, ctx2d, train=True, mutable=["batch_stats"]
            )
            outs[mode] = np.asarray(costs[-1])
        np.testing.assert_allclose(outs["on"], outs["off"], rtol=1e-6, atol=1e-6)
