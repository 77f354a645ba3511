"""torch->JAX weight-import tool tests: layout converters (against torch
functional ops) and structural round-trip import."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.checkpoint_import import (
    _natkey,
    convert_conv,
    convert_conv_transpose,
    import_by_structure,
)


class TestConverters:
    def test_conv2d_layout(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
        w = rng.normal(size=(5, 3, 3, 3)).astype(np.float32)
        ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
        out = jax.lax.conv_general_dilated(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(convert_conv(w)),
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
        )

    def test_conv_transpose3d_layout(self, rng):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        x = rng.normal(size=(1, 4, 3, 4, 5)).astype(np.float32)
        w = rng.normal(size=(4, 6, 3, 3, 3)).astype(np.float32)
        ref = F.conv_transpose3d(
            torch.from_numpy(x),
            torch.from_numpy(w),
            stride=2,
            padding=1,
            output_padding=1,
        ).numpy()
        out = jax.lax.conv_transpose(
            jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
            jnp.asarray(convert_conv_transpose(w)),
            strides=(2, 2, 2),
            padding=[(1, 2)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 4, 1, 2, 3), ref, rtol=1e-4, atol=1e-4
        )

    def test_natural_sort(self):
        names = ["layer2_10", "layer2_2", "layer2_1"]
        assert sorted(names, key=_natkey) == ["layer2_1", "layer2_2", "layer2_10"]


class TestStructuralImport:
    def test_roundtrip_small_model(self, rng):
        """Fabricate a torch-style state_dict mirroring a small flax model's
        structure; import; verify every conv kernel and BN stat landed."""
        from ecm_tpu.models.layers import BasicBlock

        mod = BasicBlock(8, strides=2)  # conv1, conv2 (+BN each), downsample
        x = jnp.zeros((1, 8, 8, 4))
        variables = jax.tree.map(
            np.asarray, mod.init(jax.random.PRNGKey(0), x, True)
        )

        sd = {}
        k1 = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)
        k2 = rng.normal(size=(8, 8, 3, 3)).astype(np.float32)
        kd = rng.normal(size=(8, 4, 1, 1)).astype(np.float32)
        for i, (name, k) in enumerate(
            [("conv1.0", k1), ("conv2.0", k2)]
        ):
            sd[f"{name}.weight"] = k
            sd[f"{name.replace('.0', '.1')}.weight"] = (
                rng.normal(size=(8,)).astype(np.float32)
            )
            sd[f"{name.replace('.0', '.1')}.bias"] = np.zeros(8, np.float32)
            sd[f"{name.replace('.0', '.1')}.running_mean"] = np.zeros(8, np.float32)
            sd[f"{name.replace('.0', '.1')}.running_var"] = np.ones(8, np.float32)
            sd[f"{name.replace('.0', '.1')}.num_batches_tracked"] = np.int64(0)
        sd["downsample.weight"] = kd

        out = import_by_structure(sd, variables)
        np.testing.assert_allclose(
            out["params"]["conv1"]["conv"]["kernel"], convert_conv(k1)
        )
        np.testing.assert_allclose(
            out["params"]["conv2"]["conv"]["kernel"], convert_conv(k2)
        )
        np.testing.assert_allclose(
            out["params"]["downsample"]["kernel"], convert_conv(kd)
        )

    def test_mismatch_raises(self):
        from ecm_tpu.models.layers import ConvBN

        mod = ConvBN(4)
        variables = jax.tree.map(
            np.asarray, mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 2)), True)
        )
        with pytest.raises(ValueError, match="layer-count mismatch"):
            import_by_structure({}, variables)
