"""Parity vs. the torch-CPU oracle (SURVEY.md section 4): each Flax building
block is checked against the canonical PSMNet-family torch math on fixed
random inputs — catching stride/padding/BN-semantics drift.

torch is the ORACLE only (never imported by ecm_tpu itself).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ecm_tpu.models.layers import BasicBlock, ConvBN, ConvTransposeBN  # noqa: E402
from ecm_tpu.ops.upsample import upsample_trilinear  # noqa: E402
from ecm_tpu.train.loss import smooth_l1  # noqa: E402


def t2j_conv2d(w):  # [out,in,kh,kw] -> [kh,kw,in,out]
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2j_conv3d(w):  # [out,in,kd,kh,kw] -> [kd,kh,kw,in,out]
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 4, 1, 0))


class TestConvBN2D:
    @pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2), (2, 2)])
    def test_conv_bn_relu_matches_torch(self, rng, stride, dilation):
        cin, cout, h, w = 3, 8, 12, 14
        x = rng.normal(size=(1, cin, h, w)).astype(np.float32)

        conv = torch.nn.Conv2d(
            cin, cout, 3, stride=stride, padding=dilation, dilation=dilation, bias=False
        )
        bn = torch.nn.BatchNorm2d(cout, eps=1e-5).eval()
        with torch.no_grad():
            bn.running_mean.normal_(0, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.normal_(1, 0.2)
            bn.bias.normal_(0, 0.2)
            ref = F.relu(bn(conv(torch.from_numpy(x)))).numpy()

        mod = ConvBN(cout, kernel_size=3, strides=stride, dilation=dilation, relu=True)
        variables = {
            "params": {
                "conv": {"kernel": t2j_conv2d(conv.weight)},
                "bn": {
                    "scale": jnp.asarray(bn.weight.detach().numpy()),
                    "bias": jnp.asarray(bn.bias.detach().numpy()),
                },
            },
            "batch_stats": {
                "bn": {
                    "mean": jnp.asarray(bn.running_mean.numpy()),
                    "var": jnp.asarray(bn.running_var.numpy()),
                }
            },
        }
        out = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=2e-4, atol=2e-4
        )


class TestConvBN3D:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_conv3d_matches_torch(self, rng, stride):
        cin, cout, d, h, w = 4, 6, 8, 10, 12
        x = rng.normal(size=(1, cin, d, h, w)).astype(np.float32)
        conv = torch.nn.Conv3d(cin, cout, 3, stride=stride, padding=1, bias=False)
        bn = torch.nn.BatchNorm3d(cout).eval()
        with torch.no_grad():
            bn.running_mean.normal_(0, 0.5)
            bn.running_var.uniform_(0.5, 2.0)
            ref = bn(conv(torch.from_numpy(x))).numpy()

        mod = ConvBN(cout, kernel_size=3, strides=stride, relu=False)
        variables = {
            "params": {
                "conv": {"kernel": t2j_conv3d(conv.weight)},
                "bn": {
                    "scale": jnp.asarray(bn.weight.detach().numpy()),
                    "bias": jnp.asarray(bn.bias.detach().numpy()),
                },
            },
            "batch_stats": {
                "bn": {
                    "mean": jnp.asarray(bn.running_mean.numpy()),
                    "var": jnp.asarray(bn.running_var.numpy()),
                }
            },
        }
        out = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), False)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 4, 1, 2, 3), ref, rtol=2e-4, atol=2e-4
        )


class TestConvTranspose3D:
    def test_doubles_and_matches_torch(self, rng):
        """flax ConvTranspose with padding (1,2) == torch ConvTranspose3d
        (k=3, s=2, p=1, output_padding=1) under the right weight mapping."""
        cin, cout, d, h, w = 4, 5, 5, 6, 7
        x = rng.normal(size=(1, cin, d, h, w)).astype(np.float32)
        wt = rng.normal(size=(cin, cout, 3, 3, 3)).astype(np.float32) * 0.1
        ref = F.conv_transpose3d(
            torch.from_numpy(x),
            torch.from_numpy(wt),
            stride=2,
            padding=1,
            output_padding=1,
        ).numpy()
        assert ref.shape == (1, cout, 2 * d, 2 * h, 2 * w)

        from flax import linen as nn

        mod = nn.ConvTranspose(
            cout,
            kernel_size=(3, 3, 3),
            strides=(2, 2, 2),
            padding=[(1, 2)] * 3,
            use_bias=False,
            transpose_kernel=True,
        )
        # transpose_kernel=True expects [*k, out, in] (gradient-of-conv layout)
        kernel = jnp.asarray(wt.transpose(2, 3, 4, 1, 0))
        out = mod.apply(
            {"params": {"kernel": kernel}}, jnp.asarray(x.transpose(0, 2, 3, 4, 1))
        )
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 4, 1, 2, 3), ref, rtol=2e-4, atol=2e-4
        )

    def test_module_output_shape(self, rng):
        mod = ConvTransposeBN(8)
        x = jnp.asarray(rng.normal(size=(1, 4, 6, 8, 16)).astype(np.float32))
        variables = mod.init(jax.random.PRNGKey(0), x, False)
        out = mod.apply(variables, x, False)
        assert out.shape == (1, 8, 12, 16, 8)


class TestBasicBlock:
    def test_matches_torch_reference_math(self, rng):
        """BasicBlock == torch: relu(bn1(conv1)) -> bn2(conv2), + skip, no
        final relu (the PSMNet-family quirk)."""
        c, h, w = 8, 10, 12
        x = rng.normal(size=(1, c, h, w)).astype(np.float32)
        conv1 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
        conv2 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
        with torch.no_grad():
            ref = torch.from_numpy(x)
            out = F.relu(conv1(ref))
            out = conv2(out)
            ref = (out + ref).numpy()

        mod = BasicBlock(c)
        # identity BN (scale 1, bias 0, mean 0, var 1) isolates conv math
        ident_bn = lambda: {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
        ident_stats = lambda: {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
        variables = {
            "params": {
                "conv1": {"conv": {"kernel": t2j_conv2d(conv1.weight)}, "bn": ident_bn()},
                "conv2": {"conv": {"kernel": t2j_conv2d(conv2.weight)}, "bn": ident_bn()},
            },
            "batch_stats": {
                "conv1": {"bn": ident_stats()},
                "conv2": {"bn": ident_stats()},
            },
        }
        out = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=2e-4, atol=2e-4
        )


class TestFunctional:
    def test_smooth_l1_matches_torch(self, rng):
        x = rng.normal(size=(100,)).astype(np.float32) * 3
        ref = F.smooth_l1_loss(
            torch.from_numpy(x), torch.zeros(100), reduction="none"
        ).numpy()
        np.testing.assert_allclose(np.asarray(smooth_l1(jnp.asarray(x))), ref, rtol=1e-6)

    def test_trilinear_upsample_matches_torch(self, rng):
        x = rng.normal(size=(2, 1, 6, 8, 10)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x), scale_factor=2, mode="trilinear", align_corners=False
        ).numpy()[:, 0]
        out = upsample_trilinear(jnp.asarray(x[:, 0]), (12, 16, 20))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    def test_bilinear_feature_upsample_matches_torch(self, rng):
        from ecm_tpu.ops.upsample import upsample_bilinear

        x = rng.normal(size=(1, 3, 4, 5)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x), size=(12, 15), mode="bilinear", align_corners=False
        ).numpy()
        out = upsample_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), (12, 15))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
        )
