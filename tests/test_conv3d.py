"""Decomposed / packed conv3d lowerings vs XLA native (exact semantics) and
vs the torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecm_tpu.ops.conv3d import conv3d, conv3d_decomposed, conv3d_packed, conv3d_xla

IMPLS = {"decomposed": conv3d_decomposed, "packed": conv3d_packed}


@pytest.mark.parametrize("impl", list(IMPLS))
@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("shape", [(2, 8, 6, 10, 4), (1, 7, 5, 9, 3)])
def test_lowering_matches_xla(rng, impl, stride, shape):
    cout = 5
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], cout)).astype(np.float32))
    ref = conv3d_xla(x, k, (stride,) * 3, ((1, 1),) * 3)
    out = IMPLS[impl](x, k, (stride,) * 3)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", list(IMPLS))
@pytest.mark.parametrize("stride", [1, 2])
def test_matches_torch(rng, impl, stride):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.normal(size=(1, 4, 8, 6, 10)).astype(np.float32)  # NCDHW
    w = rng.normal(size=(5, 4, 3, 3, 3)).astype(np.float32)
    ref = F.conv3d(
        torch.from_numpy(x), torch.from_numpy(w), stride=stride, padding=1
    ).numpy()
    out = IMPLS[impl](
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)),
        jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
        (stride,) * 3,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, rtol=1e-4, atol=1e-4
    )


def test_dispatch_falls_back(rng):
    """Non-3x3x3 kernels route to XLA regardless of impl."""
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 1, 2, 3)).astype(np.float32))
    out = conv3d(x, k, (1, 1, 1), ((0, 0),) * 3, impl="decomposed")
    assert out.shape == (1, 4, 4, 4, 3)


def test_model_equivalence_across_impls(rng, monkeypatch):
    """Same params give (numerically) the same model output for either
    lowering — ckpt compatibility across impls."""
    from ecm_tpu.models import build_model

    L = jnp.asarray(rng.normal(size=(1, 32, 48, 3)).astype(np.float32))
    R = jnp.asarray(rng.normal(size=(1, 32, 48, 3)).astype(np.float32))
    m = build_model("stackhourglass", max_disp=16, feature_channels=8, remat=False)
    variables = m.init({"params": jax.random.PRNGKey(0)}, L, R, train=True)
    outs = {}
    for impl in ("xla", "decomposed", "packed"):
        monkeypatch.setenv("ECM_TPU_CONV3D_IMPL", impl)
        outs[impl] = np.asarray(m.apply(variables, L, R, train=False)[0])
    np.testing.assert_allclose(outs["xla"], outs["decomposed"], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(outs["xla"], outs["packed"], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("shape", [(2, 5, 6, 7, 4), (1, 4, 4, 4, 2)])
def test_phased_deconv_matches_lax(rng, shape):
    from ecm_tpu.ops.conv3d import conv_transpose3d_phased

    cout = 3
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, shape[-1], cout)).astype(np.float32))
    ref = jax.lax.conv_transpose(
        x, k, strides=(2, 2, 2), padding=[(1, 2)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    out = conv_transpose3d_phased(x, k)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_phased_deconv_matches_torch(rng):
    """torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1) oracle.

    torch weight is [In, Out, kd, kh, kw]; flax/lax layout is [kd, kh, kw,
    In, Out] with mirrored spatial taps (conv_transpose treats the kernel in
    fractional-stride orientation) — the transpose below encodes that."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from ecm_tpu.ops.conv3d import conv_transpose3d_phased

    x = rng.normal(size=(1, 3, 4, 5, 6)).astype(np.float32)  # NCDHW
    w = rng.normal(size=(3, 2, 3, 3, 3)).astype(np.float32)  # [In, Out, k...]
    ref = F.conv_transpose3d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1,
        output_padding=1,
    ).numpy()
    # lax orientation: flip spatial axes of the torch kernel
    k = jnp.asarray(w.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1].copy())
    out = conv_transpose3d_phased(jnp.asarray(x.transpose(0, 2, 3, 4, 1)), k)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, rtol=1e-4, atol=1e-4
    )
