"""Data-layer tests: PFM round-trip, KITTI uint16 disp round-trip, preprocess
geometry, synthetic-pair ground-truth consistency (SURVEY.md section 4)."""

import numpy as np
import pytest

from ecm_tpu.data.kitti import decode_disp_png, encode_disp_png
from ecm_tpu.data.pfm import read_pfm, write_pfm
from ecm_tpu.data.preprocess import (
    normalize,
    pad_to_multiple,
    random_crop,
    unpad,
)
from ecm_tpu.data.synthetic import make_batch, make_pair


class TestPFM:
    def test_roundtrip_gray(self, tmp_path, rng):
        arr = rng.uniform(0, 192, size=(37, 53)).astype(np.float32)
        p = str(tmp_path / "d.pfm")
        write_pfm(p, arr)
        back, scale = read_pfm(p)
        np.testing.assert_array_equal(back, arr)
        assert scale == 1.0

    def test_roundtrip_color(self, tmp_path, rng):
        arr = rng.uniform(size=(8, 9, 3)).astype(np.float32)
        p = str(tmp_path / "c.pfm")
        write_pfm(p, arr)
        back, _ = read_pfm(p)
        np.testing.assert_array_equal(back, arr)

    def test_rejects_non_pfm(self, tmp_path):
        p = tmp_path / "x.pfm"
        p.write_bytes(b"P5\n1 1\n255\n\x00")
        with pytest.raises(ValueError):
            read_pfm(str(p))


class TestKittiDisp:
    def test_roundtrip(self, rng):
        disp = rng.uniform(0, 192, size=(16, 32)).astype(np.float32)
        decoded = decode_disp_png(encode_disp_png(disp))
        np.testing.assert_allclose(decoded, disp, atol=1.0 / 256.0 / 2 + 1e-6)

    def test_invalid_stays_zero(self):
        disp = np.zeros((4, 4), np.float32)
        assert np.all(decode_disp_png(encode_disp_png(disp)) == 0)


class TestPreprocess:
    def test_normalize_range(self, rng):
        img = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
        out = normalize(img)
        assert out.dtype == np.float32
        assert np.abs(out).max() < 3.0

    def test_random_crop_consistent(self, rng):
        a = rng.uniform(size=(20, 30, 3)).astype(np.float32)
        b = a[..., 0]
        ca, cb = random_crop(rng, [a, b], 8, 12)
        assert ca.shape == (8, 12, 3) and cb.shape == (8, 12)
        np.testing.assert_array_equal(ca[..., 0], cb)

    def test_pad_unpad(self, rng):
        img = rng.uniform(size=(375, 1242)).astype(np.float32)
        padded, pads = pad_to_multiple(img, target=(384, 1248))
        assert padded.shape == (384, 1248)
        assert pads == (9, 6)
        np.testing.assert_array_equal(unpad(padded, pads), img)
        # top/right convention: original sits bottom-left
        np.testing.assert_array_equal(padded[9:, :1242], img)
        assert np.all(padded[:9] == 0) and np.all(padded[:, 1242:] == 0)


class TestSynthetic:
    def test_warp_consistency(self):
        """left(x) must equal right(x - d) where d is the GT disparity —
        checked by inverse bilinear sampling of the (unnormalized) pair."""
        rng = np.random.default_rng(3)
        s = make_pair(rng, h=64, w=128, min_disp=5, max_disp=30, normalized=False)
        left, right, disp = s["left"], s["right"], s["disparity"]
        h, w = disp.shape
        xs = np.arange(w, dtype=np.float32)[None, :] - disp
        x0 = np.floor(xs).astype(np.int32)
        frac = (xs - x0)[..., None]
        valid = (x0 >= 0) & (x0 + 1 < w)
        x0c = np.clip(x0, 0, w - 2)
        rows = np.arange(h)[:, None]
        sampled = right[rows, x0c] * (1 - frac) + right[rows, x0c + 1] * frac
        err = np.abs(sampled - left)[valid & (disp > 0)]
        assert err.mean() < 2.0  # smooth texture -> small resampling error

    def test_batch_shapes(self):
        b = make_batch(0, 2, h=32, w=64, max_disp=16)
        assert b["left"].shape == (2, 32, 64, 3)
        assert b["disparity"].shape == (2, 32, 64)
        assert b["disparity"].min() > 0 and b["disparity"].max() < 16.5
