"""TFRecord round-trip + Middlebury lister/loader tests."""

import os

import numpy as np
import pytest
from PIL import Image

from ecm_tpu.data.middlebury import list_middlebury, load_sample, read_ndisp
from ecm_tpu.data.pfm import write_pfm
from ecm_tpu.data.synthetic import make_pair


class TestTFRecord:
    def test_roundtrip(self, tmp_path):
        tf = pytest.importorskip("tensorflow")
        from ecm_tpu.data.tfrecord import read_shards, write_shards

        rng = np.random.default_rng(0)
        samples = [make_pair(rng, h=24, w=32, max_disp=8.0) for _ in range(5)]
        paths = write_shards(iter(samples), str(tmp_path), samples_per_shard=2)
        assert len(paths) == 3
        back = list(read_shards(paths))
        assert len(back) == 5
        for a, b in zip(samples, back):
            np.testing.assert_array_equal(a["left"], b["left"])
            np.testing.assert_array_equal(a["disparity"], b["disparity"])


class TestMiddlebury:
    @pytest.fixture
    def tree(self, tmp_path):
        rng = np.random.default_rng(0)
        for scene, with_gt in (("Adirondack", True), ("Bicycle", False)):
            base = tmp_path / scene
            os.makedirs(base)
            for name in ("im0.png", "im1.png"):
                Image.fromarray(
                    rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
                ).save(str(base / name))
            if with_gt:
                d = rng.uniform(1, 60, (50, 70)).astype(np.float32)
                d[0, 0] = np.inf  # unknown-disparity encoding
                write_pfm(str(base / "disp0GT.pfm"), d)
                (base / "calib.txt").write_text("cam0=...\nndisp=290\n")
        return str(tmp_path)

    def test_lister(self, tree):
        with_gt, without = list_middlebury(tree)
        assert len(with_gt) == 1 and len(without) == 1
        assert with_gt[0].disp.endswith("disp0GT.pfm")

    def test_ndisp(self, tree):
        with_gt, _ = list_middlebury(tree)
        assert read_ndisp(os.path.dirname(with_gt[0].left)) == 290

    def test_load_pads_and_maps_inf_to_invalid(self, tree):
        with_gt, _ = list_middlebury(tree)
        s = load_sample(with_gt[0], crop=None)
        assert s["left"].shape[0] % 32 == 0 and s["left"].shape[1] % 32 == 0
        assert np.isfinite(s["disparity"]).all()
        pt, pr = s["pads"]
        assert s["disparity"][pt, 0] == 0.0  # the inf pixel became invalid
