"""File-lister tests (D1/D5) over fabricated on-disk dataset trees, plus
full sample loading through the listers (D3/D6) and the grain pipeline."""

import os

import numpy as np
import pytest
from PIL import Image

from ecm_tpu.data.kitti import encode_disp_png, list_kitti
from ecm_tpu.data.kitti import load_sample as kitti_load
from ecm_tpu.data.pfm import write_pfm
from ecm_tpu.data.sceneflow import list_sceneflow, load_sample as sf_load


def _png(path, h=40, w=64, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


@pytest.fixture
def sceneflow_tree(tmp_path):
    """Mini FlyingThings3D-style tree: 2 TRAIN + 1 TEST sample."""
    root = tmp_path / "sceneflow"
    for split, scene, n in (("TRAIN", "A/0001", 2), ("TEST", "B/0002", 1)):
        base = root / "frames_finalpass" / split / scene
        dbase = root / "disparity" / split / scene
        for i in range(n):
            _png(str(base / "left" / f"{i:04d}.png"), seed=i)
            _png(str(base / "right" / f"{i:04d}.png"), seed=i + 10)
            os.makedirs(str(dbase / "left"), exist_ok=True)
            write_pfm(
                str(dbase / "left" / f"{i:04d}.pfm"),
                np.random.default_rng(i).uniform(1, 30, (40, 64)).astype(np.float32),
            )
    return str(root)


@pytest.fixture
def kitti_tree(tmp_path):
    root = tmp_path / "kitti"
    for i in range(6):
        n = f"{i:06d}_10.png"
        _png(str(root / "training" / "image_2" / n), seed=i)
        _png(str(root / "training" / "image_3" / n), seed=i + 10)
        d = np.random.default_rng(i).uniform(0, 100, (40, 64)).astype(np.float32)
        os.makedirs(str(root / "training" / "disp_occ_0"), exist_ok=True)
        Image.fromarray(encode_disp_png(d)).save(
            str(root / "training" / "disp_occ_0" / n)
        )
        _png(str(root / "testing" / "image_2" / n), seed=i)
        _png(str(root / "testing" / "image_3" / n), seed=i + 20)
    return str(root)


class TestSceneFlowLister:
    def test_split_and_pairing(self, sceneflow_tree):
        train, test = list_sceneflow(sceneflow_tree)
        assert len(train) == 2 and len(test) == 1
        for s in train + test:
            assert os.path.exists(s.left) and os.path.exists(s.right)
            assert s.disp.endswith(".pfm") and os.path.exists(s.disp)
            assert "left" in s.left and "right" in s.right

    def test_load_sample_train_crop(self, sceneflow_tree):
        train, _ = list_sceneflow(sceneflow_tree)
        s = sf_load(train[0], crop=(16, 32), rng=np.random.default_rng(0))
        assert s["left"].shape == (16, 32, 3)
        assert s["disparity"].shape == (16, 32)
        assert s["left"].dtype == np.float32

    def test_load_sample_eval_full(self, sceneflow_tree):
        train, _ = list_sceneflow(sceneflow_tree)
        s = sf_load(train[0], crop=None)
        assert s["left"].shape == (40, 64, 3)


class TestKittiLister:
    def test_train_val_split(self, kitti_tree):
        train, val = list_kitti(kitti_tree, year=2015, val_count=2)
        assert len(train) == 4 and len(val) == 2
        assert all(os.path.exists(s.disp) for s in train + val)

    def test_testing_split(self, kitti_tree):
        specs, rest = list_kitti(kitti_tree, year=2015, split="testing")
        assert len(specs) == 6 and rest == []
        assert all(s.disp == "" for s in specs)

    def test_load_eval_pads_to_target(self, kitti_tree):
        train, _ = list_kitti(kitti_tree, year=2015)
        s = kitti_load(train[0], crop=None)
        assert s["left"].shape == (384, 1248, 3)
        assert s["disparity"].shape == (384, 1248)
        assert tuple(s["pads"]) == (384 - 40, 1248 - 64)


class TestGrainPipeline:
    def test_train_pipeline_batches(self, sceneflow_tree):
        from ecm_tpu.data.pipeline import PipelineConfig, make_train_pipeline

        train, _ = list_sceneflow(sceneflow_tree)
        it = make_train_pipeline(
            train,
            sf_load,
            PipelineConfig(batch_size=2, crop=(16, 32), worker_count=0),
        )
        for _ in range(3):
            b = next(it)
            assert b["left"].shape == (2, 16, 32, 3)
            assert b["disparity"].shape == (2, 16, 32)

    def test_eval_iterator(self, kitti_tree):
        from ecm_tpu.data.pipeline import make_eval_iterator

        _, val = list_kitti(kitti_tree, year=2015, val_count=2)
        batches = list(make_eval_iterator(val, kitti_load, batch_size=1))
        assert len(batches) == 2
        assert batches[0]["left"].shape == (1, 384, 1248, 3)
