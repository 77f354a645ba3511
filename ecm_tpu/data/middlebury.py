"""Middlebury (2014/v3) high-resolution stereo pairs — BASELINE.json config 4
target ("Middlebury high-res pairs with disparity-axis cost-volume sharding
across chips"). No reference counterpart (the reference covers SceneFlow +
KITTI only); included because the driver's config list requires it.

Layout convention: ``<root>/<scene>/im0.png`` (left), ``im1.png`` (right),
``disp0GT.pfm`` (+ optional ``calib.txt`` with ndisp). Images are multi-MP,
so eval pads H/W to multiples of 32 and typical max_disp is 256-400 —
exactly the regime where the ``("data", "disp")`` mesh shards the cost
volume along D.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from ecm_tpu.data.pfm import read_pfm
from ecm_tpu.data.preprocess import normalize, pad_to_multiple, random_crop
from ecm_tpu.data.sceneflow import SampleSpec


def list_middlebury(root: str) -> tuple[list[SampleSpec], list[SampleSpec]]:
    """Scenes with GT -> train list; scenes without -> second list."""
    with_gt, without_gt = [], []
    if not os.path.isdir(root):
        return [], []
    for scene in sorted(os.listdir(root)):
        base = os.path.join(root, scene)
        left, right = os.path.join(base, "im0.png"), os.path.join(base, "im1.png")
        if not (os.path.exists(left) and os.path.exists(right)):
            continue
        disp = os.path.join(base, "disp0GT.pfm")
        spec = SampleSpec(left, right, disp if os.path.exists(disp) else "")
        (with_gt if spec.disp else without_gt).append(spec)
    return with_gt, without_gt


def read_ndisp(scene_dir: str, default: int = 256) -> int:
    """Parse ndisp from Middlebury calib.txt (disparity search range)."""
    path = os.path.join(scene_dir, "calib.txt")
    if os.path.exists(path):
        for line in open(path):
            if line.startswith("ndisp="):
                return int(float(line.split("=", 1)[1]))
    return default


def load_sample(
    spec: SampleSpec,
    crop: tuple[int, int] | None = None,
    rng: np.random.Generator | None = None,
    multiple: int = 32,
) -> dict[str, np.ndarray]:
    """Load one pair. GT PFM: +inf encodes unknown -> 0 (invalid) to match
    the KITTI/loss convention (0 = no GT)."""
    left = np.asarray(Image.open(spec.left).convert("RGB"))
    right = np.asarray(Image.open(spec.right).convert("RGB"))
    if spec.disp and os.path.exists(spec.disp):
        disp, _ = read_pfm(spec.disp)
        if disp.ndim == 3:
            disp = disp[..., 0]
        disp = np.where(np.isfinite(disp), disp, 0.0).astype(np.float32)
    else:
        disp = np.zeros(left.shape[:2], np.float32)
    if crop is not None:
        rng = rng or np.random.default_rng()
        left, right, disp = random_crop(rng, [left, right, disp], crop[0], crop[1])
        return {"left": normalize(left), "right": normalize(right), "disparity": disp}
    left_n, pads = pad_to_multiple(normalize(left), multiple=multiple)
    right_n, _ = pad_to_multiple(normalize(right), multiple=multiple)
    disp_p, _ = pad_to_multiple(disp, multiple=multiple)
    return {
        "left": left_n,
        "right": right_n,
        "disparity": disp_p,
        "pads": np.asarray(pads, np.int32),
    }
