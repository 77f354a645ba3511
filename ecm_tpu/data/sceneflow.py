"""SceneFlow dataset: file lister + sample loader (reference components
D1 + D3: ``dataloader/listflowfile.py`` + ``dataloader/SceneFlowLoader.py`` —
SURVEY.md 2.2).

Walks the standard SceneFlow on-disk layout (FlyingThings3D / Monkaa /
Driving; ``frames_finalpass`` or ``frames_cleanpass`` RGB + ``disparity`` PFM),
returning (left_png, right_png, left_disp_pfm) path triples with the
conventional TRAIN/TEST split for FlyingThings3D and all-train for
Monkaa/Driving.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
from PIL import Image

from ecm_tpu.data.pfm import read_pfm
from ecm_tpu.data.preprocess import normalize, random_crop


@dataclasses.dataclass(frozen=True)
class SampleSpec:
    left: str
    right: str
    disp: str


def _is_image(name: str) -> bool:
    return name.endswith((".png", ".webp", ".jpg"))


def list_sceneflow(root: str) -> tuple[list[SampleSpec], list[SampleSpec]]:
    """Walk a SceneFlow root -> (train, test) path triples.

    Any directory tree containing parallel ``.../left/xxxx.png`` and
    ``.../right/xxxx.png`` image dirs with a sibling ``disparity`` tree of
    ``.pfm`` files is picked up; paths containing ``TEST`` go to the test
    split (FlyingThings3D convention), everything else to train.
    """
    train: list[SampleSpec] = []
    test: list[SampleSpec] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if os.path.basename(dirpath) != "left":
            continue
        right_dir = os.path.join(os.path.dirname(dirpath), "right")
        if not os.path.isdir(right_dir):
            continue
        for fn in sorted(filenames):
            if not _is_image(fn):
                continue
            left = os.path.join(dirpath, fn)
            right = os.path.join(right_dir, fn)
            stem = os.path.splitext(fn)[0]
            disp = None
            for cand in (
                left.replace("frames_finalpass", "disparity")
                .replace("frames_cleanpass", "disparity")
                .replace(fn, stem + ".pfm"),
                os.path.join(os.path.dirname(dirpath), "disparity", stem + ".pfm"),
            ):
                if os.path.exists(cand):
                    disp = cand
                    break
            if disp is None or not os.path.exists(right):
                continue
            spec = SampleSpec(left, right, disp)
            # FlyingThings3D convention: .../TRAIN/... vs .../TEST/... dirs
            if os.sep + "TEST" + os.sep in left:
                test.append(spec)
            else:
                train.append(spec)
    return train, test


def load_sample(
    spec: SampleSpec,
    crop: tuple[int, int] | None = (256, 512),  # (H, W) train crop
    rng: np.random.Generator | None = None,
) -> dict[str, np.ndarray]:
    """Load one stereo sample -> dict of float32 arrays (channels-last).

    Train mode (``crop`` set): random (256, 512) crop as in the reference.
    Eval mode (``crop=None``): full image (caller pads to a multiple of 16).
    """
    left = np.asarray(Image.open(spec.left).convert("RGB"))
    right = np.asarray(Image.open(spec.right).convert("RGB"))
    disp, _ = read_pfm(spec.disp)
    if disp.ndim == 3:
        disp = disp[..., 0]
    disp = np.ascontiguousarray(disp).astype(np.float32)
    if crop is not None:
        rng = rng or np.random.default_rng()
        left, right, disp = random_crop(rng, [left, right, disp], crop[0], crop[1])
    return {
        "left": normalize(left),
        "right": normalize(right),
        "disparity": disp,
    }
