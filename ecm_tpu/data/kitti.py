"""KITTI 2012/2015 listers + sample loader (reference components D5 + D6:
``dataloader/KITTIloader2015.py`` / ``KITTIloader2012.py`` / ``KITTILoader.py``
— SURVEY.md 2.2).

Directory conventions:
- 2015: ``training/image_2`` (left), ``training/image_3`` (right),
  ``training/disp_occ_0`` (GT). 200 train pairs; reference splits ~160/40.
- 2012: ``training/colored_0`` / ``colored_1`` / ``disp_occ``.
- test splits have no GT (``testing/...``), used for server submission.

Disparity encoding: uint16 PNG, value = disparity * 256 (0 = invalid) —
encode/decode round-trip unit-tested (SURVEY.md section 4).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from ecm_tpu.data.preprocess import normalize, pad_to_multiple, random_crop
from ecm_tpu.data.sceneflow import SampleSpec

EVAL_SIZE = (384, 1248)  # reference pad target for KITTI eval (SURVEY.md 3.3)


def list_kitti(
    root: str, year: int = 2015, split: str = "training", val_count: int = 40
) -> tuple[list[SampleSpec], list[SampleSpec]]:
    """List KITTI pairs -> (train, val). For ``split='testing'`` GT paths are
    empty strings and everything is returned in the first list."""
    if year == 2015:
        left_dir, right_dir, disp_dir = "image_2", "image_3", "disp_occ_0"
    elif year == 2012:
        left_dir, right_dir, disp_dir = "colored_0", "colored_1", "disp_occ"
    else:
        raise ValueError(f"KITTI year must be 2012 or 2015, got {year}")
    base = os.path.join(root, split)
    if not os.path.isdir(base):
        base = root  # allow pointing directly at training/
    ldir = os.path.join(base, left_dir)
    names = sorted(
        n for n in os.listdir(ldir) if n.endswith(".png") and "_10" in n
    ) if os.path.isdir(ldir) else []
    specs = []
    for n in names:
        disp = os.path.join(base, disp_dir, n) if split == "training" else ""
        specs.append(
            SampleSpec(
                os.path.join(base, left_dir, n),
                os.path.join(base, right_dir, n),
                disp,
            )
        )
    if split != "training":
        return specs, []
    # reference convention: last `val_count` pairs are validation
    # (clamped so small/partial datasets still yield a non-empty train split)
    val_count = min(val_count, len(specs) // 2)
    cut = len(specs) - val_count
    return specs[:cut], specs[cut:]


def decode_disp_png(path_or_array) -> np.ndarray:
    """uint16 KITTI disparity PNG -> float32 disparity (0 = invalid)."""
    if isinstance(path_or_array, np.ndarray):
        arr = path_or_array
    else:
        arr = np.asarray(Image.open(path_or_array))
    return arr.astype(np.float32) / 256.0


def encode_disp_png(disp: np.ndarray) -> np.ndarray:
    """float32 disparity -> uint16 KITTI server encoding (disp * 256)."""
    return np.clip(np.round(np.asarray(disp) * 256.0), 0, 65535).astype(np.uint16)


def save_disp_png(path: str, disp: np.ndarray) -> None:
    Image.fromarray(encode_disp_png(disp)).save(path)


def load_sample(
    spec: SampleSpec,
    crop: tuple[int, int] | None = (256, 512),
    rng: np.random.Generator | None = None,
) -> dict[str, np.ndarray]:
    """Load one KITTI sample. Train: random crop. Eval (``crop=None``):
    pad to 384x1248 (top/right), returning the pads for un-padding."""
    left = np.asarray(Image.open(spec.left).convert("RGB"))
    right = np.asarray(Image.open(spec.right).convert("RGB"))
    disp = (
        decode_disp_png(spec.disp)
        if spec.disp and os.path.exists(spec.disp)
        else np.zeros(left.shape[:2], np.float32)
    )
    if crop is not None:
        rng = rng or np.random.default_rng()
        left, right, disp = random_crop(rng, [left, right, disp], crop[0], crop[1])
        return {"left": normalize(left), "right": normalize(right), "disparity": disp}
    left_n, pads = pad_to_multiple(normalize(left), target=EVAL_SIZE)
    right_n, _ = pad_to_multiple(normalize(right), target=EVAL_SIZE)
    disp_p, _ = pad_to_multiple(disp, target=EVAL_SIZE)
    return {
        "left": left_n,
        "right": right_n,
        "disparity": disp_p,
        "pads": np.asarray(pads, np.int32),
    }
