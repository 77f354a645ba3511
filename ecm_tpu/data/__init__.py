"""Data layer (reference components D1-D6, SURVEY.md 2.2) — TPU-native:
numpy/PIL readers + host-sharded grain pipeline replacing the reference's
``torch.utils.data`` stack.
"""

from ecm_tpu.data.pfm import read_pfm, write_pfm
from ecm_tpu.data.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    normalize,
    pad_to_multiple,
    random_crop,
)

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "normalize",
    "pad_to_multiple",
    "random_crop",
    "read_pfm",
    "write_pfm",
]
