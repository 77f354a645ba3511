"""Flax model zoo: ECM stereo network (stacked-hourglass) + basic variant.

Mirrors the reference model zoo (``models/__init__.py``, ``models/basic.py``,
``models/stackhourglass.py``, ``models/submodule.py`` — SURVEY.md 2.1) with
TPU-native channels-last layouts and a parameterizable context-mapping module.
"""

from ecm_tpu.models.aggregation import ECMAggregation, Hourglass
from ecm_tpu.models.context import ContextMapping
from ecm_tpu.models.ecm import ECMStereo, build_model
from ecm_tpu.models.features import FeatureExtraction

__all__ = [
    "ECMAggregation",
    "ECMStereo",
    "ContextMapping",
    "FeatureExtraction",
    "Hourglass",
    "build_model",
]
