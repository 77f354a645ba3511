"""Dataclass configs — one per BASELINE.json target config (SURVEY.md
section 5 'config/flag system')."""

from ecm_tpu.configs.base import (
    CONFIGS,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)

__all__ = ["CONFIGS", "DataConfig", "ExperimentConfig", "ModelConfig", "TrainConfig"]
