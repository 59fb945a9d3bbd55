from .model import (
    CONFIGS,
    CorrectionModel,
    ModelConfig,
    R9_CONFIG,
    R10_CONFIG,
    TINY_CONFIG,
    init_params,
)
from .checkpoint import load_model, load_or_init, save_model

__all__ = [
    "CONFIGS",
    "CorrectionModel",
    "ModelConfig",
    "R9_CONFIG",
    "R10_CONFIG",
    "TINY_CONFIG",
    "init_params",
    "load_model",
    "load_or_init",
    "save_model",
]
