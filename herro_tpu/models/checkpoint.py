"""Model checkpoint save/load.

A checkpoint is a directory holding ``config.json`` (the ModelConfig) and
``params.msgpack`` (flax-serialised parameters) — the framework's analogue of
the reference's TorchScript ``model.pt`` blob (README.md:60-73). The trainer
writes the same format mid-run (plus a ``step.txt`` marker) for restarts.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
from flax import serialization

from .model import CONFIGS, CorrectionModel, ModelConfig, init_params


def save_model(path: str, cfg: ModelConfig, params) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as fh:
        json.dump(dataclasses.asdict(cfg), fh, indent=1)
    with open(os.path.join(path, "params.msgpack"), "wb") as fh:
        fh.write(serialization.to_bytes(jax.device_get(params)))


def load_model(path: str) -> tuple[ModelConfig, dict]:
    with open(os.path.join(path, "config.json")) as fh:
        cfg = ModelConfig(**json.load(fh))
    template = init_params(cfg, jax.random.PRNGKey(0))
    with open(os.path.join(path, "params.msgpack"), "rb") as fh:
        params = serialization.from_bytes(template, fh.read())
    return cfg, params


def load_or_init(path_or_name: str, rng_seed: int = 0) -> tuple[ModelConfig, dict]:
    """Load a checkpoint directory, or initialise a named config
    ('tiny' / 'r10' / 'r9') with random weights."""
    if path_or_name in CONFIGS:
        cfg = CONFIGS[path_or_name]
        return cfg, init_params(cfg, jax.random.PRNGKey(rng_seed))
    return load_model(path_or_name)
