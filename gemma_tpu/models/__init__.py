"""Model registry.

The reference supports exactly one architecture (Gemma) wired by name
(`composite_model`, gemma_model.cpp:159-194). The registry keeps that
capability open-ended: new decoder families register a (config-from-gguf,
forward) pair keyed by the GGUF `general.architecture` string.
"""
from __future__ import annotations

from typing import Callable

from . import gemma
from .config import GEMMA_2B, GEMMA_7B, GemmaConfig
from .params import load_params

_REGISTRY: dict[str, dict] = {}


def register_architecture(name: str, *, config_cls, forward: Callable) -> None:
    _REGISTRY[name] = {"config_cls": config_cls, "forward": forward}


def get_architecture(name: str) -> dict:
    if name not in _REGISTRY:
        raise KeyError(f"unknown architecture {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


# Gemma-1 (2B MQA / 7B MHA). Gemma-2/3 config knobs (softcaps, sliding
# window) are parsed by GemmaConfig and honored by the forward pass.
register_architecture("gemma", config_cls=GemmaConfig, forward=gemma.forward)
register_architecture("gemma2", config_cls=GemmaConfig, forward=gemma.forward)

__all__ = [
    "GemmaConfig",
    "GEMMA_2B",
    "GEMMA_7B",
    "gemma",
    "load_params",
    "register_architecture",
    "get_architecture",
]
