"""Model registry: maps config ``type`` strings to model classes.

Mirrors the reference's ``@register('name')`` + ``get_model()`` pattern
(lib/model_zoo/common/get_model.py:54-124) in a functional style: each model
"class" here is a lightweight object with ``init(rng, **shape_hints) -> params``
and ``apply(params, ...) -> out`` plus a static plan derived from its config.
"""

from __future__ import annotations

import importlib
from typing import Callable

_REGISTRY: dict[str, Callable] = {}

# type-prefix -> module that defines it (lazily imported, mirroring
# get_model.py:72-85's lazy module import by cfg.type prefix).
_MODULE_FOR_PREFIX = {
    "autoencoderkl": "pfd_tpu.models.autokl",
    "clip": "pfd_tpu.models.clip",
    "openclip": "pfd_tpu.models.clip",
    "openai_unet": "pfd_tpu.models.unet",
    "swin": "pfd_tpu.models.swin",
    "seecoder": "pfd_tpu.models.seecoder",
    "controlnet": "pfd_tpu.models.controlnet",
    "pfd": "pfd_tpu.models.pfd",
}


def register(name: str):
    def deco(fn):
        if name in _REGISTRY:
            raise KeyError(f"model type {name!r} already registered")
        _REGISTRY[name] = fn
        return fn

    return deco


def get(name: str) -> Callable:
    if name not in _REGISTRY:
        for prefix, module in _MODULE_FOR_PREFIX.items():
            if name.startswith(prefix):
                importlib.import_module(module)
                break
    if name not in _REGISTRY:
        raise KeyError(f"unknown model type {name!r}")
    return _REGISTRY[name]


def build_model(cfg: dict):
    """Construct a model object from a resolved config dict."""
    return get(cfg["type"])(**cfg.get("args", {}))
