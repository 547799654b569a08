"""Annotator networks (JAX ports of the reference preprocessor nets).

Each module exposes ``apply_<name>(image01, params=None)`` mirroring the
reference's lazy-loading global-singleton functional API
(e.g. hed/__init__.py:102-128): weights are loaded once from
``$PFD_PRETRAINED_ROOT/pretrained/controlnet/preprocess/...`` and cached.
"""

import os

import numpy as np


def pretrained_path(*parts) -> str:
    root = os.environ.get("PFD_PRETRAINED_ROOT", ".")
    return os.path.join(root, "pretrained", "controlnet", "preprocess", *parts)


def load_torch_params(path, converter):
    """Load a torch .pth file and convert via the generic converter."""
    from pfd_tpu.io.loader import load_sd_file

    if not os.path.exists(path):
        raise FileNotFoundError(
            f"annotator weights not found at {path}; set PFD_PRETRAINED_ROOT "
            "or pass params explicitly")
    return converter(load_sd_file(path))
