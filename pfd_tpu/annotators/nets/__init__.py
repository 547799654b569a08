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


def init_from_spec(key, spec, dtype=np.float32, scale=0.05):
    """Random-init a net's param pytree from its ``_specs`` shape string.

    Entries are ``path:d0xd1x...`` joined by ``|`` (see _specs.py). Values
    are N(0, scale²) — shape-correct stand-ins for smoke tests and FLOP-
    representative timing when the pretrained checkpoint is absent
    (production always loads real weights)."""
    import jax

    entries = [e.split(":") for e in spec.split("|")]
    keys = jax.random.split(key, len(entries))
    tree: dict = {}
    for (path, dims), k in zip(entries, keys):
        shape = tuple(int(d) for d in dims.split("x")) if dims else ()
        node = tree
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(
            jax.random.normal(k, shape) * scale, dtype)
    return tree
