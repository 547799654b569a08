"""HED edge annotator — JAX port of ControlNetHED_Apache2
(reference controlnet_annotator/hed/__init__.py:23-59): 5 VGG-ish
DoubleConvBlock stages with per-stage 1x1 side projections, bilinear-resized,
sigmoid of the mean. RGB input, 0..255 float."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu.annotators.nets import load_torch_params, pretrained_path
from pfd_tpu.io.convert import torch_sd_to_pytree
from pfd_tpu.ops import nn

# (channels, n convs, downsample before)
_BLOCKS = [(64, 2, False), (128, 2, True), (256, 3, True),
           (512, 3, True), (512, 3, True)]


def _max_pool_2x2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


@functools.partial(jax.jit, static_argnames=())
def hed_forward(params, x):
    """x: (1, H, W, 3) float 0..255. Returns list of 5 side maps (1,h,w,1)."""
    h = x - params["norm"].reshape(1, 1, 1, 3)
    outs = []
    for i, (_, nconv, down) in enumerate(_BLOCKS):
        block = params[f"block{i + 1}"]
        if down:
            h = _max_pool_2x2(h)
        for j in range(nconv):
            h = jax.nn.relu(nn.conv2d(h, block["convs"][str(j)], padding=1))
        outs.append(nn.conv2d(h, block["projection"], padding=0))
    return outs


def convert_sd(sd) -> dict:
    tree = torch_sd_to_pytree(sd)
    # reference stores `norm` as a (1,3,1,1) raw Parameter
    tree["norm"] = np.asarray(tree["norm"]).reshape(3)
    return tree


_params = None


def get_params():
    global _params
    if _params is None:
        _params = load_torch_params(
            pretrained_path("hed", "ControlNetHED.pth"), convert_sd)
    return _params


def apply_hed(image01: np.ndarray, params=None, is_safe=False) -> np.ndarray:
    """image01: (H, W, 3) float [0,1]. Returns (H, W) uint8 edge map
    (reference apply_hed, hed/__init__.py:102-128)."""
    params = params if params is not None else get_params()
    h, w = image01.shape[:2]
    x = jnp.asarray(image01, jnp.float32)[None] * 255.0
    edges = hed_forward(params, x)
    edges = [np.asarray(jax.image.resize(e[0, :, :, 0], (h, w), "bilinear"))
             for e in edges]
    edge = 1 / (1 + np.exp(-np.mean(np.stack(edges, 2), axis=2, dtype=np.float64)))
    if is_safe:
        edge = (edge * 3).astype(np.int32).astype(np.float64) / 2
    return (edge * 255.0).clip(0, 255).astype(np.uint8)


def init_params(key, dtype=None):
    """Shape-correct random params (no checkpoint needed) — see
    nets.init_from_spec / _specs.py."""
    import numpy as np
    from pfd_tpu.annotators.nets import _specs, init_from_spec
    return init_from_spec(key, _specs.HED, np.float32 if dtype is None else dtype)
