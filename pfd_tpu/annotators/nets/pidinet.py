"""PiDiNet scribble annotator — JAX port of the pixel-difference edge net
(reference controlnet_annotator/pidinet/model.py:495-679, 'carv4' config,
inplane 60, dil 24, CSAM attention).

TPU-first: the cd/ad/rd pixel-difference convolutions (model.py:297-347) are
algebraically equivalent to vanilla convs with transformed kernels (the
reference's own PDCBlock_converted notes this, model.py:465-470) — we fold
the transform into weight conversion once, so the runtime graph is plain
depthwise/1x1 convs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu.annotators.nets import load_torch_params, pretrained_path
from pfd_tpu.ops import nn

# carv4: repeating [cd, ad, rd, cv] over 16 layers (model.py:277-294)
_CARV4 = ["cd", "ad", "rd", "cv"] * 4
_LAYER_NAMES = (["init_block"]
                + [f"block1_{i}" for i in (1, 2, 3)]
                + [f"block2_{i}" for i in (1, 2, 3, 4)]
                + [f"block3_{i}" for i in (1, 2, 3, 4)]
                + [f"block4_{i}" for i in (1, 2, 3, 4)])


def _convert_pdc(w: np.ndarray, op: str) -> np.ndarray:
    """Fold a pixel-difference conv into a vanilla kernel. w: OIHW 3x3."""
    if op == "cv":
        return w
    o, i, _, _ = w.shape
    flat = w.reshape(o, i, 9)
    if op == "cd":  # subtract kernel-sum at the center tap
        out = flat.copy()
        out[:, :, 4] -= flat.sum(-1)
        return out.reshape(o, i, 3, 3)
    if op == "ad":  # clockwise-shift difference (model.py:314-324)
        return (flat - flat[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]).reshape(o, i, 3, 3)
    if op == "rd":  # radial 5x5 scatter (model.py:326-345)
        buf = np.zeros((o, i, 25), w.dtype)
        buf[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = flat[:, :, 1:]
        buf[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -flat[:, :, 1:]
        return buf.reshape(o, i, 5, 5)
    raise ValueError(op)


def convert_sd(sd) -> dict:
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}
    sd = sd.get("state_dict", sd) if isinstance(sd.get("state_dict", None), dict) else sd
    for name, op in zip(_LAYER_NAMES, _CARV4):
        key = f"{name}.weight" if name == "init_block" else f"{name}.conv1.weight"
        if key in sd:
            sd[key] = _convert_pdc(sd[key], op)
    from pfd_tpu.io.convert import torch_sd_to_pytree

    return torch_sd_to_pytree(sd)


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _pdc_block(p, x, stride, groups):
    if stride > 1:
        x = _maxpool(x)
    pad = (p["conv1"]["kernel"].shape[0] - 1) // 2
    y = nn.conv2d(x, p["conv1"], padding=pad, groups=groups)
    y = jax.nn.relu(y)
    y = nn.conv2d(y, p["conv2"], padding=0)
    if stride > 1:
        x = nn.conv2d(x, p["shortcut"], padding=0)
    return y + x


def _cdcm(p, x):
    x = jax.nn.relu(x)
    x = nn.conv2d(x, p["conv1"], padding=0)
    return sum(nn.conv2d(x, p[f"conv2_{i}"], padding=d, dilation=d)
               for i, d in zip((1, 2, 3, 4), (5, 7, 9, 11)))


def _csam(p, x):
    y = jax.nn.relu(x)
    y = nn.conv2d(y, p["conv1"], padding=0)
    y = nn.conv2d(y, p["conv2"], padding=1)
    return x * jax.nn.sigmoid(y)


@jax.jit
def pidinet_forward(params, x):
    """x: (1, H, W, 3) in [0,1], BGR (reference flips, pidinet/__init__.py:85).
    Returns final fused sigmoid edge map (1, H, W, 1)."""
    hgt, wdt = x.shape[1:3]
    h = nn.conv2d(x, params["init_block"], padding=1)  # layer0 cd, folded

    stages = []
    plan = [("block1", 3, 1, 60), ("block2", 4, 2, 60),
            ("block3", 4, 2, 120), ("block4", 4, 2, 240)]
    for name, nblk, first_stride, groups_in in plan:
        for i in range(1, nblk + 1):
            stride = first_stride if i == 1 else 1
            gp = params[f"{name}_{i}"]
            g = gp["conv1"]["kernel"].shape[2]  # HWIO: I == 1 for depthwise
            groups = h.shape[-1] if g == 1 else 1
            h = _pdc_block(gp, h, stride, groups)
        stages.append(h)

    outs = []
    for i, xi in enumerate(stages):
        xi = _cdcm(params["dilations"][str(i)], xi)
        xi = _csam(params["attentions"][str(i)], xi)
        e = nn.conv2d(xi, params["conv_reduces"][str(i)]["conv"], padding=0)
        e = jax.image.resize(e, (1, hgt, wdt, 1), "bilinear")
        outs.append(e)

    out = nn.conv2d(jnp.concatenate(outs, -1), params["classifier"], padding=0)
    return jax.nn.sigmoid(out)


_params = None


def get_params():
    global _params
    if _params is None:
        _params = load_torch_params(
            pretrained_path("pidinet", "table5_pidinet.pth"), convert_sd)
    return _params


def apply_pidinet(image01: np.ndarray, params=None, is_safe=False,
                  apply_filter=False) -> np.ndarray:
    """image01: (H, W, 3) RGB float [0,1] -> (H, W) uint8 edge map
    (reference apply_pidinet, pidinet/__init__.py:67-96: BGR flip, /255,
    last side output)."""
    params = params if params is not None else get_params()
    x = jnp.asarray(image01[:, :, ::-1], jnp.float32)[None]
    edge = np.asarray(pidinet_forward(params, x))[0, :, :, 0]
    if apply_filter:
        edge = (edge > 0.5).astype(np.float32)
    if is_safe:
        edge = (edge * 3).astype(np.int32).astype(np.float32) / 2
    return (edge * 255.0).clip(0, 255).astype(np.uint8)


def init_params(key, dtype=None):
    """Shape-correct random params (no checkpoint needed) — see
    nets.init_from_spec / _specs.py."""
    import numpy as np
    from pfd_tpu.annotators.nets import _specs, init_from_spec
    return init_from_spec(key, _specs.PIDINET, np.float32 if dtype is None else dtype)
