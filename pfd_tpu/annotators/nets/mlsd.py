"""M-LSD line-segment annotator — JAX port of MobileV2_MLSD_Large
(reference controlnet_annotator/mlsd/models/mbv2_mlsd_large.py) plus the
pred_lines decoder (mlsd/utils.py:49-90) and a NumPy Bresenham rasterizer
replacing cv2.line (mlsd/__init__.py:79-81)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu.annotators.nets import load_torch_params, pretrained_path
from pfd_tpu.io.convert import torch_sd_to_pytree
from pfd_tpu.ops import nn

# MobileNetV2 inverted-residual setting (t, c, n, s) — mbv2_mlsd_large.py:173-180
_IR_SETTING = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
               (6, 64, 4, 2), (6, 96, 3, 1)]
_FPN_SELECTED = [1, 3, 6, 10, 13]


def _conv_bn_relu6(p, x, *, stride=1, groups=1, k=3):
    """TFLite-style padding: stride 2 pads (0,1,0,1) + VALID (mbv2:100-121)."""
    if stride == 2:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        pad = 0
    else:
        pad = (k - 1) // 2
    x = nn.conv2d(x, {"kernel": p["0"]["kernel"]}, stride=stride, padding=pad,
                  groups=groups)
    x = nn.batch_norm(x, p["1"])
    return jnp.clip(x, 0.0, 6.0)  # ReLU6


def _inverted_residual(p, x, t, stride):
    cin = x.shape[-1]
    h = x
    i = 0
    if t != 1:
        h = _conv_bn_relu6(p["conv"][str(i)], h, k=1)
        i += 1
    hidden = h.shape[-1]
    h = _conv_bn_relu6(p["conv"][str(i)], h, stride=stride, groups=hidden)
    i += 1
    h = nn.conv2d(h, {"kernel": p["conv"][str(i)]["kernel"]}, padding=0)
    h = nn.batch_norm(h, p["conv"][str(i + 1)])
    if stride == 1 and cin == h.shape[-1]:
        h = x + h
    return h


def _upsample2x_align_corners(x):
    """Bilinear x2 with align_corners=True (torch F.interpolate semantics)."""
    b, h, w, c = x.shape
    yy = jnp.linspace(0.0, h - 1.0, 2 * h)
    xx = jnp.linspace(0.0, w - 1.0, 2 * w)
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (yy - y0)[None, :, None, None]
    wx = (xx - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _block_a(p, a, b, upscale=True):
    b = _cbr(p["conv1"], b, k=1)
    a = _cbr(p["conv2"], a, k=1)
    if upscale:
        b = _upsample2x_align_corners(b)
    return jnp.concatenate([a, b], axis=-1)


def _cbr(p, x, k=3, dilation=1):
    pad = dilation * (k - 1) // 2
    x = nn.conv2d(x, p["0"], padding=pad, dilation=dilation)
    x = nn.batch_norm(x, p["1"])
    return jax.nn.relu(x)


def _block_b(p, x):
    x = _cbr(p["conv1"], x) + x
    return _cbr(p["conv2"], x)


def _block_c(p, x):
    x = _cbr(p["conv1"], x, dilation=5)
    x = _cbr(p["conv2"], x)
    return nn.conv2d(x, p["conv3"], padding=0)


@jax.jit
def mlsd_forward(params, x):
    """x: (1, 512, 512, 4) normalized [-1,1]. Returns (1, 256, 256, 9)."""
    bb = params["backbone"]["features"]
    h = _conv_bn_relu6(bb["0"], x, stride=2)
    feats = []
    idx = 1
    for t, c, n, s in _IR_SETTING:
        for i in range(n):
            stride = s if i == 0 else 1
            h = _inverted_residual(bb[str(idx)], h, t, stride)
            if idx in _FPN_SELECTED:
                feats.append(h)
            idx += 1
    c1, c2, c3, c4, c5 = feats

    h = _block_a(params["block15"], c4, c5, upscale=False)
    h = _block_b(params["block16"], h)
    h = _block_a(params["block17"], c3, h)
    h = _block_b(params["block18"], h)
    h = _block_a(params["block19"], c2, h)
    h = _block_b(params["block20"], h)
    h = _block_a(params["block21"], c1, h)
    h = _block_b(params["block22"], h)
    h = _block_c(params["block23"], h)
    return h[:, :, :, 7:]


def decode_lines(tp_map: np.ndarray, topk=200, ksize=3, score_thr=0.1,
                 dist_thr=20.0):
    """pred_lines decoding (mlsd/utils.py:17-90): sigmoid center heat, local
    max NMS, top-k corners, displacement vectors, thresholds. NumPy on host."""
    center = tp_map[0, :, :, 0]
    displacement = tp_map[0, :, :, 1:5]
    heat = 1.0 / (1.0 + np.exp(-center))

    r = (ksize - 1) // 2
    hp = np.pad(heat, r, mode="constant", constant_values=-np.inf)
    hmax = np.full_like(heat, -np.inf)
    hgt, wdt = heat.shape
    for dy in range(ksize):
        for dx in range(ksize):
            hmax = np.maximum(hmax, hp[dy:dy + hgt, dx:dx + wdt])
    keep = (hmax == heat)
    flat = np.where(keep, heat, 0.0).reshape(-1)

    idx = np.argpartition(-flat, topk)[:topk]
    idx = idx[np.argsort(-flat[idx])]
    scores = flat[idx]
    yy, xx = idx // wdt, idx % wdt

    dist = np.sqrt(np.sum((displacement[:, :, :2] - displacement[:, :, 2:]) ** 2, -1))
    segs = []
    for y, x, s in zip(yy, xx, scores):
        if s > score_thr and dist[y, x] > dist_thr:
            dxs, dys, dxe, dye = displacement[y, x]
            segs.append([x + dxs, y + dys, x + dxe, y + dye])
    return np.asarray(segs, np.float32).reshape(-1, 4)


def draw_line(canvas: np.ndarray, x0, y0, x1, y1, value=255):
    """1-px Bresenham line (replaces cv2.line)."""
    h, w = canvas.shape[:2]
    x0, y0, x1, y1 = int(x0), int(y0), int(x1), int(y1)
    dx, dy = abs(x1 - x0), -abs(y1 - y0)
    sx = 1 if x0 < x1 else -1
    sy = 1 if y0 < y1 else -1
    err = dx + dy
    while True:
        if 0 <= y0 < h and 0 <= x0 < w:
            canvas[y0, x0] = value
        if x0 == x1 and y0 == y1:
            break
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x0 += sx
        if e2 <= dx:
            err += dx
            y0 += sy


_params = None


def get_params():
    global _params
    if _params is None:
        _params = load_torch_params(
            pretrained_path("mlsd", "mlsd_large_512_fp32.pth"),
            torch_sd_to_pytree)
    return _params


def apply_mlsd(image01: np.ndarray, params=None, thr_v=0.1, thr_d=0.1) -> np.ndarray:
    """image01: (H, W, 3) [0,1] -> (H, W) uint8 line drawing
    (reference apply_mlsd, mlsd/__init__.py:56-81)."""
    from pfd_tpu.annotators.imageops import resize_image

    params = params if params is not None else get_params()
    h, w = image01.shape[:2]
    img = resize_image(image01 * 255.0, (512, 512), method="bilinear")
    x = np.concatenate([img, np.ones((512, 512, 1), np.float32)], -1)
    x = (x / 127.5) - 1.0
    out = np.asarray(mlsd_forward(params, jnp.asarray(x, jnp.float32)[None]))
    lines = decode_lines(out, score_thr=thr_v, dist_thr=thr_d)
    canvas = np.zeros((h, w), np.uint8)
    if len(lines):
        lines = lines * 2.0  # 256 -> 512 (utils.py:84)
        lines[:, 0] *= w / 512.0
        lines[:, 1] *= h / 512.0
        lines[:, 2] *= w / 512.0
        lines[:, 3] *= h / 512.0
        for x0, y0, x1, y1 in lines:
            draw_line(canvas, x0, y0, x1, y1)
    return canvas


def init_params(key, dtype=None):
    """Shape-correct random params (no checkpoint needed) — see
    nets.init_from_spec / _specs.py."""
    import numpy as np
    from pfd_tpu.annotators.nets import _specs, init_from_spec
    return init_from_spec(key, _specs.MLSD, np.float32 if dtype is None else dtype)
