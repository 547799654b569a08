"""int8 weight/activation quantization for the serving path (TPU v5e).

The v5e MXU runs int8 x int8 -> int32 at 394 TOPS, 2x the 197 TFLOPS bf16
peak, and the DDIM step budget is conv/matmul dominated (docs/PARITY.md
round-2 attribution). This module provides the classic TensorRT-style
recipe, adapted to a functional param-pytree world:

- **weights**: symmetric per-output-channel int8, quantized offline by
  :func:`quantize_params` (a pytree pass). A quantized layer's dict carries
  ``kernel_q`` (int8) + ``kernel_scale`` (f32 per-cout) instead of
  ``kernel``; ``ops.nn.conv2d``/``ops.nn.linear`` detect that form, so no
  model code changes.
- **activations**: dynamic symmetric per-tensor int8 (abs-max), computed
  in-graph per call. Costs one extra reduction pass over the activation,
  which XLA fuses with the producing op; the 2x MXU rate dominates at UNet
  shapes.

Layers below ``min_ch`` channels, 1x1 convs, 2-D linear kernels, and
norm/embedding parameters stay bf16 (measured: XLA int8 *dots* lose to
bf16 at UNet linear shapes — only spatial convs win). Attention QK^T/PV
int8 is a separate opt-in in ops/flash_attention.py (``quant=True``),
gated by its own SSIM test because softmax exp amplifies logit error.

This is an opt-in serving mode (``PromptFreeDiffusionPipeline(quantized=
True)``); parity vs the fp32 torch reference is gated end-to-end by SSIM
tests, not by tensor-level closeness (int8 is a different numeric contract
than the reference's fp16/fp32 — reference app.py:23 uses fp16 CUDA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(kernel, *, out_axis=-1):
    """Symmetric per-output-channel int8 quantization of a conv/linear kernel.

    Returns (q, scale): q int8 with the same shape, scale f32 over the output
    channel axis such that ``q * scale ~= kernel``.
    """
    kf = kernel.astype(jnp.float32)
    oa = out_axis % kf.ndim
    axes = tuple(a for a in range(kf.ndim) if a != oa)
    amax = jnp.max(jnp.abs(kf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(kernel.shape[oa])


import os

# PFD_ACT_AMAX_STRIDE > 1 (opt-in, read at trace time): estimate the
# activation abs-max on a spatially strided subsample instead of the full
# tensor — stride s cuts the reduce pass traffic s^2x. Underestimating the
# true max clips the few missed outliers to +-127 (the quantizer clips
# anyway); output-changing, so it rides the same SSIM gates as int8 itself.
_AMAX_STRIDE = int(os.environ.get("PFD_ACT_AMAX_STRIDE", "1"))


def quantize_act(x):
    """Dynamic symmetric per-tensor int8. Returns (x8, scale) with
    ``x8 * scale ~= x``; scale is a f32 scalar."""
    xa = x
    if _AMAX_STRIDE > 1 and x.ndim == 4 and min(x.shape[1:3]) >= 2 * _AMAX_STRIDE:
        xa = x[:, ::_AMAX_STRIDE, ::_AMAX_STRIDE, :]
    amax = jnp.max(jnp.abs(xa.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                  -127, 127).astype(jnp.int8)
    return x8, scale


def _should_quantize(kernel, min_ch):
    """Spatial convs only. Measured on the v5e (tools/int8_lab.py + wrapper
    benches): XLA's int8 *conv* emitter is excellent (0.359 vs 0.903 ms bf16
    at b16 64x64 320ch, 2.5x; still 1.3-1.5x after the dynamic act-quant
    overhead), but its int8 *dot* lowering LOSES to bf16 at UNet linear
    shapes (1280^2 linear: 0.298 vs 0.226 ms; GEGLU FF pair 2x slower) —
    so 2-D kernels and 1x1 convs (= matmuls) stay bf16."""
    if kernel.ndim != 4 or kernel.shape[0] * kernel.shape[1] < 9:
        return False
    cin, cout = kernel.shape[2], kernel.shape[3]
    # zero-init output layers quantize exactly to zero (scale guard makes
    # q == 0), so they need no special case — keeping them quantized keeps
    # the pytree STRUCTURE identical between fresh-init and loaded
    # checkpoints, preserving the zero-recompile hot-swap contract
    return min(cin, cout) >= min_ch


def quantize_params(params, *, min_ch=64):
    """Walk a param pytree and quantize every conv/linear kernel of a dict
    that looks like ``{"kernel": ...}`` (optionally with bias), replacing it
    by ``{"kernel_q", "kernel_scale", ...}``. Norm scales (1-D) and biases
    are untouched. Zero-init kernels quantize exactly to zero and STAY
    quantized — structural uniformity preserves the zero-recompile
    hot-swap contract (see _should_quantize)."""

    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node and _should_quantize(node["kernel"], min_ch):
                k = node["kernel"]
                q, s = quantize_weight(k)
                new = {kk: vv for kk, vv in node.items() if kk != "kernel"}
                new["kernel_q"] = q
                new["kernel_scale"] = s
                return new
            return {kk: walk(vv) for kk, vv in node.items()}
        return node

    return walk(params)


def dequantize_params(params):
    """Inverse of :func:`quantize_params` (for tests / inspection)."""

    def walk(node):
        if isinstance(node, dict):
            if "kernel_q" in node:
                new = {kk: vv for kk, vv in node.items()
                       if kk not in ("kernel_q", "kernel_scale")}
                new["kernel"] = (node["kernel_q"].astype(jnp.float32)
                                 * node["kernel_scale"])
                return new
            return {kk: walk(vv) for kk, vv in node.items()}
        return node

    return walk(params)
