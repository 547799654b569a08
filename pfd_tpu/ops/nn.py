"""Functional NN primitives, NHWC / TPU-native.

Every op is a pure function ``op(x, params, ...)`` over a parameter pytree.
Layout conventions (chosen for TPU, not inherited from the torch reference):

- activations: NHWC (channels-last; XLA's native conv layout on TPU),
- conv kernels: HWIO,
- linear kernels: (in, out) so forward is ``x @ kernel`` (MXU-friendly),
- norm statistics and attention softmax accumulate in fp32 (policy-controlled).

Semantics (not layout) match the reference blocks:
- group_norm: torch GroupNorm (reference diffusion_utils.py:175-191 uses eps=1e-5
  via GroupNorm32; attention.py:84 and the VAE use eps=1e-6 — eps is an argument).
- gelu: exact erf form (torch.nn.GELU default), used by GEGLU/FeedForward
  (reference attention.py:44-71).
- timestep_embedding: cos-then-sin sinusoid (reference diffusion_utils.py:131-151).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# Read ONCE at import: the fused-upconv A/B knob is process-level — jitted
# pipelines cache their traces, so flipping the env after first compile
# would silently have no effect (set it before the process starts).
NO_FUSED_UPCONV = bool(os.environ.get("PFD_NO_FUSED_UPCONV"))


# ---------------------------------------------------------------------------
# initializers (torch-default-compatible where it matters; exactness only
# matters for zero-init layers, which diffusion models rely on structurally)
# ---------------------------------------------------------------------------

def _fan_in(shape, kind):
    if kind == "conv":  # HWIO
        return shape[0] * shape[1] * shape[2]
    return shape[0]  # linear (in, out)


def init_conv(key, h, w, cin, cout, dtype=jnp.float32, zero=False):
    shape = (h, w, cin, cout)
    if zero:
        kernel = jnp.zeros(shape, dtype)
        bias = jnp.zeros((cout,), dtype)
    else:
        kkey, bkey = jax.random.split(key)
        bound = 1.0 / math.sqrt(_fan_in(shape, "conv"))
        kernel = jax.random.uniform(kkey, shape, dtype, -math.sqrt(3.0) * bound, math.sqrt(3.0) * bound)
        bias = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return {"kernel": kernel, "bias": bias}


def init_linear(key, cin, cout, dtype=jnp.float32, zero=False, bias=True):
    if zero:
        p = {"kernel": jnp.zeros((cin, cout), dtype)}
        if bias:
            p["bias"] = jnp.zeros((cout,), dtype)
        return p
    kkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    p = {"kernel": jax.random.uniform(kkey, (cin, cout), dtype, -math.sqrt(3.0) * bound, math.sqrt(3.0) * bound)}
    if bias:
        p["bias"] = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return p


def init_norm(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


# ---------------------------------------------------------------------------
# core ops
# ---------------------------------------------------------------------------

def conv2d(x, p, *, stride=1, padding="SAME", dilation=1, groups=1):
    """NHWC conv. ``padding`` may be 'SAME', 'VALID', an int, or explicit pairs.

    A param dict carrying ``kernel_q``/``kernel_scale`` (see ops.quant) runs
    on the int8 MXU path: dynamic per-tensor activation quant, int8 x int8 ->
    int32 conv, per-cout dequant.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    conv_kw = dict(
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "kernel_q" in p:
        from pfd_tpu.ops import quant
        x8, sx = quant.quantize_act(x)
        y = lax.conv_general_dilated(
            x8, p["kernel_q"], preferred_element_type=jnp.int32, **conv_kw)
        y = (y.astype(jnp.float32)
             * (sx * p["kernel_scale"].astype(jnp.float32))).astype(x.dtype)
    else:
        y = lax.conv_general_dilated(x, p["kernel"].astype(x.dtype), **conv_kw)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def linear(x, p):
    if "kernel_q" in p:
        from pfd_tpu.ops import quant
        x8, sx = quant.quantize_act(x)
        y = lax.dot_general(x8, p["kernel_q"],
                            (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32)
             * (sx * p["kernel_scale"].astype(jnp.float32))).astype(x.dtype)
    else:
        y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def fused_linear(x, ps):
    """Several no-bias linear layers folded into ONE matmul by concatenating
    their kernels along the output dim (e.g. the self-attention q|k|v
    projection). Quantization-aware: if every layer carries int8 weights the
    concat happens in int8 and the activation is quantized once."""
    if all("kernel_q" in p for p in ps):
        from pfd_tpu.ops import quant
        w8 = jnp.concatenate([p["kernel_q"] for p in ps], axis=1)
        sw = jnp.concatenate([p["kernel_scale"].astype(jnp.float32)
                              for p in ps], axis=0)
        x8, sx = quant.quantize_act(x)
        y = lax.dot_general(x8, w8, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)
    assert not any("kernel_q" in p for p in ps), (
        "fused_linear: mixed quantized/bf16 members — quantize all or none "
        "of the fused layers (quantize_params never produces this; check "
        "_should_quantize rules)")
    w = jnp.concatenate([p["kernel"] for p in ps], axis=1).astype(x.dtype)
    return x @ w


def group_norm(x, p, *, groups=32, eps=1e-5, norm_dtype=jnp.float32):
    """GroupNorm over NHWC (or N...C) in fp32, channels grouped contiguously."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    assert c % groups == 0, (c, groups)
    xf = x.astype(norm_dtype)
    shape = x.shape[:-1] + (groups, c // groups)
    xg = xf.reshape(shape)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = xg.mean(axes, keepdims=True)
    var = xg.var(axes, keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    xf = xg.reshape(x.shape)
    xf = xf * p["scale"].astype(norm_dtype) + p["bias"].astype(norm_dtype)
    return xf.astype(orig_dtype)


def group_norm_affine(x, scale, bias, *, groups=32, eps=1e-5, shift=None):
    """Per-(B, C) affine (a, c) with ``GroupNorm(x + shift)*scale + bias ==
    x*a + c`` — GroupNorm reduced to its statistics.

    ``shift`` is an optional (B, C) channelwise add *before* the norm (the
    ResBlock time-embedding), folded algebraically so ``x + shift`` is never
    materialized: the affine apply then fuses into the consumer's elementwise
    chain (measured: the ds1 ResBlock's out-chain loses ~0.8 ms to the
    emb-add breaking XLA's GN fusion). Stats in fp32 like group_norm.
    Returns (a, c) fp32 arrays of shape (B, C).
    """
    b, cch = x.shape[0], x.shape[-1]
    n_red = 1
    for s in x.shape[1:-1]:
        n_red *= s
    red_axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=red_axes)                # (B, C)
    s2 = jnp.sum(xf * xf, axis=red_axes)           # (B, C)
    e = (jnp.zeros((b, cch), jnp.float32) if shift is None
         else shift.astype(jnp.float32))
    cg = cch // groups
    m1_c = s1 / n_red + e                          # per-channel moments of x+e
    m2_c = s2 / n_red + 2.0 * e * (s1 / n_red) + e * e
    m1_g = m1_c.reshape(b, groups, cg).mean(-1)    # (B, G)
    m2_g = m2_c.reshape(b, groups, cg).mean(-1)
    var_g = m2_g - m1_g * m1_g
    rstd_g = lax.rsqrt(var_g + eps)
    rstd_c = jnp.repeat(rstd_g, cg, axis=1)        # (B, C)
    mean_c = jnp.repeat(m1_g, cg, axis=1)
    a = scale.astype(jnp.float32)[None] * rstd_c
    c = a * (e - mean_c) + bias.astype(jnp.float32)[None]
    return a, c


def batch_norm(x, p, *, eps=1e-5):
    """Inference-mode BatchNorm over the channel (last) axis using running
    statistics (torch keys: weight/bias/running_mean/running_var)."""
    mean = p["running_mean"].astype(jnp.float32)
    var = p["running_var"].astype(jnp.float32)
    scale = p["scale"].astype(jnp.float32) * lax.rsqrt(var + eps)
    bias = p["bias"].astype(jnp.float32) - mean * scale
    return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)


def layer_norm(x, p, *, eps=1e-5, norm_dtype=jnp.float32):
    orig_dtype = x.dtype
    xf = x.astype(norm_dtype)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf * p["scale"].astype(norm_dtype) + p["bias"].astype(norm_dtype)
    return xf.astype(orig_dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x, approximate=False):
    # exact erf gelu (torch nn.GELU default); tanh approx under the bf16
    # policy (see policy.Policy.gelu_approx for the error/latency analysis)
    return jax.nn.gelu(x, approximate=approximate)


def geglu(x, p, approximate=False):
    """GEGLU feed-forward gate (reference attention.py:44-52)."""
    y = linear(x, p)
    val, gate = jnp.split(y, 2, axis=-1)
    return val * gelu(gate, approximate)


def timestep_embedding(timesteps, dim, max_period=10000, dtype=jnp.float32):
    """Sinusoidal diffusion timestep embedding, [cos | sin] order
    (reference diffusion_utils.py:131-151)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


def nearest_upsample_2x(x):
    """Nearest-neighbor 2x upsample, NHWC (torch F.interpolate mode='nearest')."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _phase_kernel(k):
    """(3,3,C,K) kernel -> (2,2,C,4K) phase-decomposed kernel for
    :func:`upsample_conv2d`. For output phase p (per axis), the three taps of
    the 3x3 window land on only TWO distinct pre-upsample pixels, so the
    phase kernel is a 2-tap kernel of partial sums: phase 0 sees (x[i-1],
    x[i]) with weights (w0, w1+w2); phase 1 sees (x[i], x[i+1]) with
    (w0+w1, w2). Output channels are ordered (p, q, K)."""
    h0 = jnp.stack([k[0], k[1] + k[2]], axis=0)          # (2,3,C,K)
    h1 = jnp.stack([k[0] + k[1], k[2]], axis=0)
    phases = []
    for hp in (h0, h1):
        phases.append(jnp.stack([hp[:, 0], hp[:, 1] + hp[:, 2]], axis=1))
        phases.append(jnp.stack([hp[:, 0] + hp[:, 1], hp[:, 2]], axis=1))
    return jnp.concatenate(phases, axis=-1)              # (2,2,C,4K)


def upsample_conv2d(x, p):
    """``conv2d(nearest_upsample_2x(x), p, padding=1)`` as ONE conv at the
    PRE-upsample resolution — a lossless algebraic rewrite (exact in fp32;
    within one rounding of the naive path in bf16/int8).

    Nearest-2x duplicates pixels, so each of the four output phases (p,q)
    of the 3x3 conv reads only a 2x2 window of the small input with
    partial-sum weights (:func:`_phase_kernel`). One VALID 2x2 conv over the
    1-padded input produces all four phase maps as channel groups
    ((H+1)x(W+1) so both phase alignments are slices), and a pixel shuffle
    interleaves them. 16 vs 36 C^2 HW MACs (2.25x fewer FLOPs) and the 4x
    upsampled intermediate is never materialized. Used by the UNet Upsample
    blocks (inside the 50-step scan; the kernel derivation is
    loop-invariant, hoisted by XLA) and the VAE decoder levels.

    ``PFD_NO_FUSED_UPCONV=1`` falls back to the naive
    upsample-then-conv chain (e2e A/B handle: the per-op TPU attribution
    is unmeasurable on this backend, docs/PARITY.md). Read once at import
    (module constant) — set it before the process starts; flipping it
    after a pipeline compiled would silently not take effect."""
    if NO_FUSED_UPCONV:
        return conv2d(nearest_upsample_2x(x), p, padding=1)
    n, h, w, c = x.shape
    if "kernel_q" in p:
        from pfd_tpu.ops import quant
        k = p["kernel_q"].astype(jnp.float32) * p["kernel_scale"]
        pk, ps = quant.quantize_weight(_phase_kernel(k))
        x8, sx = quant.quantize_act(x)
        xp = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (0, 0)))
        z = lax.conv_general_dilated(
            xp, pk, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        z = (z.astype(jnp.float32)
             * (sx * ps.astype(jnp.float32))).astype(x.dtype)
    else:
        pk = _phase_kernel(p["kernel"].astype(jnp.float32)).astype(x.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        z = lax.conv_general_dilated(
            xp, pk, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    kout = z.shape[-1] // 4
    # phase (p,q) output index (i,j) sits at padded-conv index (i+p, j+q)
    z4 = jnp.stack([
        z[:, 0:h, 0:w, 0 * kout:1 * kout],
        z[:, 0:h, 1:w + 1, 1 * kout:2 * kout],
        z[:, 1:h + 1, 0:w, 2 * kout:3 * kout],
        z[:, 1:h + 1, 1:w + 1, 3 * kout:4 * kout],
    ], axis=3).reshape(n, h, w, 2, 2, kout)
    y = z4.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, kout)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def avg_pool_2x(x):
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") * 0.25


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def split_heads(x, n_heads):
    """(B, S, H*D) -> (B, H, S, D)"""
    b, s, hd = x.shape
    return x.reshape(b, s, n_heads, hd // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    """(B, H, S, D) -> (B, S, H*D)"""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def dot_product_attention(q, k, v, *, scale=None, softmax_dtype=jnp.float32,
                          mask=None, bias=None):
    """Reference attention math (attention.py:181-196) with fp32 softmax.

    q: (B, H, Sq, D), k/v: (B, H, Sk, D). Returns (B, H, Sq, D) in q.dtype.
    """
    orig_dtype = q.dtype
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=softmax_dtype) * scale
    if bias is not None:
        logits = logits + bias.astype(softmax_dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(softmax_dtype).min)
    probs = jax.nn.softmax(logits.astype(softmax_dtype), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(orig_dtype), v)
    return out


def multi_head_attention(x_q, x_kv, p, n_heads, *, softmax_dtype=jnp.float32,
                         mask=None, bias=None, attn_fn=None):
    """Separate-projection MHA: to_q/to_k/to_v (no bias) + to_out.

    Matches reference CrossAttention (attention.py:159-201). ``attn_fn`` lets
    callers swap in the Pallas flash kernel.
    """
    q = split_heads(linear(x_q, p["to_q"]), n_heads)
    k = split_heads(linear(x_kv, p["to_k"]), n_heads)
    v = split_heads(linear(x_kv, p["to_v"]), n_heads)
    fn = attn_fn or partial(dot_product_attention, softmax_dtype=softmax_dtype)
    out = fn(q, k, v, mask=mask, bias=bias) if (mask is not None or bias is not None) else fn(q, k, v)
    return linear(merge_heads(out), p["to_out"])


def torch_mha(x_q, x_kv, p, n_heads, *, softmax_dtype=jnp.float32, bias=None):
    """torch.nn.MultiheadAttention semantics: packed in-proj (q|k|v) with bias,
    plus out-proj with bias. Used by SeeCoder decoder/query-transformer
    (reference seecoder.py:60-246 uses nn.MultiheadAttention throughout).

    p: {'in_proj': {'kernel': (E, 3E), 'bias': (3E,)}, 'out_proj': {...}}
    """
    e = x_q.shape[-1]
    w = p["in_proj"]["kernel"].astype(x_q.dtype)
    b = p["in_proj"]["bias"].astype(x_q.dtype)
    wq, wk, wv = w[:, :e], w[:, e:2 * e], w[:, 2 * e:]
    bq, bk, bv = b[:e], b[e:2 * e], b[2 * e:]
    q = split_heads(x_q @ wq + bq, n_heads)
    k = split_heads(x_kv @ wk + bk, n_heads)
    v = split_heads(x_kv @ wv + bv, n_heads)
    out = dot_product_attention(q, k, v, softmax_dtype=softmax_dtype, bias=bias)
    return linear(merge_heads(out), p["out_proj"])
