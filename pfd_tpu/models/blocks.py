"""Shared UNet building blocks (ResBlock / SpatialTransformer / up / down).

Semantics match the reference blocks used by both the diffuser UNet and
ControlNet: ResBlock (openaimodel.py:162-274, use_scale_shift_norm=False path),
SpatialTransformer + BasicTransformerBlock + GEGLU FF (attention.py:277-371),
Upsample/Downsample (openaimodel.py:89-159). Layout is NHWC; attention runs
with fp32 softmax and can be swapped for the Pallas flash kernel via attn_fn.

Pytree naming mirrors the torch module names (in_layers.0/2, emb_layers.1,
out_layers.0/3, skip_connection, norm/proj_in/transformer_blocks/proj_out)
so reference checkpoints convert mechanically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pfd_tpu.ops import nn
from pfd_tpu.policy import Policy


# ---------------------------------------------------------------------------
# ResBlock
# ---------------------------------------------------------------------------

def init_res_block(key, cin, cout, emb_ch, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "in_layers": {
            "0": nn.init_norm(cin, dtype),
            "2": nn.init_conv(ks[0], 3, 3, cin, cout, dtype),
        },
        "emb_layers": {"1": nn.init_linear(ks[1], emb_ch, cout, dtype)},
        "out_layers": {
            "0": nn.init_norm(cout, dtype),
            "3": nn.init_conv(ks[2], 3, 3, cout, cout, dtype, zero=True),
        },
    }
    if cin != cout:
        p["skip_connection"] = nn.init_conv(ks[3], 1, 1, cin, cout, dtype)
    return p


def res_block(p, x, emb, policy: Policy):
    """x: NHWC, emb: (B, emb_ch). GroupNorm32 eps=1e-5.

    The out-chain computes GroupNorm(h + emb) as a per-(B, C) affine of h
    (nn.group_norm_affine): the emb shift folds into the statistics, so the
    h+emb tensor is never materialized and the affine+SiLU fuse into the
    conv's input elementwise chain (the separate add/GN cost the ds1
    ResBlock ~0.8 ms of its 3.0 ms, measured b16 @512^2)."""
    h = nn.group_norm(x, p["in_layers"]["0"], eps=1e-5, norm_dtype=policy.norm_dtype)
    h = nn.silu(h)
    h = nn.conv2d(h, p["in_layers"]["2"], padding=1)
    emb_out = nn.linear(nn.silu(emb), p["emb_layers"]["1"])
    op = p["out_layers"]["0"]
    a, c = nn.group_norm_affine(h, op["scale"], op["bias"], eps=1e-5,
                                shift=emb_out)
    hf = h.astype(jnp.float32) * a[:, None, None, :] + c[:, None, None, :]
    h = nn.silu(hf).astype(h.dtype)
    h = nn.conv2d(h, p["out_layers"]["3"], padding=1)
    if "skip_connection" in p:
        x = nn.conv2d(x, p["skip_connection"], padding=0)
    return x + h


# ---------------------------------------------------------------------------
# SpatialTransformer
# ---------------------------------------------------------------------------

def init_cross_attention(key, query_dim, context_dim, inner_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "to_q": nn.init_linear(ks[0], query_dim, inner_dim, dtype, bias=False),
        "to_k": nn.init_linear(ks[1], context_dim, inner_dim, dtype, bias=False),
        "to_v": nn.init_linear(ks[2], context_dim, inner_dim, dtype, bias=False),
        # torch: to_out = Sequential(Linear, Dropout) -> key "to_out.0"
        "to_out": {"0": nn.init_linear(ks[3], inner_dim, query_dim, dtype)},
    }


def init_basic_transformer_block(key, dim, n_heads, d_head, context_dim, dtype):
    ks = jax.random.split(key, 4)
    inner = n_heads * d_head
    return {
        "attn1": init_cross_attention(ks[0], dim, dim, inner, dtype),
        "attn2": init_cross_attention(ks[1], dim, context_dim, inner, dtype),
        "ff": {"net": {
            "0": {"proj": nn.init_linear(ks[2], dim, dim * 4 * 2, dtype)},  # GEGLU
            "2": nn.init_linear(ks[3], dim * 4, dim, dtype),
        }},
        "norm1": nn.init_norm(dim, dtype),
        "norm2": nn.init_norm(dim, dtype),
        "norm3": nn.init_norm(dim, dtype),
    }


def init_spatial_transformer(key, in_channels, n_heads, d_head, context_dim,
                             dtype, depth=1):
    ks = jax.random.split(key, depth + 2)
    inner = n_heads * d_head
    return {
        "norm": nn.init_norm(in_channels, dtype),
        "proj_in": nn.init_conv(ks[0], 1, 1, in_channels, inner, dtype),
        "transformer_blocks": {
            str(d): init_basic_transformer_block(ks[1 + d], inner, n_heads, d_head,
                                                 context_dim, dtype)
            for d in range(depth)
        },
        "proj_out": nn.init_conv(ks[-1], 1, 1, inner, in_channels, dtype, zero=True),
    }


def _mha(p, x_q, x_kv, n_heads, policy, attn_fn=None):
    if x_kv is x_q:
        # self-attention: one fused qkv matmul (3x fewer passes over x and a
        # wider N for MXU tiling; the q/k/v kernels stay separate params for
        # the checkpoint contract — concatenated at trace time, so XLA hoists
        # the concat out of the sampler scan)
        qkv = nn.fused_linear(x_q, [p["to_q"], p["to_k"], p["to_v"]])
        q, k, v = (nn.split_heads(t, n_heads)
                   for t in jnp.split(qkv, 3, axis=-1))
    else:
        q = nn.split_heads(nn.linear(x_q, p["to_q"]), n_heads)
        k = nn.split_heads(nn.linear(x_kv, p["to_k"]), n_heads)
        v = nn.split_heads(nn.linear(x_kv, p["to_v"]), n_heads)
    if attn_fn is None:
        out = nn.dot_product_attention(q, k, v, softmax_dtype=policy.softmax_dtype)
    else:
        out = attn_fn(q, k, v)
    return nn.linear(nn.merge_heads(out), p["to_out"]["0"])


def basic_transformer_block(p, x, context, n_heads, policy: Policy,
                            self_attn_fn=None):
    """LN -> self-attn -> LN -> cross-attn(context) -> LN -> GEGLU FF, residual
    each (attention.py:295-306). self_attn_fn optionally swaps in flash attention
    for the long spatial self-attention; cross-attn KV is short (148 tokens)."""
    h = nn.layer_norm(x, p["norm1"], norm_dtype=policy.norm_dtype)
    x = _mha(p["attn1"], h, h, n_heads, policy, attn_fn=self_attn_fn) + x
    h = nn.layer_norm(x, p["norm2"], norm_dtype=policy.norm_dtype)
    kv = context if context is not None else h
    # when Pallas kernels are enabled (self_attn_fn set), the short-KV
    # cross-attention also runs its resident-kv kernel (1.2 -> ~0.4 ms per
    # ds1 block; XLA round-trips the (S, 148) logits through HBM)
    cross_fn = None
    if self_attn_fn is not None:
        from pfd_tpu.ops.flash_attention import cross_attn_fn
        cross_fn = cross_attn_fn
    x = _mha(p["attn2"], h, kv, n_heads, policy, attn_fn=cross_fn) + x
    h = nn.layer_norm(x, p["norm3"], norm_dtype=policy.norm_dtype)
    h = nn.geglu(h, p["ff"]["net"]["0"]["proj"],
                 approximate=getattr(policy, "gelu_approx", False))
    x = nn.linear(h, p["ff"]["net"]["2"]) + x
    return x


def spatial_transformer(p, x, context, n_heads, policy: Policy, self_attn_fn=None):
    """NHWC spatial transformer (attention.py:309-371, conv proj variant)."""
    b, h, w, c = x.shape
    x_in = x
    x = nn.group_norm(x, p["norm"], eps=1e-6, norm_dtype=policy.norm_dtype)
    x = nn.conv2d(x, p["proj_in"], padding=0)
    inner = x.shape[-1]
    x = x.reshape(b, h * w, inner)
    for d in sorted(p["transformer_blocks"], key=int):
        x = basic_transformer_block(p["transformer_blocks"][d], x, context,
                                    n_heads, policy, self_attn_fn=self_attn_fn)
    x = x.reshape(b, h, w, inner)
    x = nn.conv2d(x, p["proj_out"], padding=0)
    return x + x_in


# ---------------------------------------------------------------------------
# resampling + time embedding
# ---------------------------------------------------------------------------

def init_downsample(key, ch, cout, dtype):
    return {"op": nn.init_conv(key, 3, 3, ch, cout, dtype)}


def downsample(p, x):
    return nn.conv2d(x, p["op"], stride=2, padding=1)


def init_upsample(key, ch, cout, dtype):
    return {"conv": nn.init_conv(key, 3, 3, ch, cout, dtype)}


def upsample(p, x):
    # lossless phase-decomposed fusion (ops/nn.upsample_conv2d): 2.25x fewer
    # MACs than materializing the nearest-2x intermediate, exact in fp32
    return nn.upsample_conv2d(x, p["conv"])


def init_time_embed(key, model_channels, dtype):
    k1, k2 = jax.random.split(key)
    d = model_channels * 4
    return {"0": nn.init_linear(k1, model_channels, d, dtype),
            "2": nn.init_linear(k2, d, d, dtype)}


def time_embed(p, t, model_channels, dtype):
    """timestep_embedding -> Linear -> SiLU -> Linear (openaimodel.py:2628-2633)."""
    emb = nn.timestep_embedding(t, model_channels, dtype=dtype)
    emb = nn.linear(emb, p["0"])
    emb = nn.silu(emb)
    return nn.linear(emb, p["2"])
