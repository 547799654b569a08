"""Swin Transformer backbone (Swin-Large), TPU-native NHWC.

Capability parity with the reference `swin` (lib/model_zoo/swin.py:498-659):
PatchEmbed (4x4 stride-4 conv + LN), 4 BasicLayer stages of W-MSA/SW-MSA
blocks with relative position bias, PatchMerging between stages, per-stage
LayerNorm heads, outputs {res2..res5} at strides 4/8/16/32.

TPU-first: window partition/shift are static reshapes+rolls per (bucketed)
input size; the shifted-window attention mask and the relative-position-bias
gather index are precomputed in NumPy at trace time (they depend only on
static shapes), so the compiled graph is pure matmul/attention work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu import registry
from pfd_tpu.ops import nn
from pfd_tpu.policy import Policy, FP32


@functools.lru_cache(maxsize=64)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position index into the bias table (swin.py:155-166)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (wh*ww, wh*ww)


@functools.lru_cache(maxsize=256)
def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """SW-MSA attention mask, (nW, N, N) additive 0/-100 (swin.py:421-440)."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // window, window, wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x, window):
    """(B, H, W, C) -> (B*nW, window*window, C); H, W multiples of window."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x, window, h, w):
    b = x.shape[0] // ((h // window) * (w // window))
    c = x.shape[-1]
    x = x.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def window_attention(p, x, n_heads, window_hw, policy, shift_mask=None):
    """W-MSA with relative position bias (swin.py:178-210).

    x: (B_, N, C) windows. shift_mask: (nW, N, N) additive or None.
    """
    b_, n, c = x.shape
    head = c // n_heads
    qkv = nn.linear(x, p["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = nn.split_heads(q, n_heads)
    k = nn.split_heads(k, n_heads)
    v = nn.split_heads(v, n_heads)

    idx = _relative_position_index(*window_hw).reshape(-1)
    bias = p["relative_position_bias_table"].astype(policy.softmax_dtype)[idx]
    bias = bias.reshape(n, n, n_heads).transpose(2, 0, 1)[None]  # (1, nH, N, N)
    if shift_mask is not None:
        nw = shift_mask.shape[0]
        m = jnp.asarray(shift_mask, policy.softmax_dtype)
        bias = bias + jnp.tile(m[:, None, :, :], (b_ // nw, 1, 1, 1))
        # tiled over the batch of windows; broadcasting below handles heads
        out = nn.dot_product_attention(q, k, v, scale=head ** -0.5,
                                       softmax_dtype=policy.softmax_dtype,
                                       bias=bias)
    else:
        out = nn.dot_product_attention(q, k, v, scale=head ** -0.5,
                                       softmax_dtype=policy.softmax_dtype,
                                       bias=bias)
    return nn.linear(nn.merge_heads(out), p["proj"])


def swin_block(p, x, n_heads, window, shift, policy):
    """One SwinTransformerBlock on an NHWC map (swin.py:262-310)."""
    b, h, w, c = x.shape
    shortcut = x
    x = nn.layer_norm(x, p["norm1"], norm_dtype=policy.norm_dtype)

    pad_b = (window - h % window) % window
    pad_r = (window - w % window) % window
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r

    mask = None
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_attn_mask(hp, wp, window, shift)

    wins = window_partition(x, window)
    wins = window_attention(p["attn"], wins, n_heads, (window, window), policy,
                            shift_mask=mask)
    x = window_reverse(wins, window, hp, wp)

    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        x = x[:, :h, :w, :]

    x = shortcut + x
    y = nn.layer_norm(x, p["norm2"], norm_dtype=policy.norm_dtype)
    y = nn.linear(y, p["mlp"]["fc1"])
    y = nn.gelu(y)
    y = nn.linear(y, p["mlp"]["fc2"])
    return x + y


def patch_merging(p, x, policy):
    """2x2 patch concat + LN + linear reduction (swin.py:313-351)."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2, :]
    x1 = x[:, 1::2, 0::2, :]
    x2 = x[:, 0::2, 1::2, :]
    x3 = x[:, 1::2, 1::2, :]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = nn.layer_norm(x, p["norm"], norm_dtype=policy.norm_dtype)
    return nn.linear(x, p["reduction"])


@registry.register("swin")
class SwinTransformer:
    def __init__(self, embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                 window_size=7, ape=False, drop_path_rate=0.0, patch_norm=True,
                 patch_size=4, in_chans=3, mlp_ratio=4.0,
                 out_indices=(0, 1, 2, 3), policy: Policy = FP32, **kwargs):
        assert not ape, "absolute position embedding unused by swin_large"
        self.policy = policy
        self.embed_dim = embed_dim
        self.depths = tuple(depths)
        self.num_heads = tuple(num_heads)
        self.window = window_size
        self.patch_size = patch_size
        self.in_chans = in_chans
        self.mlp_ratio = mlp_ratio
        self.patch_norm = patch_norm
        self.out_indices = tuple(out_indices)
        self.num_features = [int(embed_dim * 2 ** i) for i in range(len(depths))]

    def init(self, key):
        dtype = self.policy.param_dtype
        keys = iter(jax.random.split(key, 8 + sum(self.depths) * 6))
        params = {"patch_embed": {
            "proj": nn.init_conv(next(keys), self.patch_size, self.patch_size,
                                 self.in_chans, self.embed_dim, dtype),
        }}
        if self.patch_norm:
            params["patch_embed"]["norm"] = nn.init_norm(self.embed_dim, dtype)

        layers = {}
        for i, depth in enumerate(self.depths):
            dim = self.num_features[i]
            blocks = {}
            for j in range(depth):
                nrel = (2 * self.window - 1) ** 2
                blocks[str(j)] = {
                    "norm1": nn.init_norm(dim, dtype),
                    "attn": {
                        "relative_position_bias_table":
                            jax.random.truncated_normal(next(keys), -2, 2,
                                                        (nrel, self.num_heads[i]),
                                                        jnp.float32).astype(dtype) * 0.02,
                        "qkv": nn.init_linear(next(keys), dim, dim * 3, dtype),
                        "proj": nn.init_linear(next(keys), dim, dim, dtype),
                    },
                    "norm2": nn.init_norm(dim, dtype),
                    "mlp": {
                        "fc1": nn.init_linear(next(keys), dim, int(dim * self.mlp_ratio), dtype),
                        "fc2": nn.init_linear(next(keys), int(dim * self.mlp_ratio), dim, dtype),
                    },
                }
            layer = {"blocks": blocks}
            if i < len(self.depths) - 1:
                layer["downsample"] = {
                    "norm": nn.init_norm(4 * dim, dtype),
                    "reduction": nn.init_linear(next(keys), 4 * dim, 2 * dim, dtype,
                                                bias=False),
                }
            layers[str(i)] = layer
        params["layers"] = layers
        for i in self.out_indices:
            params[f"norm{i}"] = nn.init_norm(self.num_features[i], dtype)
        return params

    def apply(self, params, x):
        """x: (B, H, W, 3) image -> {'res2'..'res5'} NHWC feature maps."""
        pol = self.policy
        x = pol.cast(x)
        b, h, w, _ = x.shape
        ps = self.patch_size
        if h % ps or w % ps:
            x = jnp.pad(x, ((0, 0), (0, (ps - h % ps) % ps), (0, (ps - w % ps) % ps), (0, 0)))
        x = nn.conv2d(x, params["patch_embed"]["proj"], stride=ps, padding=0)
        if self.patch_norm:
            x = nn.layer_norm(x, params["patch_embed"]["norm"], norm_dtype=pol.norm_dtype)

        outs = {}
        for i, depth in enumerate(self.depths):
            layer = params["layers"][str(i)]
            for j in range(depth):
                shift = 0 if j % 2 == 0 else self.window // 2
                x = swin_block(layer["blocks"][str(j)], x, self.num_heads[i],
                               self.window, shift, pol)
            if i in self.out_indices:
                out = nn.layer_norm(x, params[f"norm{i}"], norm_dtype=pol.norm_dtype)
                outs[f"res{i + 2}"] = out
            if "downsample" in layer:
                x = patch_merging(layer["downsample"], x, pol)
        return outs

    # SemanticContextEncoder calls imencoder(x) (seecoder.py:568)
    __call__ = apply
