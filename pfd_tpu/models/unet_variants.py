"""Legacy UNet registry variants: self-attention / no-attention / encoder-only.

Capability parity with the remaining reference `openai_unet_*` family:
- AttentionBlock + QKVAttention(Legacy) self-attention (openaimodel.py:277-409)
- AttentionPool2d (openaimodel.py:30-58)
- `openai_unet_nocontext` (openaimodel.py:1003-1286; SpatialTransformerNoContext
  or AttentionBlock attention)
- `openai_unet_nocontext_noatt` (openaimodel.py:1287-1479)
- `openai_unet_nocontext_noatt_decoderonly` (openaimodel.py:1480-1607)
- `EncoderUNetModel` (openaimodel.py:779-1002; adaptive/attention/spatial pools)

All dead code in the live prompt-free-diffusion config — ported for registry
surface parity and VD-lineage checkpoints.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pfd_tpu import registry
from pfd_tpu.models import blocks
from pfd_tpu.models.unet import build_plan
from pfd_tpu.models.unet_classic import _group_classic
from pfd_tpu.ops import nn
from pfd_tpu.policy import Policy, FP32


# ---------------------------------------------------------------------------
# QKV self-attention primitives
# ---------------------------------------------------------------------------

def qkv_attention_legacy(qkv, n_heads, softmax_dtype=jnp.float32):
    """(B, T, H*3c) tokens, heads-major channel layout (openaimodel.py:346-371):
    per head [q c | k c | v c]."""
    b, t, width = qkv.shape
    ch = width // (3 * n_heads)
    x = qkv.reshape(b, t, n_heads, 3 * ch)
    q, k, v = x[..., :ch], x[..., ch:2 * ch], x[..., 2 * ch:]
    scale = 1 / math.sqrt(math.sqrt(ch))
    out = nn.dot_product_attention(
        (q * scale).transpose(0, 2, 1, 3), (k * scale).transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), scale=1.0, softmax_dtype=softmax_dtype)
    return nn.merge_heads(out)


def qkv_attention_new(qkv, n_heads, softmax_dtype=jnp.float32):
    """(B, T, 3*H*c) tokens, qkv-major layout (openaimodel.py:378-404)."""
    b, t, width = qkv.shape
    ch = width // (3 * n_heads)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = 1 / math.sqrt(math.sqrt(ch))
    out = nn.dot_product_attention(
        nn.split_heads(q * scale, n_heads), nn.split_heads(k * scale, n_heads),
        nn.split_heads(v, n_heads), scale=1.0, softmax_dtype=softmax_dtype)
    return nn.merge_heads(out)


def _conv1d_as_linear(p, x_tokens):
    """kernel-1 conv1d on (B, T, C) tokens (converter stores WIO: (1, I, O))."""
    y = x_tokens @ p["kernel"][0].astype(x_tokens.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x_tokens.dtype)
    return y


def attention_block(p, x, n_heads, policy, new_order=False):
    """AttentionBlock on an NHWC map (openaimodel.py:277-323)."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    t = nn.group_norm(tokens, p["norm"], eps=1e-5, norm_dtype=policy.norm_dtype)
    qkv = _conv1d_as_linear(p["qkv"], t)
    att = (qkv_attention_new if new_order else qkv_attention_legacy)(
        qkv, n_heads, policy.softmax_dtype)
    out = _conv1d_as_linear(p["proj_out"], att)
    return (tokens + out).reshape(b, h, w, c)


def init_attention_block(key, channels, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "norm": nn.init_norm(channels, dtype),
        "qkv": {"kernel": nn.init_linear(k1, channels, 3 * channels, dtype)["kernel"][None],
                "bias": jnp.zeros((3 * channels,), dtype)},
        "proj_out": {"kernel": jnp.zeros((1, channels, channels), dtype),
                     "bias": jnp.zeros((channels,), dtype)},
    }


def attention_pool_2d(p, x, num_heads, policy):
    """CLIP-style attention pooling (openaimodel.py:30-58): mean token prepended,
    positional embedding (C, T+1), QKVAttention(new order), take token 0."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    tokens = jnp.concatenate([tokens.mean(1, keepdims=True), tokens], axis=1)
    pos = p["positional_embedding"].astype(tokens.dtype)  # (C, T+1) raw layout
    tokens = tokens + pos.T[None]
    qkv = _conv1d_as_linear(p["qkv_proj"], tokens)
    att = qkv_attention_new(qkv, num_heads, policy.softmax_dtype)
    out = _conv1d_as_linear(p["c_proj"], att)
    return out[:, 0]


# ---------------------------------------------------------------------------
# no-context UNets (classic layout)
# ---------------------------------------------------------------------------

def _heads_for(ch, num_heads, num_head_channels, use_st, legacy):
    if num_head_channels in (-1, None):
        nh, dh = num_heads, ch // num_heads
    else:
        nh, dh = ch // num_head_channels, num_head_channels
    if legacy:
        dh = ch // nh if use_st else num_head_channels
    return nh, dh


@registry.register("openai_unet_nocontext")
class UNetModelNoContext:
    """Classic UNet with self-attention (SpatialTransformerNoContext when
    use_spatial_transformer else AttentionBlock) — openaimodel.py:1003-1286."""

    def __init__(self, in_channels, model_channels, out_channels,
                 num_res_blocks, attention_resolutions=(), channel_mult=(1, 2, 4, 8),
                 num_heads=-1, num_head_channels=-1,
                 use_spatial_transformer=False, transformer_depth=1,
                 legacy=True, image_size=None, use_checkpoint=False,
                 use_new_attention_order=False, policy: Policy = FP32, **kw):
        self.policy = policy
        self.model_channels = model_channels
        self.use_st = use_spatial_transformer
        self.new_order = use_new_attention_order
        self.num_heads = num_heads
        self.num_head_channels = num_head_channels
        self.legacy = legacy
        self.plan = build_plan(in_channels, model_channels, out_channels,
                               num_res_blocks, tuple(attention_resolutions),
                               tuple(channel_mult),
                               num_heads if num_heads != -1 else None,
                               None,
                               num_head_channels if num_head_channels != -1 else None,
                               with_context=bool(attention_resolutions))
        self.groups = _group_classic(self.plan)

    def _attn_cfg(self, idx):
        ch = self.plan.context_specs[idx].ch
        return _heads_for(ch, self.num_heads, self.num_head_channels,
                          self.use_st, self.legacy), ch

    def init(self, key):
        dtype = self.policy.param_dtype
        emb_ch = self.model_channels * 4
        keys = iter(jax.random.split(key, 160))
        in_groups, mid, out_groups, out_idx = self.groups

        def item(kind, idx):
            spec_d = self.plan.data_specs
            if kind == "conv":
                return nn.init_conv(next(keys), 3, 3, spec_d[idx].cin,
                                    spec_d[idx].cout, dtype)
            if kind == "res":
                return blocks.init_res_block(next(keys), spec_d[idx].cin,
                                             spec_d[idx].cout, emb_ch, dtype)
            if kind == "down":
                return blocks.init_downsample(next(keys), spec_d[idx].cin,
                                              spec_d[idx].cout, dtype)
            if kind == "up":
                return blocks.init_upsample(next(keys), spec_d[idx].cin,
                                            spec_d[idx].cout, dtype)
            if kind == "attn":
                (nh, dh), ch = self._attn_cfg(idx)
                if self.use_st:
                    return blocks.init_spatial_transformer(next(keys), ch, nh,
                                                           dh, None, dtype)
                return init_attention_block(next(keys), ch, dtype)
            raise ValueError(kind)

        params = {"time_embed": blocks.init_time_embed(next(keys),
                                                       self.model_channels, dtype)}
        params["input_blocks"] = {
            str(i): {str(j): item(k, idx) for j, (k, idx) in enumerate(g)}
            for i, g in enumerate(in_groups)}
        params["middle_block"] = {str(j): item(k, idx)
                                  for j, (k, idx) in enumerate(mid)}
        params["output_blocks"] = {
            str(i): {str(j): item(k, idx) for j, (k, idx) in enumerate(g)}
            for i, g in enumerate(out_groups)}
        spec = self.plan.data_specs[out_idx]
        params["out"] = {"0": nn.init_norm(spec.cin, dtype),
                         "2": nn.init_conv(next(keys), 3, 3, spec.cin,
                                           spec.cout, dtype, zero=True)}
        return params

    def _apply_item(self, p, kind, idx, h, emb):
        pol = self.policy
        if kind == "conv":
            return nn.conv2d(h, p, padding=1)
        if kind == "res":
            return blocks.res_block(p, h, emb, pol)
        if kind == "down":
            return blocks.downsample(p, h)
        if kind == "up":
            return blocks.upsample(p, h)
        if kind == "attn":
            (nh, dh), ch = self._attn_cfg(idx)
            if self.use_st:
                return blocks.spatial_transformer(p, h, None, nh, pol)
            return attention_block(p, h, nh, pol, new_order=self.new_order)
        raise ValueError(kind)

    def apply(self, params, x, timesteps):
        pol = self.policy
        emb = blocks.time_embed(params["time_embed"], timesteps,
                                self.model_channels, pol.compute_dtype)
        h = pol.cast(x)
        in_groups, mid, out_groups, out_idx = self.groups
        hs = []
        for i, g in enumerate(in_groups):
            for j, (k, idx) in enumerate(g):
                h = self._apply_item(params["input_blocks"][str(i)][str(j)],
                                     k, idx, h, emb)
            hs.append(h)
        for j, (k, idx) in enumerate(mid):
            h = self._apply_item(params["middle_block"][str(j)], k, idx, h, emb)
        for i, g in enumerate(out_groups):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for j, (k, idx) in enumerate(g):
                h = self._apply_item(params["output_blocks"][str(i)][str(j)],
                                     k, idx, h, emb)
        h = nn.group_norm(h, params["out"]["0"], eps=1e-5,
                          norm_dtype=pol.norm_dtype)
        h = nn.silu(h)
        return nn.conv2d(h, params["out"]["2"], padding=1)


@registry.register("openai_unet_nocontext_noatt")
class UNetModelNoContextNoAtt(UNetModelNoContext):
    """openaimodel.py:1287-1479: no attention anywhere."""

    def __init__(self, in_channels, model_channels, out_channels,
                 num_res_blocks, channel_mult=(1, 2, 4, 8), policy=FP32, **kw):
        super().__init__(in_channels, model_channels, out_channels,
                         num_res_blocks, attention_resolutions=(),
                         channel_mult=channel_mult, num_heads=1,
                         policy=policy, **kw)


@registry.register("openai_unet_nocontext_noatt_decoderonly")
class UNetModelDecoderOnly:
    """openaimodel.py:1480-1607: conv_in + per-level ResBlocks (+Upsample) + out;
    no skips, no attention."""

    def __init__(self, in_channels, out_channels, model_channels,
                 num_res_blocks, channel_mult=(4, 2, 1), policy: Policy = FP32,
                 image_size=None, **kw):
        self.policy = policy
        self.model_channels = model_channels
        if isinstance(num_res_blocks, int):
            num_res_blocks = [num_res_blocks] * len(channel_mult)
        self.num_res_blocks = num_res_blocks
        self.channel_mult = tuple(channel_mult)
        self.in_channels = in_channels
        self.out_channels = out_channels

        # group plan: output_blocks.0 = conv_in; then per level the res blocks,
        # the last one of non-final levels paired with an Upsample
        groups = [[("conv", in_channels, model_channels * channel_mult[0])]]
        ch = model_channels * channel_mult[0]
        for lv, mult in enumerate(channel_mult):
            for i in range(num_res_blocks[lv]):
                g = [("res", ch, model_channels * mult)]
                ch = model_channels * mult
                if lv != len(channel_mult) - 1 and i == num_res_blocks[lv] - 1:
                    g.append(("up", ch, ch))
                groups.append(g)
        self.out_ch_final = ch
        self.groups = groups

    def init(self, key):
        dtype = self.policy.param_dtype
        emb_ch = self.model_channels * 4
        keys = iter(jax.random.split(key, 64))
        params = {"time_embed": blocks.init_time_embed(next(keys),
                                                       self.model_channels, dtype)}
        obs = {}
        for i, g in enumerate(self.groups):
            block = {}
            for j, (kind, cin, cout) in enumerate(g):
                if kind == "conv":
                    block[str(j)] = nn.init_conv(next(keys), 3, 3, cin, cout, dtype)
                elif kind == "res":
                    block[str(j)] = blocks.init_res_block(next(keys), cin, cout,
                                                          emb_ch, dtype)
                else:
                    block[str(j)] = blocks.init_upsample(next(keys), cin, cout, dtype)
            obs[str(i)] = block
        params["output_blocks"] = obs
        params["out"] = {"0": nn.init_norm(self.out_ch_final, dtype),
                         "2": nn.init_conv(next(keys), 3, 3, self.model_channels,
                                           self.out_channels, dtype, zero=True)}
        return params

    def apply(self, params, x, timesteps):
        pol = self.policy
        emb = blocks.time_embed(params["time_embed"], timesteps,
                                self.model_channels, pol.compute_dtype)
        h = pol.cast(x)
        for i, g in enumerate(self.groups):
            for j, (kind, cin, cout) in enumerate(g):
                p = params["output_blocks"][str(i)][str(j)]
                if kind == "conv":
                    h = nn.conv2d(h, p, padding=1)
                elif kind == "res":
                    h = blocks.res_block(p, h, emb, pol)
                else:
                    h = blocks.upsample(p, h)
        h = nn.group_norm(h, params["out"]["0"], eps=1e-5,
                          norm_dtype=pol.norm_dtype)
        h = nn.silu(h)
        return nn.conv2d(h, params["out"]["2"], padding=1)


@registry.register("openai_unet_encoder")
class EncoderUNetModel:
    """Half UNet + pooled head (openaimodel.py:779-1002; reference registers it
    unnamed — exposed here as openai_unet_encoder). Pools: adaptive /
    attention / spatial / spatial_v2. Attention is AttentionBlock-style."""

    def __init__(self, in_channels, model_channels, out_channels,
                 num_res_blocks, attention_resolutions, channel_mult=(1, 2, 4, 8),
                 num_heads=1, num_head_channels=-1, pool="adaptive",
                 image_size=None, use_new_attention_order=False,
                 policy: Policy = FP32, **kw):
        self.policy = policy
        self.model_channels = model_channels
        self.out_channels = out_channels
        self.pool = pool
        self.num_heads = num_heads
        self.num_head_channels = num_head_channels
        self.new_order = use_new_attention_order
        self.image_size = image_size

        groups = [[("conv", in_channels, model_channels)]]
        feature_size = model_channels
        ch, ds = model_channels, 1
        for lv, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                g = [("res", ch, mult * model_channels)]
                ch = mult * model_channels
                if ds in attention_resolutions:
                    g.append(("attn", ch, ch))
                groups.append(g)
                feature_size += ch
            if lv != len(channel_mult) - 1:
                groups.append([("down", ch, ch)])
                ds *= 2
                feature_size += ch
        self.groups = groups
        self.mid_ch = ch
        self.ds = ds
        self._feature_size = feature_size + ch

    def _nh(self, ch):
        return (ch // self.num_head_channels
                if self.num_head_channels != -1 else self.num_heads)

    def init(self, key):
        dtype = self.policy.param_dtype
        emb_ch = self.model_channels * 4
        keys = iter(jax.random.split(key, 160))

        def item(kind, cin, cout):
            if kind == "conv":
                return nn.init_conv(next(keys), 3, 3, cin, cout, dtype)
            if kind == "res":
                return blocks.init_res_block(next(keys), cin, cout, emb_ch, dtype)
            if kind == "down":
                return blocks.init_downsample(next(keys), cin, cout, dtype)
            if kind == "attn":
                return init_attention_block(next(keys), cout, dtype)

        params = {"time_embed": blocks.init_time_embed(next(keys),
                                                       self.model_channels, dtype)}
        params["input_blocks"] = {
            str(i): {str(j): item(*spec) for j, spec in enumerate(g)}
            for i, g in enumerate(self.groups)}
        c = self.mid_ch
        params["middle_block"] = {
            "0": blocks.init_res_block(next(keys), c, c, emb_ch, dtype),
            "1": init_attention_block(next(keys), c, dtype),
            "2": blocks.init_res_block(next(keys), c, c, emb_ch, dtype),
        }
        if self.pool == "adaptive":
            params["out"] = {"0": nn.init_norm(c, dtype),
                             "3": nn.init_conv(next(keys), 1, 1, c,
                                               self.out_channels, dtype, zero=True)}
        elif self.pool == "attention":
            t = (self.image_size // self.ds) ** 2 + 1
            params["out"] = {"0": nn.init_norm(c, dtype), "2": {
                "positional_embedding": jax.random.normal(next(keys), (c, t), dtype) / c ** 0.5,
                "qkv_proj": {"kernel": nn.init_linear(next(keys), c, 3 * c, dtype)["kernel"][None],
                             "bias": jnp.zeros((3 * c,), dtype)},
                "c_proj": {"kernel": nn.init_linear(next(keys), c, self.out_channels, dtype)["kernel"][None],
                           "bias": jnp.zeros((self.out_channels,), dtype)},
            }}
        elif self.pool in ("spatial", "spatial_v2"):
            params["out"] = {"0": nn.init_linear(next(keys), self._feature_size, 2048, dtype)}
            if self.pool == "spatial":
                params["out"]["2"] = nn.init_linear(next(keys), 2048, self.out_channels, dtype)
            else:
                params["out"]["1"] = nn.init_norm(2048, dtype)
                params["out"]["3"] = nn.init_linear(next(keys), 2048, self.out_channels, dtype)
        return params

    def apply(self, params, x, timesteps):
        pol = self.policy
        emb = blocks.time_embed(params["time_embed"], timesteps,
                                self.model_channels, pol.compute_dtype)
        h = pol.cast(x)
        results = []
        for i, g in enumerate(self.groups):
            for j, (kind, cin, cout) in enumerate(g):
                p = params["input_blocks"][str(i)][str(j)]
                if kind == "conv":
                    h = nn.conv2d(h, p, padding=1)
                elif kind == "res":
                    h = blocks.res_block(p, h, emb, pol)
                elif kind == "down":
                    h = blocks.downsample(p, h)
                elif kind == "attn":
                    h = attention_block(p, h, self._nh(cout), pol,
                                        new_order=self.new_order)
            if self.pool.startswith("spatial"):
                results.append(h.mean(axis=(1, 2)))
        mid = params["middle_block"]
        h = blocks.res_block(mid["0"], h, emb, pol)
        h = attention_block(mid["1"], h, self._nh(self.mid_ch), pol,
                            new_order=self.new_order)
        h = blocks.res_block(mid["2"], h, emb, pol)

        out = params["out"]
        if self.pool == "adaptive":
            h = nn.group_norm(h, out["0"], eps=1e-5, norm_dtype=pol.norm_dtype)
            h = nn.silu(h).mean(axis=(1, 2), keepdims=True)
            return nn.conv2d(h, out["3"], padding=0)[:, 0, 0, :]
        if self.pool == "attention":
            h = nn.group_norm(h, out["0"], eps=1e-5, norm_dtype=pol.norm_dtype)
            return attention_pool_2d(out["2"], nn.silu(h),
                                     self.mid_ch // self.num_head_channels, pol)
        results.append(h.mean(axis=(1, 2)))
        h = jnp.concatenate(results, axis=-1)
        h = nn.linear(h, out["0"])
        if self.pool == "spatial":
            return nn.linear(jax.nn.relu(h), out["2"])
        hh = nn.group_norm(h[:, None, None, :], out["1"], eps=1e-5,
                           norm_dtype=pol.norm_dtype)[:, 0, 0, :]
        return nn.linear(nn.silu(hh), out["3"])


# ---------------------------------------------------------------------------
# classic 0d (vector) UNets — openaimodel.py:2143-2274 / 2334-2467
# ---------------------------------------------------------------------------

def _fc_block_nhwc(p, x, emb, policy):
    """FCBlock (openaimodel.py:2084-2142): ResBlock with 1x1 convs, NHWC."""
    h = nn.group_norm(x, p["in_layers"]["0"], eps=1e-5,
                      norm_dtype=policy.norm_dtype)
    h = nn.silu(h)
    h = nn.conv2d(h, p["in_layers"]["2"], padding=0)
    emb_out = nn.linear(nn.silu(emb), p["emb_layers"]["1"])
    h = h + emb_out[:, None, None, :].astype(h.dtype)
    h = nn.group_norm(h, p["out_layers"]["0"], eps=1e-5,
                      norm_dtype=policy.norm_dtype)
    h = nn.silu(h)
    h = nn.conv2d(h, p["out_layers"]["3"], padding=0)
    if "skip_connection" in p:
        x = nn.conv2d(x, p["skip_connection"], padding=0)
    return x + h


def _init_fc_block_nhwc(key, cin, cout, emb_ch, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "in_layers": {"0": nn.init_norm(cin, dtype),
                      "2": nn.init_conv(ks[0], 1, 1, cin, cout, dtype)},
        "emb_layers": {"1": nn.init_linear(ks[1], emb_ch, cout, dtype)},
        "out_layers": {"0": nn.init_norm(cout, dtype),
                       "3": nn.init_conv(ks[2], 1, 1, cout, cout, dtype, zero=True)},
    }
    if cin != cout:
        p["skip_connection"] = nn.init_conv(ks[3], 1, 1, cin, cout, dtype)
    return p


class _VDStyle0DBase:
    """Shared walker for openai_unet_0d / openai_unet_0dmd (classic grouping:
    input_blocks / middle_block / output_blocks / out)."""

    def _build_groups(self, num_noattn_blocks, channel_mult, second_dim,
                      with_attn):
        groups_in = [[("stem", None, None)]]
        cur_s = second_dim[0]
        cur_c = self.model_channels
        chans = [(cur_c, cur_s)]
        for lv, mult in enumerate(channel_mult):
            s = second_dim[lv]
            for _ in range(num_noattn_blocks[lv]):
                g = [("fc", (cur_c, cur_s), (mult * self.model_channels, s))]
                cur_c, cur_s = mult * self.model_channels, s
                if with_attn[lv]:
                    g.append(("attn", cur_c, cur_c))
                groups_in.append(g)
                chans.append((cur_c, cur_s))
            if lv != len(channel_mult) - 1:
                groups_in.append([("resample", (cur_c, cur_s), (cur_c, cur_s))])
                chans.append((cur_c, cur_s))
        mid = [("fc", (cur_c, cur_s), (cur_c, cur_s)), ("attn", cur_c, cur_c),
               ("fc", (cur_c, cur_s), (cur_c, cur_s))]
        groups_out = []
        for lv, mult in list(enumerate(channel_mult))[::-1]:
            s = second_dim[lv]
            for bi in range(num_noattn_blocks[lv] + 1):
                ec, es = chans.pop()
                g = [("fc", (cur_c + ec, cur_s), (mult * self.model_channels, s))]
                cur_c, cur_s = mult * self.model_channels, s
                if with_attn[lv]:
                    g.append(("attn", cur_c, cur_c))
                if lv != 0 and bi == num_noattn_blocks[lv]:
                    g.append(("resample", (cur_c, cur_s), (cur_c, cur_s)))
                groups_out.append(g)
        self.groups = (groups_in, mid, groups_out)
        self.final = (cur_c, cur_s)

    def apply(self, params, x, timesteps, context, *, self_attn_fn=None):
        pol = self.policy
        emb = pol.cast(blocks.time_embed(params["time_embed"], timesteps,
                                         self.model_channels, pol.compute_dtype))
        context = pol.cast(context) if context is not None else None
        groups_in, mid, groups_out = self.groups

        h = self._stem_in(pol.cast(x), params)

        def run_group(g, p, h):
            for j, (kind, cin, cout) in enumerate(g):
                q = p[str(j)]
                if kind == "stem":
                    continue
                if kind == "fc":
                    h = self._fc(q, h, emb, cin, cout)
                elif kind == "attn":
                    h = blocks.spatial_transformer(q, h, context,
                                                   self.num_heads, pol,
                                                   self_attn_fn=self_attn_fn)
                elif kind == "resample":
                    h = self._resample(q, h)
            return h

        hs = []
        for i, g in enumerate(groups_in):
            if g[0][0] == "stem":
                pass  # applied in _stem_in via input_blocks.0
            else:
                h = run_group(g, params["input_blocks"][str(i)], h)
            hs.append(h)
        h = run_group(mid, params["middle_block"], h)
        for i, g in enumerate(groups_out):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = run_group(g, params["output_blocks"][str(i)], h)
        return self._out(params["out"], h)


@registry.register("openai_unet_0d")
class UNetModel0DClassic(_VDStyle0DBase):
    """openaimodel.py:2143-2274: FC UNet over (B, C) vectors; state kept as
    (B, 1, 1, C) maps (all ops are 1x1)."""

    def __init__(self, input_channels, model_channels, output_channels,
                 context_dim=768, num_noattn_blocks=(2, 2, 2, 2),
                 channel_mult=(1, 2, 4, 8), with_attn=(True, True, True, False),
                 num_heads=8, use_checkpoint=True, policy: Policy = FP32, **kw):
        self.policy = policy
        self.model_channels = model_channels
        self.input_channels = input_channels
        self.output_channels = output_channels
        self.context_dim = context_dim
        self.num_heads = num_heads
        self._build_groups(num_noattn_blocks, tuple(channel_mult),
                           (1,) * len(channel_mult), list(with_attn))

    def init(self, key):
        dtype = self.policy.param_dtype
        emb_ch = self.model_channels * 4
        keys = iter(jax.random.split(key, 128))
        groups_in, mid, groups_out = self.groups

        def item(kind, cin, cout):
            if kind == "stem":
                return nn.init_conv(next(keys), 1, 1, self.input_channels,
                                    self.model_channels, dtype)
            if kind == "fc":
                return _init_fc_block_nhwc(next(keys), cin[0], cout[0], emb_ch, dtype)
            if kind == "attn":
                return blocks.init_spatial_transformer(
                    next(keys), cin, self.num_heads, cin // self.num_heads,
                    self.context_dim, dtype)
            if kind == "resample":
                # input side: Downsample 3x3 conv ('op'); output side: 1x1 conv
                return None  # filled below per side

        params = {"time_embed": blocks.init_time_embed(next(keys),
                                                       self.model_channels, dtype)}
        ib = {}
        for i, g in enumerate(groups_in):
            block = {}
            for j, (kind, cin, cout) in enumerate(g):
                if kind == "resample":
                    block[str(j)] = blocks.init_downsample(next(keys), cin[0],
                                                           cout[0], dtype)
                else:
                    block[str(j)] = item(kind, cin, cout)
            ib[str(i)] = block
        params["input_blocks"] = ib
        params["middle_block"] = {str(j): item(k, cin, cout)
                                  for j, (k, cin, cout) in enumerate(mid)}
        ob = {}
        for i, g in enumerate(groups_out):
            block = {}
            for j, (kind, cin, cout) in enumerate(g):
                if kind == "resample":
                    block[str(j)] = nn.init_conv(next(keys), 1, 1, cin[0],
                                                 cout[0], dtype)
                else:
                    block[str(j)] = item(kind, cin, cout)
            ob[str(i)] = block
        params["output_blocks"] = ob
        params["out"] = {"0": nn.init_norm(self.final[0], dtype),
                         "2": nn.init_conv(next(keys), 1, 1, self.model_channels,
                                           self.output_channels, dtype, zero=True)}
        self._out_side = None
        return params

    def _stem_in(self, x, params):
        if x.ndim == 2:
            x = x[:, None, None, :]
        return nn.conv2d(x, params["input_blocks"]["0"]["0"], padding=0)

    def _fc(self, p, h, emb, cin, cout):
        return _fc_block_nhwc(p, h, emb, self.policy)

    def _resample(self, p, h):
        if "op" in p:  # input-side Downsample (3x3 stride-2 on 1x1 maps)
            return blocks.downsample(p, h)
        return nn.conv2d(h, p, padding=0)  # output-side 1x1 conv

    def _out(self, p, h):
        h = nn.group_norm(h, p["0"], eps=1e-5, norm_dtype=self.policy.norm_dtype)
        h = nn.silu(h)
        return nn.conv2d(h, p["2"], padding=0)


@registry.register("openai_unet_0dmd")
class UNetModel0DMD(_VDStyle0DBase):
    """openaimodel.py:2334-2467: multidim FC UNet over (B, C, s, 1) states;
    kept as (B, s, 1, C) NHWC with C-major flatten for the FC blocks
    (the Linear_MultiDim/FCBlock_MultiDim layout of models/unet_0d.py)."""

    def __init__(self, input_channels, model_channels, output_channels,
                 context_dim=768, num_noattn_blocks=(2, 2, 2, 2),
                 channel_mult=(1, 2, 4, 8), second_dim=(4, 4, 4, 4),
                 with_attn=(True, True, True, False), num_heads=8,
                 use_checkpoint=True, policy: Policy = FP32, **kw):
        self.policy = policy
        self.model_channels = model_channels
        self.input_channels = input_channels
        self.output_channels = output_channels
        self.context_dim = context_dim
        self.num_heads = num_heads
        self._build_groups(num_noattn_blocks, tuple(channel_mult),
                           tuple(second_dim), list(with_attn))
        # stem second-dim: the s of the first fc group's input
        self._stem_s = next(g[0][1][1] for g in self.groups[0][1:]
                            if g[0][0] == "fc")

    @staticmethod
    def _to_vec(h):
        b, s, _, c = h.shape
        return h[:, :, 0, :].transpose(0, 2, 1).reshape(b, c * s)

    @staticmethod
    def _to_seq(v, c, s):
        return v.reshape(-1, c, s).transpose(0, 2, 1)[:, :, None, :]

    def init(self, key):
        from pfd_tpu.models.unet_0d import _init_fc_block

        dtype = self.policy.param_dtype
        emb_ch = self.model_channels * 4
        keys = iter(jax.random.split(key, 128))
        groups_in, mid, groups_out = self.groups

        def item(kind, cin, cout):
            if kind == "stem":
                return nn.init_linear(next(keys), self.input_channels,
                                      self.model_channels * self._stem_s, dtype)
            if kind == "fc":
                return _init_fc_block(next(keys), cin[0] * cin[1],
                                      cout[0] * cout[1], emb_ch, dtype)
            if kind == "attn":
                return blocks.init_spatial_transformer(
                    next(keys), cin, self.num_heads, cin // self.num_heads,
                    self.context_dim, dtype)
            if kind == "resample":
                return nn.init_linear(next(keys), cin[0] * cin[1],
                                      cout[0] * cout[1], dtype)

        params = {"time_embed": blocks.init_time_embed(next(keys),
                                                       self.model_channels, dtype)}
        params["input_blocks"] = {
            str(i): {str(j): item(k, cin, cout) for j, (k, cin, cout) in enumerate(g)}
            for i, g in enumerate(groups_in)}
        params["middle_block"] = {str(j): item(k, cin, cout)
                                  for j, (k, cin, cout) in enumerate(mid)}
        params["output_blocks"] = {
            str(i): {str(j): item(k, cin, cout) for j, (k, cin, cout) in enumerate(g)}
            for i, g in enumerate(groups_out)}
        params["out"] = {"0": nn.init_norm(self.final[0], dtype),
                         "2": nn.init_linear(next(keys),
                                             self.final[0] * self.final[1],
                                             self.output_channels, dtype,
                                             zero=True)}
        return params

    def _stem_in(self, x, params):
        if x.ndim == 4:
            x = x[:, 0, 0, :]
        v = nn.linear(x, params["input_blocks"]["0"]["0"])
        return self._to_seq(v, self.model_channels, self._stem_s)

    def _fc(self, p, h, emb, cin, cout):
        from pfd_tpu.models.unet_0d import _fc_block

        v = self._to_vec(h)
        v = _fc_block(p, v, emb, self.policy)
        return self._to_seq(v, cout[0], cout[1])

    def _resample(self, p, h):
        b, s, _, c = h.shape
        v = nn.linear(self._to_vec(h), p)
        return self._to_seq(v, c, s)

    def _out(self, p, h):
        h = nn.group_norm(h, p["0"], eps=1e-5, norm_dtype=self.policy.norm_dtype)
        h = nn.silu(h)
        return nn.linear(self._to_vec(h), p["2"])


# ---------------------------------------------------------------------------
# Versatile-Diffusion dual-stream UNet — openaimodel.py:2468-2574
# ---------------------------------------------------------------------------

@registry.register("openai_unet_vd")
class UNetModelVD:
    """Two parallel UNets (image: openai_unet_2d; text: openai_unet_0dmd)
    walked in lockstep; per block the data layer comes from the x-modality
    stream and the attention layer from the context-modality stream
    (mixed_run, openaimodel.py:2508-2525). One shared time_embed (the image
    one; openaimodel.py:2477-2479). forward_dc blends two contexts per
    attention block (openaimodel.py:2527-2567)."""

    def __init__(self, unet_image_cfg, unet_text_cfg, policy: Policy = FP32,
                 **kw):
        self.policy = policy
        self.unet_image = registry.get(unet_image_cfg["type"])(
            **unet_image_cfg.get("args", {}), policy=policy)
        self.unet_text = registry.get(unet_text_cfg["type"])(
            **unet_text_cfg.get("args", {}), policy=policy)
        self.model_channels = self.unet_image.model_channels

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        pi = self.unet_image.init(k1)
        pt = self.unet_text.init(k2)
        te = pi.pop("time_embed")
        pt.pop("time_embed")
        return {"time_embed": te, "unet_image": pi, "unet_text": pt}

    def _paired_groups(self):
        gi_in, gi_mid, gi_out, out_idx = self.unet_image.groups
        gt_in, gt_mid, gt_out = self.unet_text.groups
        return (list(zip(gi_in, gt_in)), list(zip([gi_mid], [gt_mid])),
                list(zip(gi_out, gt_out)), out_idx)

    def _run_pair(self, params, gi, gt, block_key, i, h, emb, context, xtype,
                  ctype, context2=None, mixed_ratio=None):
        img, txt = self.unet_image, self.unet_text
        pi = params["unet_image"][block_key][str(i)] if block_key != "middle_block" \
            else params["unet_image"]["middle_block"]
        pt = params["unet_text"][block_key][str(i)] if block_key != "middle_block" \
            else params["unet_text"]["middle_block"]
        for j, ((ki, *si), (kt, *st)) in enumerate(zip(gi, gt)):
            if ki == "attn":
                if mixed_ratio is not None:
                    p0 = pi[str(j)] if ctype == "vision" else pt[str(j)]
                    p1 = pi[str(j)] if context2[1] == "vision" else pt[str(j)]
                    nh = img.plan.context_specs[si[0]].n_heads
                    h0 = blocks.spatial_transformer(p0, h, context, nh,
                                                    self.policy) - h
                    h1 = blocks.spatial_transformer(p1, h, context2[0], nh,
                                                    self.policy) - h
                    h = h0 * mixed_ratio + h1 * (1 - mixed_ratio) + h
                else:
                    p = pi[str(j)] if ctype == "vision" else pt[str(j)]
                    nh = img.plan.context_specs[si[0]].n_heads
                    h = blocks.spatial_transformer(p, h, context, nh, self.policy)
            elif xtype == "image":
                h = img._apply_item(pi[str(j)], ki, si[0], h, emb, None, None)
            else:
                if kt == "stem":
                    h = txt._stem_in(h, {"input_blocks": {"0": {"0": pt[str(j)]}}})
                elif kt == "fc":
                    h = txt._fc(pt[str(j)], h, emb, st[0], st[1])
                else:
                    h = txt._resample(pt[str(j)], h)
        return h

    def apply(self, params, x, timesteps, context, *, xtype="image",
              ctype="prompt", context2=None, mixed_ratio=None):
        """context2/mixed_ratio implement forward_dc (dual-context blend)."""
        pol = self.policy
        emb = pol.cast(blocks.time_embed(params["time_embed"], timesteps,
                                         self.model_channels, pol.compute_dtype))
        context = pol.cast(context)
        in_pairs, mid_pairs, out_pairs, out_idx = self._paired_groups()

        if xtype == "image":
            h = pol.cast(x)
        else:
            h = pol.cast(x)
            if h.ndim == 4:
                h = h[:, 0, 0, :]

        hs = []
        for i, (gi, gt) in enumerate(in_pairs):
            h = self._run_pair(params, gi, gt, "input_blocks", i, h, emb,
                               context, xtype, ctype, context2, mixed_ratio)
            hs.append(h)
        gi_mid, gt_mid = mid_pairs[0]
        h = self._run_pair(params, gi_mid, gt_mid, "middle_block", 0, h, emb,
                           context, xtype, ctype, context2, mixed_ratio)
        for i, (gi, gt) in enumerate(out_pairs):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = self._run_pair(params, gi, gt, "output_blocks", i, h, emb,
                               context, xtype, ctype, context2, mixed_ratio)
        if xtype == "image":
            p = params["unet_image"]["out"]
            h = nn.group_norm(h, p["0"], eps=1e-5, norm_dtype=pol.norm_dtype)
            h = nn.silu(h)
            return nn.conv2d(h, p["2"], padding=1)
        return self.unet_text._out(params["unet_text"]["out"], h)
