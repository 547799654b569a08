"""SeeCoder — Semantic Context Encoder (the CLIP-text replacement).

Capability parity with the reference `seecoder` (lib/model_zoo/seecoder.py):
Swin backbone -> {res3,res4,res5} -> Decoder (input projections + stacked
transformer over the concatenated multi-level sequence + lateral convs) ->
QueryTransformer (4 global + 144 local learned queries, 9 layers cycling over
3 feature levels) -> (B, 148, 768) context tokens.

Quirk preserved deliberately — the reference Decoder feeds (B, S, C) into
nn.MultiheadAttention, which expects (S, B, E) (seecoder.py:83). At the only
live batch size (B=1) each "sequence" has length 1, so softmax(QK^T) == 1 and
the layer degenerates to x + out_proj(v_proj(x)) — a per-token linear — with
q/k projections dead. The released checkpoints were trained with exactly this
behavior, so we implement that per-token form (for every batch size, which
also avoids the reference's cross-image coupling at B>1 and removes an O(S^2)
attention from the hot path).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu import registry
from pfd_tpu.ops import nn
from pfd_tpu.policy import Policy, FP32


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _decoder_layer(p, x, policy):
    """Reference DecoderLayer (seecoder.py:60-105) under live B=1 semantics:
    self-attention degenerates to out_proj(v_proj(x)) — see module docstring."""
    e = x.shape[-1]
    w_v = p["self_attn"]["in_proj"]["kernel"][:, 2 * e:].astype(x.dtype)
    b_v = p["self_attn"]["in_proj"]["bias"][2 * e:].astype(x.dtype)
    h1 = nn.linear(x @ w_v + b_v, p["self_attn"]["out_proj"])
    x = nn.layer_norm(x + h1, p["norm1"], norm_dtype=policy.norm_dtype)
    h2 = nn.linear(jax.nn.relu(nn.linear(x, p["linear1"])), p["linear2"])
    return nn.layer_norm(x + h2, p["norm2"], norm_dtype=policy.norm_dtype)


def _init_decoder_layer(key, dim, ff, dtype):
    ks = jax.random.split(key, 4)
    return {
        "self_attn": {
            "in_proj": {"kernel": nn.init_linear(ks[0], dim, 3 * dim, dtype)["kernel"],
                        "bias": jnp.zeros((3 * dim,), dtype)},
            "out_proj": nn.init_linear(ks[1], dim, dim, dtype),
        },
        "norm1": nn.init_norm(dim, dtype),
        "linear1": nn.init_linear(ks[2], dim, ff, dtype),
        "linear2": nn.init_linear(ks[3], ff, dim, dtype),
        "norm2": nn.init_norm(dim, dtype),
    }


@registry.register("seecoder_decoder")
class SeecoderDecoder:
    def __init__(self, inchannels, trans_input_tags, trans_num_layers, trans_dim,
                 trans_nheads, trans_dropout, trans_feedforward_dim,
                 policy: Policy = FP32):
        self.policy = policy
        self.inchannels = dict(inchannels)
        self.trans_tags = sorted(t for t in inchannels if t in trans_input_tags)
        self.fpn_tags = sorted(t for t in inchannels if t not in trans_input_tags)
        self.all_tags = sorted(inchannels)
        assert self.trans_tags
        self.trans_dim = trans_dim
        self.trans_nheads = trans_nheads
        self.num_layers = trans_num_layers
        self.ff = trans_feedforward_dim

    def init(self, key):
        dtype = self.policy.param_dtype
        keys = iter(jax.random.split(key, 64))
        p = {"inproj_layers": {}, "lateral_layers": {}, "output_layers": {}}
        for tag in self.trans_tags:
            p["inproj_layers"][tag] = {
                "0": nn.init_conv(next(keys), 1, 1, self.inchannels[tag],
                                  self.trans_dim, dtype),
                "1": nn.init_norm(self.trans_dim, dtype),
            }
        p["transformer"] = {"layers": {
            str(i): _init_decoder_layer(next(keys), self.trans_dim, self.ff, dtype)
            for i in range(self.num_layers)
        }}
        p["level_embed"] = jax.random.normal(
            next(keys), (len(self.trans_tags), self.trans_dim), jnp.float32).astype(dtype)
        for tag in self.all_tags:
            p["lateral_layers"][tag] = {
                "kernel": nn.init_conv(next(keys), 1, 1, self.inchannels[tag],
                                       self.trans_dim, dtype)["kernel"],
                "norm": nn.init_norm(self.trans_dim, dtype),
            }
        for tag in self.fpn_tags:
            p["output_layers"][tag] = {
                "kernel": nn.init_conv(next(keys), 3, 3, self.trans_dim,
                                       self.trans_dim, dtype)["kernel"],
                "norm": nn.init_norm(self.trans_dim, dtype),
            }
        return p

    def apply(self, params, features):
        """features: {tag: NHWC}. Returns {tag: NHWC} at trans_dim channels."""
        pol = self.policy
        seqs, shapes = [], {}
        for idx, tag in enumerate(self.trans_tags[::-1]):
            xi = features[tag]
            xi = nn.conv2d(pol.cast(xi), params["inproj_layers"][tag]["0"], padding=0)
            xi = nn.group_norm(xi, params["inproj_layers"][tag]["1"], groups=32,
                               eps=1e-5, norm_dtype=pol.norm_dtype)
            b, h, w, c = xi.shape
            shapes[tag] = (h, w)
            xi = xi.reshape(b, h * w, c) + params["level_embed"][idx].astype(xi.dtype)
            seqs.append(xi)
        lengths = [s.shape[1] for s in seqs]
        x = jnp.concatenate(seqs, axis=1)
        for i in range(self.num_layers):
            x = _decoder_layer(params["transformer"]["layers"][str(i)], x, pol)
        split_at = np.cumsum(lengths)[:-1]
        ys = jnp.split(x, split_at, axis=1)

        out = {}
        for idx, tag in enumerate(self.trans_tags[::-1]):
            h, w = shapes[tag]
            out[tag] = ys[idx].reshape(b, h, w, self.trans_dim)

        tag_save = None
        for tag in self.all_tags[::-1]:
            lat = params["lateral_layers"][tag]
            lx = nn.conv2d(pol.cast(features[tag]), {"kernel": lat["kernel"]}, padding=0)
            lx = nn.group_norm(lx, lat["norm"], groups=32, eps=1e-5,
                               norm_dtype=pol.norm_dtype)
            if tag in self.trans_tags:
                out[tag] = out[tag] + lx
                tag_save = tag
            else:
                oc = params["output_layers"][tag]
                prev = nn.conv2d(out[tag_save], {"kernel": oc["kernel"]}, padding=1)
                prev = nn.group_norm(prev, oc["norm"], groups=32, eps=1e-5,
                                     norm_dtype=pol.norm_dtype)
                prev = jax.nn.relu(prev)
                prev = jax.image.resize(prev, lx.shape, method="bilinear")
                out[tag] = lx + prev
        return out


# ---------------------------------------------------------------------------
# PPE_MLP (position-aware PE, SeeCoder-PA)
# ---------------------------------------------------------------------------

def ppe_mlp(params, h, w, policy, freq_num=20, jitter_rng=None):
    """Sin/cos grid PE through a 3-layer SiLU MLP (seecoder.py:262-311).
    ``jitter_rng`` enables the train-time ±0.5 grid perturbation
    (seecoder.py:292-295); inference uses the centered grid. Returns (1, h*w, C)."""
    minlen = min(h, w)
    twopi = 2 * math.pi
    dim_t = (minlen / 2) ** np.linspace(0, 1, freq_num)
    if jitter_rng is not None:
        ph, pw = jax.random.uniform(jitter_rng, (2,), minval=-0.5, maxval=0.5)
        hs = (jnp.arange(h) + 0.5 - h / 2 + ph) / minlen * twopi
        ws = (jnp.arange(w) + 0.5 - w / 2 + pw) / minlen * twopi
        h_embed, w_embed = jnp.meshgrid(hs, ws, indexing="ij")
        pos_h = h_embed[:, :, None] * dim_t
        pos_w = w_embed[:, :, None] * dim_t
        pos = jnp.concatenate([jnp.sin(pos_h), jnp.cos(pos_h),
                               jnp.sin(pos_w), jnp.cos(pos_w)], axis=-1)
    else:
        hs = (np.arange(h) + 0.5 - h / 2) / minlen * twopi
        ws = (np.arange(w) + 0.5 - w / 2) / minlen * twopi
        h_embed, w_embed = np.meshgrid(hs, ws, indexing="ij")
        pos_h = h_embed[:, :, None] * dim_t
        pos_w = w_embed[:, :, None] * dim_t
        pos = jnp.asarray(np.concatenate(
            [np.sin(pos_h), np.cos(pos_h), np.sin(pos_w), np.cos(pos_w)],
            axis=-1).astype(np.float32))
    x = policy.cast(pos)
    mlp = params["mlp"]
    n = max(int(k) for k in mlp) + 1
    for i in range(0, n, 2):
        x = nn.linear(x, mlp[str(i)])
        if i != n - 1:
            x = nn.silu(x)
    return x.reshape(1, h * w, -1)


def init_ppe_mlp(key, out_channel=768, freq_num=20, mlp_layer=3, dtype=jnp.float32):
    keys = jax.random.split(key, mlp_layer)
    p = {"mlp": {}}
    cin = freq_num * 4
    for i in range(mlp_layer):
        zero = i == mlp_layer - 1
        p["mlp"][str(2 * i)] = nn.init_linear(keys[i], cin, out_channel, dtype, zero=zero)
        cin = out_channel
    return p


# ---------------------------------------------------------------------------
# query transformer
# ---------------------------------------------------------------------------

def _init_qt_attn(key, dim, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "in_proj": {"kernel": nn.init_linear(k1, dim, 3 * dim, dtype)["kernel"],
                    "bias": jnp.zeros((3 * dim,), dtype)},
        "out_proj": nn.init_linear(k2, dim, dim, dtype),
    }


def _qt_mha(p, q_in, k_in, v_in, n_heads, policy):
    """torch MHA with distinct q/k/v inputs (pos-embed added to q/k only)."""
    e = q_in.shape[-1]
    w = p["in_proj"]["kernel"].astype(q_in.dtype)
    b = p["in_proj"]["bias"].astype(q_in.dtype)
    q = nn.split_heads(q_in @ w[:, :e] + b[:e], n_heads)
    k = nn.split_heads(k_in @ w[:, e:2 * e] + b[e:2 * e], n_heads)
    v = nn.split_heads(v_in @ w[:, 2 * e:] + b[2 * e:], n_heads)
    out = nn.dot_product_attention(q, k, v, softmax_dtype=policy.softmax_dtype)
    return nn.linear(nn.merge_heads(out), p["out_proj"])


@registry.register("seecoder_query_transformer")
class QueryTransformer:
    def __init__(self, in_channels, hidden_dim, num_queries=(4, 144), nheads=8,
                 num_layers=9, feedforward_dim=2048, pre_norm=False,
                 num_feature_levels=3, enforce_input_project=False,
                 with_fea2d_pos=False, policy: Policy = FP32):
        assert not pre_norm, "live config is post-norm (seecoder.yaml:53)"
        assert in_channels == hidden_dim and not enforce_input_project
        self.policy = policy
        self.hidden_dim = hidden_dim
        self.num_queries = tuple(num_queries)
        self.nheads = nheads
        self.num_layers = num_layers
        self.ff = feedforward_dim
        self.num_feature_levels = num_feature_levels
        self.with_fea2d_pos = with_fea2d_pos

    def init(self, key):
        dtype = self.policy.param_dtype
        keys = iter(jax.random.split(key, 8 + self.num_layers * 4))
        d = self.hidden_dim
        nq = sum(self.num_queries)
        p = {
            "init_query": {"weight": jax.random.normal(next(keys), (nq, d), jnp.float32).astype(dtype)},
            "query_pos_embedding": {"weight": jax.random.normal(next(keys), (nq, d), jnp.float32).astype(dtype)},
            "level_embed": {"weight": jax.random.normal(next(keys), (self.num_feature_levels, d), jnp.float32).astype(dtype)},
            "transformer_selfatt_layers": {},
            "transformer_crossatt_layers": {},
            "transformer_feedforward_layers": {},
        }
        if self.with_fea2d_pos:
            p["pe_layer"] = init_ppe_mlp(next(keys), d, dtype=dtype)
        for i in range(self.num_layers):
            p["transformer_selfatt_layers"][str(i)] = {
                "self_attn": _init_qt_attn(next(keys), d, dtype),
                "norm": nn.init_norm(d, dtype),
            }
            p["transformer_crossatt_layers"][str(i)] = {
                "multihead_attn": _init_qt_attn(next(keys), d, dtype),
                "norm": nn.init_norm(d, dtype),
            }
            p["transformer_feedforward_layers"][str(i)] = {
                "linear1": nn.init_linear(next(keys), d, self.ff, dtype),
                "linear2": nn.init_linear(next(keys), self.ff, d, dtype),
                "norm": nn.init_norm(d, dtype),
            }
        return p

    def apply(self, params, feature_list):
        """feature_list: [res3, res4, res5] NHWC maps at hidden_dim channels.
        Returns (B, num_gq+num_lq, hidden_dim) (seecoder.py:500-550)."""
        pol = self.policy
        assert len(feature_list) == self.num_feature_levels
        fea2d, fea2d_pos = [], []
        for i, f in enumerate(feature_list):
            b, h, w, c = f.shape
            if self.with_fea2d_pos:
                pi = ppe_mlp(params["pe_layer"], h, w, pol).astype(f.dtype)
            else:
                pi = None
            xi = pol.cast(f).reshape(b, h * w, c) \
                + params["level_embed"]["weight"][i].astype(f.dtype)
            fea2d.append(xi)
            fea2d_pos.append(pi)

        b = fea2d[0].shape[0]
        num_gq, num_lq = self.num_queries
        iq = pol.cast(params["init_query"]["weight"])[None].repeat(b, axis=0)
        qp = pol.cast(params["query_pos_embedding"]["weight"])[None].repeat(b, axis=0)
        gquery, lquery = iq[:, :num_gq], iq[:, num_gq:]
        gq_pos, lq_pos = qp[:, :num_gq], qp[:, num_gq:]

        for i in range(self.num_layers):
            lvl = i % self.num_feature_levels
            ca = params["transformer_crossatt_layers"][str(i)]
            kv = fea2d[lvl]
            k_in = kv if fea2d_pos[lvl] is None else kv + fea2d_pos[lvl]
            h1 = _qt_mha(ca["multihead_attn"], lquery + lq_pos, k_in, kv,
                         self.nheads, pol)
            lquery = nn.layer_norm(lquery + h1, ca["norm"], norm_dtype=pol.norm_dtype)

            sa = params["transformer_selfatt_layers"][str(i)]
            qkv = jnp.concatenate([gquery, lquery], axis=1)
            pos = jnp.concatenate([gq_pos, lq_pos], axis=1)
            h1 = _qt_mha(sa["self_attn"], qkv + pos, qkv + pos, qkv, self.nheads, pol)
            qout = nn.layer_norm(qkv + h1, sa["norm"], norm_dtype=pol.norm_dtype)

            ffp = params["transformer_feedforward_layers"][str(i)]
            h1 = nn.linear(jax.nn.relu(nn.linear(qout, ffp["linear1"])), ffp["linear2"])
            qout = nn.layer_norm(qout + h1, ffp["norm"], norm_dtype=pol.norm_dtype)

            gquery, lquery = qout[:, :num_gq], qout[:, num_gq:]

        return jnp.concatenate([gquery, lquery], axis=1)


# ---------------------------------------------------------------------------
# main structure
# ---------------------------------------------------------------------------

@registry.register("seecoder")
class SemanticContextEncoder:
    def __init__(self, imencoder_cfg, imdecoder_cfg, qtransformer_cfg,
                 with_ppe=False, policy: Policy = FP32):
        self.policy = policy
        self.imencoder = registry.get(imencoder_cfg["type"])(
            **imencoder_cfg.get("args", {}), policy=policy)
        self.imdecoder = registry.get(imdecoder_cfg["type"])(
            **imdecoder_cfg.get("args", {}), policy=policy)
        self.qtransformer = registry.get(qtransformer_cfg["type"])(
            **qtransformer_cfg.get("args", {}), policy=policy)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "imencoder": self.imencoder.init(k1),
            "imdecoder": self.imdecoder.init(k2),
            "qtransformer": self.qtransformer.init(k3),
        }

    def encode(self, params, x):
        """x: (B, H, W, 3) in [0,1] -> (B, 148, 768) context tokens."""
        fea = self.imencoder.apply(params["imencoder"], x)
        hs = {t: fea[t] for t in ("res3", "res4", "res5")}
        hs = self.imdecoder.apply(params["imdecoder"], hs)
        return self.qtransformer.apply(params["qtransformer"],
                                       [hs["res3"], hs["res4"], hs["res5"]])

    apply = encode
