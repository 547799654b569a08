"""AutoencoderKL — the f=8 KL VAE, TPU-native (NHWC, functional).

Capability parity with the reference `autoencoderkl`
(lib/model_zoo/autokl.py:14-139, blocks in lib/model_zoo/autokl_modules.py):
encode = x*2-1 -> Encoder -> quant_conv -> DiagonalGaussian -> sample/mode;
decode = post_quant_conv -> Decoder -> (x+1)/2 -> clamp[0,1].

Parameter pytrees mirror the torch module hierarchy so the generic converter
(pfd_tpu/io/convert.py) loads reference checkpoints unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pfd_tpu import registry
from pfd_tpu.ops import nn
from pfd_tpu.policy import Policy, FP32

_EPS = 1e-6  # autokl_modules.py:38 Normalize eps


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _resnet_block(p, x, policy):
    h = nn.group_norm(x, p["norm1"], eps=_EPS, norm_dtype=policy.norm_dtype)
    h = nn.silu(h)
    h = nn.conv2d(h, p["conv1"], padding=1)
    h = nn.group_norm(h, p["norm2"], eps=_EPS, norm_dtype=policy.norm_dtype)
    h = nn.silu(h)
    h = nn.conv2d(h, p["conv2"], padding=1)
    if "nin_shortcut" in p:
        x = nn.conv2d(x, p["nin_shortcut"], padding=0)
    return x + h


def _attn_block(p, x, policy):
    """Single-head spatial self-attention (autokl_modules.py:150-204).
    Uses the Pallas flash kernel for long sequences (the 64x64 latent grid is
    4096 tokens at c=512 — materializing S^2 logits is HBM-bound)."""
    b, hh, ww, c = x.shape
    h = nn.group_norm(x, p["norm"], eps=_EPS, norm_dtype=policy.norm_dtype)
    q = nn.conv2d(h, p["q"], padding=0).reshape(b, 1, hh * ww, c)
    k = nn.conv2d(h, p["k"], padding=0).reshape(b, 1, hh * ww, c)
    v = nn.conv2d(h, p["v"], padding=0).reshape(b, 1, hh * ww, c)
    if hh * ww >= 1024 and jax.default_backend() != "cpu":
        from pfd_tpu.ops.flash_attention import flash_attention

        o = flash_attention(q, k, v)
    else:
        o = nn.dot_product_attention(q, k, v, softmax_dtype=policy.softmax_dtype)
    o = o.reshape(b, hh, ww, c)
    o = nn.conv2d(o, p["proj_out"], padding=0)
    return x + o


def _downsample(p, x):
    # asymmetric right/bottom pad + stride-2 valid conv (autokl_modules.py:60-80)
    return nn.conv2d(x, p["conv"], stride=2, padding=((0, 1), (0, 1)))


def _upsample(p, x):
    # lossless phase-decomposed fusion (ops/nn.upsample_conv2d)
    return nn.upsample_conv2d(x, p["conv"])


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def _init_resnet(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": nn.init_norm(cin, dtype),
        "conv1": nn.init_conv(ks[0], 3, 3, cin, cout, dtype),
        "norm2": nn.init_norm(cout, dtype),
        "conv2": nn.init_conv(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = nn.init_conv(ks[2], 1, 1, cin, cout, dtype)
    return p


def _init_attn(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": nn.init_norm(c, dtype),
        "q": nn.init_conv(ks[0], 1, 1, c, c, dtype),
        "k": nn.init_conv(ks[1], 1, 1, c, c, dtype),
        "v": nn.init_conv(ks[2], 1, 1, c, c, dtype),
        "proj_out": nn.init_conv(ks[3], 1, 1, c, c, dtype),
    }


@registry.register("autoencoderkl")
class AutoencoderKL:
    def __init__(self, ddconfig, embed_dim, lossconfig=None, policy: Policy = FP32):
        self.cfg = dict(ddconfig)
        self.embed_dim = embed_dim
        self.policy = policy
        self.ch = ddconfig["ch"]
        self.ch_mult = tuple(ddconfig["ch_mult"])
        self.num_res_blocks = ddconfig["num_res_blocks"]
        self.attn_resolutions = tuple(ddconfig.get("attn_resolutions", []))
        self.resolution = ddconfig.get("resolution", 256)
        self.in_channels = ddconfig["in_channels"]
        self.out_ch = ddconfig["out_ch"]
        self.z_channels = ddconfig["z_channels"]
        self.double_z = ddconfig.get("double_z", True)
        # spatial down-factor f = 2^(levels-1); 8 for the production config
        self.downsample_factor = 2 ** (len(self.ch_mult) - 1)

    # ---- init ------------------------------------------------------------

    def init(self, key):
        dtype = self.policy.param_dtype
        ch, mult = self.ch, self.ch_mult
        nlev = len(mult)
        keys = iter(jax.random.split(key, 256))

        def enc():
            p = {"conv_in": nn.init_conv(next(keys), 3, 3, self.in_channels, ch, dtype)}
            in_mult = (1,) + mult
            down = {}
            curr_res = self.resolution
            for i in range(nlev):
                cin, cout = ch * in_mult[i], ch * mult[i]
                level = {"block": {}}
                for j in range(self.num_res_blocks):
                    level["block"][str(j)] = _init_resnet(next(keys), cin if j == 0 else cout, cout, dtype)
                if curr_res in self.attn_resolutions:
                    level["attn"] = {str(j): _init_attn(next(keys), cout, dtype)
                                     for j in range(self.num_res_blocks)}
                if i != nlev - 1:
                    level["downsample"] = {"conv": nn.init_conv(next(keys), 3, 3, cout, cout, dtype)}
                    curr_res //= 2
                down[str(i)] = level
            cmid = ch * mult[-1]
            p["down"] = down
            p["mid"] = {
                "block_1": _init_resnet(next(keys), cmid, cmid, dtype),
                "attn_1": _init_attn(next(keys), cmid, dtype),
                "block_2": _init_resnet(next(keys), cmid, cmid, dtype),
            }
            zc = 2 * self.z_channels if self.double_z else self.z_channels
            p["norm_out"] = nn.init_norm(cmid, dtype)
            p["conv_out"] = nn.init_conv(next(keys), 3, 3, cmid, zc, dtype)
            return p

        def dec():
            cmid = ch * mult[-1]
            p = {"conv_in": nn.init_conv(next(keys), 3, 3, self.z_channels, cmid, dtype)}
            p["mid"] = {
                "block_1": _init_resnet(next(keys), cmid, cmid, dtype),
                "attn_1": _init_attn(next(keys), cmid, dtype),
                "block_2": _init_resnet(next(keys), cmid, cmid, dtype),
            }
            up = {}
            block_in = cmid
            curr_res = self.resolution // 2 ** (nlev - 1)
            for i in reversed(range(nlev)):
                cout = ch * mult[i]
                level = {"block": {}}
                for j in range(self.num_res_blocks + 1):
                    level["block"][str(j)] = _init_resnet(next(keys), block_in, cout, dtype)
                    block_in = cout
                if curr_res in self.attn_resolutions:
                    level["attn"] = {str(j): _init_attn(next(keys), cout, dtype)
                                     for j in range(self.num_res_blocks + 1)}
                if i != 0:
                    level["upsample"] = {"conv": nn.init_conv(next(keys), 3, 3, cout, cout, dtype)}
                    curr_res *= 2
                up[str(i)] = level
            p["up"] = up
            p["norm_out"] = nn.init_norm(ch * mult[0], dtype)
            p["conv_out"] = nn.init_conv(next(keys), 3, 3, ch * mult[0], self.out_ch, dtype)
            return p

        zc = self.z_channels
        return {
            "encoder": enc(),
            "decoder": dec(),
            "quant_conv": nn.init_conv(next(keys), 1, 1, 2 * zc, 2 * self.embed_dim, dtype),
            "post_quant_conv": nn.init_conv(next(keys), 1, 1, self.embed_dim, zc, dtype),
        }

    # ---- forward ---------------------------------------------------------

    def encoder_apply(self, p, x):
        pol = self.policy
        nlev = len(self.ch_mult)
        h = nn.conv2d(x, p["conv_in"], padding=1)
        for i in range(nlev):
            level = p["down"][str(i)]
            for j in range(self.num_res_blocks):
                h = _resnet_block(level["block"][str(j)], h, pol)
                if "attn" in level:
                    h = _attn_block(level["attn"][str(j)], h, pol)
            if "downsample" in level:
                h = _downsample(level["downsample"], h)
        h = _resnet_block(p["mid"]["block_1"], h, pol)
        h = _attn_block(p["mid"]["attn_1"], h, pol)
        h = _resnet_block(p["mid"]["block_2"], h, pol)
        h = nn.group_norm(h, p["norm_out"], eps=_EPS, norm_dtype=pol.norm_dtype)
        h = nn.silu(h)
        return nn.conv2d(h, p["conv_out"], padding=1)

    def decoder_apply(self, p, z):
        pol = self.policy
        nlev = len(self.ch_mult)
        h = nn.conv2d(z, p["conv_in"], padding=1)
        h = _resnet_block(p["mid"]["block_1"], h, pol)
        h = _attn_block(p["mid"]["attn_1"], h, pol)
        h = _resnet_block(p["mid"]["block_2"], h, pol)
        for i in reversed(range(nlev)):
            level = p["up"][str(i)]
            for j in range(self.num_res_blocks + 1):
                h = _resnet_block(level["block"][str(j)], h, pol)
                if "attn" in level:
                    h = _attn_block(level["attn"][str(j)], h, pol)
            if "upsample" in level:
                h = _upsample(level["upsample"], h)
        h = nn.group_norm(h, p["norm_out"], eps=_EPS, norm_dtype=pol.norm_dtype)
        h = nn.silu(h)
        return nn.conv2d(h, p["conv_out"], padding=1)

    def encode_moments(self, params, x):
        """x in [0,1] NHWC -> (mean, logvar) along channel (autokl.py:33-42)."""
        x = self.policy.cast(x) * 2 - 1
        h = self.encoder_apply(params["encoder"], x)
        moments = nn.conv2d(h, params["quant_conv"], padding=0)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def encode(self, params, x, rng=None, sample=True):
        mean, logvar = self.encode_moments(params, x)
        if not sample:
            return mean
        assert rng is not None, "sampling the posterior needs an rng key"
        std = jnp.exp(0.5 * logvar.astype(jnp.float32)).astype(mean.dtype)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, params, z, clamp=True):
        z = self.policy.cast(z)
        z = nn.conv2d(z, params["post_quant_conv"], padding=0)
        dec = self.decoder_apply(params["decoder"], z)
        dec = (dec + 1) / 2
        if clamp:
            dec = jnp.clip(dec, 0.0, 1.0)
        return dec

    @staticmethod
    def kl(mean, logvar):
        """KL to standard normal, summed over non-batch dims (distributions.py:41-47)."""
        m = mean.astype(jnp.float32)
        lv = logvar.astype(jnp.float32)
        return 0.5 * jnp.sum(m ** 2 + jnp.exp(lv) - 1.0 - lv, axis=(1, 2, 3))
