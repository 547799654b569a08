"""ControlNet — structural-control residual branch, TPU-native.

Capability parity with the reference `controlnet` (lib/model_zoo/controlnet.py:65-330):
a copy of the SD UNet encoder (12 input blocks + middle block), an 8-conv
stride-2 hint pyramid (3->16->32->96->256->320, zero-init final conv,
controlnet.py:165-181), per-block zero 1x1 convs, producing the list of
13 residual tensors consumed by pfd_with_control (pfd.py:515-519).

Differences from the diffuser UNet's block layout: here ResBlock and
SpatialTransformer live in the SAME sequential block (input_blocks.N.0/.1),
matching the classic SD encoder, and the torch checkpoint key space
(control_sd15_*_slimmed.safetensors) is preserved via the pytree naming.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pfd_tpu import registry
from pfd_tpu.models import blocks
from pfd_tpu.ops import nn
from pfd_tpu.policy import Policy, FP32

# (cout, kernel, stride) chain of the hint block, torch indices 0,2,4,...,14
_HINT_CHAIN = [(16, 1), (16, 1), (32, 2), (32, 1), (96, 2), (96, 1), (256, 2)]


def _build_encoder_plan(model_channels, channel_mult, num_res_blocks,
                        attention_resolutions, num_heads):
    """Per input block: (kind, cin, cout, with_attn). kind: conv|res|down."""
    if isinstance(num_res_blocks, int):
        num_res_blocks = [num_res_blocks] * len(channel_mult)
    plan = [("conv", None, model_channels, False)]
    ch, ds = model_channels, 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks[level]):
            plan.append(("res", ch, mult * model_channels, ds in attention_resolutions))
            ch = mult * model_channels
        if level != len(channel_mult) - 1:
            plan.append(("down", ch, ch, False))
            ds *= 2
    return plan, ch


@registry.register("controlnet")
class ControlNet:
    def __init__(self, in_channels, hint_channels, model_channels,
                 attention_resolutions, num_res_blocks, channel_mult,
                 num_heads=8, context_dim=768, use_checkpoint=False,
                 image_size=None, use_spatial_transformer=True,
                 transformer_depth=1, legacy=False, policy: Policy = FP32):
        self.policy = policy
        self.in_channels = in_channels
        self.hint_channels = hint_channels
        self.model_channels = model_channels
        self.num_heads = num_heads
        self.context_dim = context_dim
        self.plan, self.mid_ch = _build_encoder_plan(
            model_channels, tuple(channel_mult), num_res_blocks,
            tuple(attention_resolutions), num_heads)

    @property
    def num_residuals(self):
        return len(self.plan) + 1  # 12 input blocks + middle

    def init(self, key):
        dtype = self.policy.param_dtype
        emb_ch = self.model_channels * 4
        keys = iter(jax.random.split(key, 64))

        params = {"time_embed": blocks.init_time_embed(next(keys), self.model_channels, dtype)}

        hint, cin = {}, self.hint_channels
        for i, (cout, stride) in enumerate(_HINT_CHAIN):
            hint[str(2 * i)] = nn.init_conv(next(keys), 3, 3, cin, cout, dtype)
            cin = cout
        hint[str(2 * len(_HINT_CHAIN))] = nn.init_conv(
            next(keys), 3, 3, cin, self.model_channels, dtype, zero=True)
        params["input_hint_block"] = hint

        inputs, zeros = {}, {}
        for i, (kind, cin, cout, with_attn) in enumerate(self.plan):
            if kind == "conv":
                block = {"0": nn.init_conv(next(keys), 3, 3, self.in_channels, cout, dtype)}
            elif kind == "res":
                block = {"0": blocks.init_res_block(next(keys), cin, cout, emb_ch, dtype)}
                if with_attn:
                    block["1"] = blocks.init_spatial_transformer(
                        next(keys), cout, self.num_heads, cout // self.num_heads,
                        self.context_dim, dtype)
            else:  # down
                block = {"0": blocks.init_downsample(next(keys), cin, cout, dtype)}
            inputs[str(i)] = block
            zeros[str(i)] = {"0": nn.init_conv(next(keys), 1, 1, cout, cout, dtype, zero=True)}
        params["input_blocks"] = inputs
        params["zero_convs"] = zeros

        c = self.mid_ch
        params["middle_block"] = {
            "0": blocks.init_res_block(next(keys), c, c, emb_ch, dtype),
            "1": blocks.init_spatial_transformer(next(keys), c, self.num_heads,
                                                 c // self.num_heads,
                                                 self.context_dim, dtype),
            "2": blocks.init_res_block(next(keys), c, c, emb_ch, dtype),
        }
        params["middle_block_out"] = {"0": nn.init_conv(next(keys), 1, 1, c, c, dtype, zero=True)}
        return params

    def hint_embed(self, params, hint):
        """Full-res hint image (B,H,W,3 in [0,1]) -> latent-res embedding."""
        pol = self.policy
        h = pol.cast(hint)
        p = params["input_hint_block"]
        n = len(_HINT_CHAIN)
        for i, (_, stride) in enumerate(_HINT_CHAIN):
            h = nn.conv2d(h, p[str(2 * i)], stride=stride, padding=1)
            h = nn.silu(h)
        return nn.conv2d(h, p[str(2 * n)], padding=1)

    def apply(self, params, x, hint, timesteps, context, *, self_attn_fn=None,
              hint_is_embedding=False):
        """Returns the 13 residual tensors (controlnet.py:302-324). ``hint``
        may be the raw hint image, a precomputed latent-res embedding
        (``hint_is_embedding=True``), or None for the no-control path.

        The embedding form is the TPU-first hoist SURVEY §7 anticipates: the
        reference recomputes the 8-conv hint pyramid on every forward
        (controlnet.py:302-324), but it depends only on the hint image, so
        the sampler computes it once per request outside the DDIM scan and
        CFG-tiles the (B, H/8, W/8, 320) embedding instead of the full-res
        image — output-identical (tests/test_controlnet.py)."""
        pol = self.policy
        x = pol.cast(x)
        context = pol.cast(context)
        emb = blocks.time_embed(params["time_embed"], timesteps,
                                self.model_channels, pol.compute_dtype)

        if hint is None:
            guided = None
        elif hint_is_embedding:
            guided = pol.cast(hint)
        else:
            guided = self.hint_embed(params, hint)

        outs = []
        h = x
        for i, (kind, cin, cout, with_attn) in enumerate(self.plan):
            block = params["input_blocks"][str(i)]
            if kind == "conv":
                h = nn.conv2d(h, block["0"], padding=1)
            elif kind == "res":
                h = blocks.res_block(block["0"], h, emb, pol)
                if with_attn:
                    h = blocks.spatial_transformer(block["1"], h, context,
                                                   self.num_heads, pol,
                                                   self_attn_fn=self_attn_fn)
            else:
                h = blocks.downsample(block["0"], h)
            if i == 0 and guided is not None:
                h = h + guided
            outs.append(nn.conv2d(h, params["zero_convs"][str(i)]["0"], padding=0))

        mid = params["middle_block"]
        h = blocks.res_block(mid["0"], h, emb, pol)
        h = blocks.spatial_transformer(mid["1"], h, context, self.num_heads, pol,
                                       self_attn_fn=self_attn_fn)
        h = blocks.res_block(mid["2"], h, emb, pol)
        outs.append(nn.conv2d(h, params["middle_block_out"]["0"], padding=0))
        return outs
