"""Classic SD UNet (`openai_unet`) — the sdwebui-layout variant.

Capability parity with the reference `openai_unet` (openaimodel.py:412-776):
the same network as UNetModel2D_Next but with the monolithic
input_blocks/middle_block/output_blocks/out parameter layout, so sdwebui-style
checkpoints (model.diffusion_model.*) load without the pfd re-keying. The
block program comes from the same static plan as the 2d_next variant — one
structural source of truth (models/unet.py build_plan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pfd_tpu import registry
from pfd_tpu.models import blocks
from pfd_tpu.models.unet import build_plan
from pfd_tpu.ops import nn
from pfd_tpu.policy import Policy, FP32


def _group_classic(plan):
    """Group plan ops into classic blocks.

    Returns (input_groups, middle_group, output_groups, out_idx) where each
    group is a list of ('res'|'conv'|'down'|'up'|'attn', plan_index)."""
    input_groups, group = [], []
    for op in plan.i_ops:
        if op[0] == "d":
            kind = plan.data_specs[op[1]].kind
            group.append((kind if kind != "conv_in" else "conv", op[1]))
        elif op[0] == "c":
            group.append(("attn", op[1]))
        elif op[0] == "save":
            input_groups.append(group)
            group = []

    middle_group = []
    for op in plan.m_ops:
        if op[0] == "d":
            middle_group.append(("res", op[1]))
        elif op[0] == "c":
            middle_group.append(("attn", op[1]))

    output_groups, group, out_idx = [], [], None
    for op in plan.o_ops:
        if op[0] == "load":
            if group:
                output_groups.append(group)
            group = []
        elif op[0] == "d":
            kind = plan.data_specs[op[1]].kind
            if kind == "out":
                out_idx = op[1]
            else:
                group.append((kind, op[1]))
        elif op[0] == "c":
            group.append(("attn", op[1]))
    if group:
        output_groups.append(group)
    return input_groups, middle_group, output_groups, out_idx


def dual_spatial_transformer(p, x, context, n_heads, policy, which=None,
                             self_attn_fn=None):
    """Two-branch SpatialTransformer (reference attention.py:450-540):
    which==0/1 selects a branch; a float `which` blends both branches'
    residuals as x0*which + x1*(1-which)."""

    def branch(i, ctx):
        q = {"norm": p[f"norm_{i}"], "proj_in": p[f"proj_in_{i}"],
             "transformer_blocks": p[f"transformer_blocks_{i}"],
             "proj_out": p[f"proj_out_{i}"]}
        return blocks.spatial_transformer(q, x, ctx, n_heads, policy,
                                          self_attn_fn=self_attn_fn) - x

    if which == 0:
        return x + branch(0, context)
    if which == 1:
        return x + branch(1, context)
    x0 = branch(0, context[0])
    x1 = branch(1, context[1])
    return x0 * which + x1 * (1 - which) + x


def init_dual_spatial_transformer(key, in_channels, n_heads, d_head,
                                  context_dim, dtype):
    k0, k1 = jax.random.split(key)
    p = {}
    for i, k in zip((0, 1), (k0, k1)):
        st = blocks.init_spatial_transformer(k, in_channels, n_heads, d_head,
                                             context_dim, dtype)
        p[f"norm_{i}"] = st["norm"]
        p[f"proj_in_{i}"] = st["proj_in"]
        p[f"transformer_blocks_{i}"] = st["transformer_blocks"]
        p[f"proj_out_{i}"] = st["proj_out"]
    return p


@registry.register("openai_unet")
class UNetModelClassic:
    def __init__(self, in_channels, out_channels, model_channels,
                 attention_resolutions, num_res_blocks, channel_mult,
                 num_heads=8, context_dim=None, num_head_channels=None,
                 use_spatial_transformer=True, transformer_depth=1,
                 use_checkpoint=False, legacy=False, image_size=None,
                 policy: Policy = FP32, **kwargs):
        assert use_spatial_transformer and context_dim is not None, \
            "this build implements the cross-attention (SD) variant"
        self.policy = policy
        self.model_channels = model_channels
        self.context_dim = context_dim
        self.plan = build_plan(in_channels, model_channels, out_channels,
                               num_res_blocks, tuple(attention_resolutions),
                               tuple(channel_mult), num_heads, context_dim,
                               num_head_channels)
        self.groups = _group_classic(self.plan)

    def _init_item(self, key, kind, idx, dtype, emb_ch):
        spec_d = self.plan.data_specs
        spec_c = self.plan.context_specs
        if kind == "conv":
            return nn.init_conv(key, 3, 3, spec_d[idx].cin, spec_d[idx].cout, dtype)
        if kind == "res":
            return blocks.init_res_block(key, spec_d[idx].cin, spec_d[idx].cout,
                                         emb_ch, dtype)
        if kind == "down":
            return blocks.init_downsample(key, spec_d[idx].cin, spec_d[idx].cout, dtype)
        if kind == "up":
            return blocks.init_upsample(key, spec_d[idx].cin, spec_d[idx].cout, dtype)
        if kind == "attn":
            s = spec_c[idx]
            return blocks.init_spatial_transformer(key, s.ch, s.n_heads, s.d_head,
                                                   self.context_dim, dtype)
        raise ValueError(kind)

    def init(self, key):
        dtype = self.policy.param_dtype
        emb_ch = self.model_channels * 4
        keys = iter(jax.random.split(key, 128))
        in_groups, mid, out_groups, out_idx = self.groups

        params = {"time_embed": blocks.init_time_embed(next(keys),
                                                       self.model_channels, dtype)}
        params["input_blocks"] = {
            str(i): {str(j): self._init_item(next(keys), kind, idx, dtype, emb_ch)
                     for j, (kind, idx) in enumerate(group)}
            for i, group in enumerate(in_groups)}
        params["middle_block"] = {
            str(j): self._init_item(next(keys), kind, idx, dtype, emb_ch)
            for j, (kind, idx) in enumerate(mid)}
        params["output_blocks"] = {
            str(i): {str(j): self._init_item(next(keys), kind, idx, dtype, emb_ch)
                     for j, (kind, idx) in enumerate(group)}
            for i, group in enumerate(out_groups)}
        spec = self.plan.data_specs[out_idx]
        params["out"] = {"0": nn.init_norm(spec.cin, dtype),
                         "2": nn.init_conv(next(keys), 3, 3, spec.cin, spec.cout,
                                           dtype, zero=True)}
        return params

    def _apply_item(self, p, kind, idx, h, emb, context, self_attn_fn):
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
            s = self.plan.context_specs[idx]
            return blocks.spatial_transformer(p, h, context, s.n_heads, pol,
                                              self_attn_fn=self_attn_fn)
        raise ValueError(kind)

    def apply(self, params, x, timesteps, context, *, self_attn_fn=None):
        """openaimodel.py:744-776 semantics."""
        pol = self.policy
        emb = blocks.time_embed(params["time_embed"], timesteps,
                                self.model_channels, pol.compute_dtype)
        x = pol.cast(x)
        if isinstance(context, (list, tuple)):
            context = [pol.cast(c) for c in context]  # dual-context pair
        elif context is not None:
            context = pol.cast(context)
        in_groups, mid, out_groups, out_idx = self.groups

        hs, h = [], x
        for i, group in enumerate(in_groups):
            for j, (kind, idx) in enumerate(group):
                h = self._apply_item(params["input_blocks"][str(i)][str(j)],
                                     kind, idx, h, emb, context, self_attn_fn)
            hs.append(h)
        for j, (kind, idx) in enumerate(mid):
            h = self._apply_item(params["middle_block"][str(j)], kind, idx, h,
                                 emb, context, self_attn_fn)
        for i, group in enumerate(out_groups):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for j, (kind, idx) in enumerate(group):
                h = self._apply_item(params["output_blocks"][str(i)][str(j)],
                                     kind, idx, h, emb, context, self_attn_fn)
        h = nn.group_norm(h, params["out"]["0"], eps=1e-5,
                          norm_dtype=pol.norm_dtype)
        h = nn.silu(h)
        return nn.conv2d(h, params["out"]["2"], padding=1)


@registry.register("openai_unet_dual_context")
class UNetModelDualContext(UNetModelClassic):
    """Classic-layout UNet whose attention blocks are DualSpatialTransformers
    (reference openaimodel.py:1621-1947) — the Versatile-Diffusion dual-stream
    conditioning surface. `which` selects or blends the two context branches."""

    def _init_item(self, key, kind, idx, dtype, emb_ch):
        if kind == "attn":
            s = self.plan.context_specs[idx]
            return init_dual_spatial_transformer(key, s.ch, s.n_heads, s.d_head,
                                                 self.context_dim, dtype)
        return super()._init_item(key, kind, idx, dtype, emb_ch)

    def apply(self, params, x, timesteps, context, *, which=0,
              self_attn_fn=None):
        self._which = which
        return super().apply(params, x, timesteps, context,
                             self_attn_fn=self_attn_fn)

    def _apply_item(self, p, kind, idx, h, emb, context, self_attn_fn):
        if kind == "attn":
            s = self.plan.context_specs[idx]
            return dual_spatial_transformer(p, h, context, s.n_heads,
                                            self.policy, which=self._which,
                                            self_attn_fn=self_attn_fn)
        return super()._apply_item(p, kind, idx, h, emb, context, self_attn_fn)


@registry.register("openai_unet_2d")
class UNetModel2D(UNetModelClassic):
    """VD-style arg surface over the classic layout (openaimodel.py:1948-2083):
    per-level `with_attn` flags and `num_noattn_blocks` instead of
    attention_resolutions — translated onto the same static plan."""

    def __init__(self, input_channels, model_channels, output_channels,
                 context_dim=768, num_noattn_blocks=(2, 2, 2, 2),
                 channel_mult=(1, 2, 4, 8), with_attn=(True, True, True, False),
                 num_heads=8, use_checkpoint=True, policy: Policy = FP32, **kw):
        attn_res = [2 ** lv for lv, w in enumerate(with_attn) if w]
        super().__init__(in_channels=input_channels,
                         out_channels=output_channels,
                         model_channels=model_channels,
                         attention_resolutions=attn_res,
                         num_res_blocks=list(num_noattn_blocks),
                         channel_mult=channel_mult, num_heads=num_heads,
                         context_dim=context_dim, policy=policy)
