"""UNetModel2D_Next — the SD-1.5-shaped diffuser, rebuilt TPU-first.

The reference splits the UNet into interchangeable `data_blocks` (ResBlocks,
convs, resampling) and `context_blocks` (cross-attention SpatialTransformers)
driven by an interpreted opcode program (openaimodel.py:2575-2812). Here the
program is a *static plan* computed once from the config: plain Python control
flow at trace time, so XLA sees one flat graph — no module runtime, no
interpreter. The split survives as a params split (params['data_blocks'] /
params['context_blocks']), which is what enables the reference's checkpoint
zoo semantics: any SD-1.5 data weights + SeeCoder-adapted context weights.

The plan is also consumed by ControlNet (encoder half) and by the composite
pfd model, which injects ControlNet residuals per the reference's
pfd.py:496-527 walk.
"""

from __future__ import annotations

import dataclasses

import jax

from pfd_tpu import registry
from pfd_tpu.models import blocks
from pfd_tpu.ops import nn
from pfd_tpu.policy import Policy, FP32


@dataclasses.dataclass(frozen=True)
class DataSpec:
    kind: str          # conv_in | res | down | up | out
    cin: int
    cout: int


@dataclasses.dataclass(frozen=True)
class ContextSpec:
    ch: int
    n_heads: int
    d_head: int


@dataclasses.dataclass(frozen=True)
class UNetPlan:
    """Static layer-order program (i/m/o opcode lists + block specs).

    Opcodes: ('d', i) data block, ('c', i) context block, ('save',), ('load',).
    Mirrors the i_order/m_order/o_order construction at openaimodel.py:2660-2739.
    """

    i_ops: tuple
    m_ops: tuple
    o_ops: tuple
    data_specs: tuple      # DataSpec per data block, in order
    context_specs: tuple   # ContextSpec per context block, in order
    model_channels: int
    skip_channels: tuple   # channels of each saved hidden feature, in save order

    @property
    def ops(self):
        return self.i_ops + self.m_ops + self.o_ops


def build_plan(in_channels, model_channels, out_channels, num_res_blocks,
               attention_resolutions, channel_mult, num_heads, context_dim,
               num_head_channels=None, with_context=True) -> UNetPlan:
    if isinstance(num_res_blocks, int):
        num_res_blocks = [num_res_blocks] * len(channel_mult)
    if not with_context:
        attention_resolutions = ()

    def heads_for(ch):
        if num_head_channels is None:
            return num_heads, ch // num_heads
        return ch // num_head_channels, num_head_channels

    data, ctx = [], []
    i_ops, m_ops, o_ops = [], [], []

    def add_d(ops, kind, cin, cout):
        ops.append(("d", len(data)))
        data.append(DataSpec(kind, cin, cout))

    def add_c(ops, ch):
        nh, dh = heads_for(ch)
        ops.append(("c", len(ctx)))
        ctx.append(ContextSpec(ch, nh, dh))

    # input half
    add_d(i_ops, "conv_in", in_channels, model_channels)
    i_ops.append(("save",))
    input_chans = [model_channels]
    skip_channels = [model_channels]
    ch, ds = model_channels, 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks[level]):
            add_d(i_ops, "res", ch, mult * model_channels)
            ch = mult * model_channels
            if ds in attention_resolutions:
                add_c(i_ops, ch)
            input_chans.append(ch)
            skip_channels.append(ch)
            i_ops.append(("save",))
        if level != len(channel_mult) - 1:
            add_d(i_ops, "down", ch, ch)
            input_chans.append(ch)
            skip_channels.append(ch)
            i_ops.append(("save",))
            ds *= 2

    # middle
    add_d(m_ops, "res", ch, ch)
    if with_context:
        add_c(m_ops, ch)
    add_d(m_ops, "res", ch, ch)

    # output half
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for _ in range(num_res_blocks[level] + 1):
            o_ops.append(("load",))
            ich = input_chans.pop()
            add_d(o_ops, "res", ch + ich, model_channels * mult)
            ch = model_channels * mult
            if ds in attention_resolutions:
                add_c(o_ops, ch)
        if level != 0:
            add_d(o_ops, "up", ch, ch)
            ds //= 2
    add_d(o_ops, "out", ch, out_channels)

    return UNetPlan(tuple(i_ops), tuple(m_ops), tuple(o_ops),
                    tuple(data), tuple(ctx), model_channels, tuple(skip_channels))


def init_data_block(key, spec: DataSpec, emb_ch, dtype):
    """Param tree for one data block. Torch wraps each block in a
    TimestepEmbedSequential -> nested under key '0' (openaimodel.py:2760-2766)."""
    if spec.kind == "conv_in":
        inner = nn.init_conv(key, 3, 3, spec.cin, spec.cout, dtype)
    elif spec.kind == "res":
        inner = blocks.init_res_block(key, spec.cin, spec.cout, emb_ch, dtype)
    elif spec.kind == "down":
        inner = blocks.init_downsample(key, spec.cin, spec.cout, dtype)
    elif spec.kind == "up":
        inner = blocks.init_upsample(key, spec.cin, spec.cout, dtype)
    elif spec.kind == "out":
        # nn.Sequential(norm, SiLU, zero conv) -> keys 0 / 2
        inner = {"0": nn.init_norm(spec.cin, dtype),
                 "2": nn.init_conv(key, 3, 3, spec.cin, spec.cout, dtype, zero=True)}
    else:
        raise ValueError(spec.kind)
    return {"0": inner}


def apply_data_block(p, spec: DataSpec, h, emb, policy: Policy):
    p = p["0"]
    if spec.kind == "conv_in":
        return nn.conv2d(h, p, padding=1)
    if spec.kind == "res":
        return blocks.res_block(p, h, emb, policy)
    if spec.kind == "down":
        return blocks.downsample(p, h)
    if spec.kind == "up":
        return blocks.upsample(p, h)
    if spec.kind == "out":
        h = nn.group_norm(h, p["0"], eps=1e-5, norm_dtype=policy.norm_dtype)
        h = nn.silu(h)
        return nn.conv2d(h, p["2"], padding=1)
    raise ValueError(spec.kind)


@registry.register("openai_unet_2d_next")
class UNetModel2DNext:
    def __init__(self, in_channels, out_channels, model_channels,
                 attention_resolutions, num_res_blocks, channel_mult,
                 num_heads=8, context_dim=768, num_head_channels=None,
                 use_checkpoint=False, parts=("global", "data", "context"),
                 policy: Policy = FP32):
        self.policy = policy
        self.use_checkpoint = use_checkpoint
        self.model_channels = model_channels
        self.context_dim = context_dim
        self.parts = tuple(parts) if not isinstance(parts, str) else (parts,)
        self.plan = build_plan(in_channels, model_channels, out_channels,
                               num_res_blocks, tuple(attention_resolutions),
                               tuple(channel_mult), num_heads, context_dim,
                               num_head_channels,
                               with_context="context" in self.parts)

    def init(self, key):
        dtype = self.policy.param_dtype
        emb_ch = self.model_channels * 4
        keys = iter(jax.random.split(key, len(self.plan.data_specs)
                                     + len(self.plan.context_specs) + 1))
        params = {
            "time_embed": blocks.init_time_embed(next(keys), self.model_channels, dtype),
            "data_blocks": {
                str(i): init_data_block(next(keys), spec, emb_ch, dtype)
                for i, spec in enumerate(self.plan.data_specs)
            },
            "context_blocks": {
                str(i): {"0": blocks.init_spatial_transformer(
                    next(keys), spec.ch, spec.n_heads, spec.d_head,
                    self.context_dim, dtype)}
                for i, spec in enumerate(self.plan.context_specs)
            },
        }
        return params

    def time_embedding(self, params, timesteps):
        return blocks.time_embed(params["time_embed"], timesteps,
                                 self.model_channels, self.policy.compute_dtype)

    def apply(self, params, x, timesteps, context, *, control_residuals=None,
              self_attn_fn=None, data_params=None, context_params=None,
              emb=None):
        """Full forward. ``control_residuals``: optional list of 13 NHWC tensors
        (12 skip + 1 middle) added per pfd.py:515-519. ``data_params`` /
        ``context_params`` allow the composite model to pull the two halves
        from different diffusers (pfd.py:326-329)."""
        pol = self.policy
        plan = self.plan
        dp = data_params if data_params is not None else params["data_blocks"]
        cp = context_params if context_params is not None else params["context_blocks"]
        if emb is None:
            emb = self.time_embedding(params, timesteps)
        x = pol.cast(x)
        context = pol.cast(context) if context is not None else None
        emb = pol.cast(emb)

        ccs = list(control_residuals) if control_residuals is not None else None

        def run_op(op, h, hs):
            kind = op[0]
            if kind == "d":
                i = op[1]
                h = apply_data_block(dp[str(i)], plan.data_specs[i], h, emb, pol)
            elif kind == "c":
                i = op[1]
                spec = plan.context_specs[i]
                h = blocks.spatial_transformer(cp[str(i)]["0"], h, context,
                                               spec.n_heads, pol,
                                               self_attn_fn=self_attn_fn)
            elif kind == "save":
                hs.append(h)
            elif kind == "load":
                skip = hs.pop()
                if ccs is not None:
                    skip = skip + pol.cast(ccs.pop())
                h = jax.numpy.concatenate([h, skip], axis=-1)
            return h

        hs = []
        h = x
        for op in plan.i_ops:
            h = run_op(op, h, hs)
        for op in plan.m_ops:
            h = run_op(op, h, hs)
        if ccs is not None:
            h = h + pol.cast(ccs.pop())
        for op in plan.o_ops:
            h = run_op(op, h, hs)
        return h

    def apply_encoder(self, params, x, timesteps, context, *,
                      control_residuals=None, self_attn_fn=None, emb=None):
        """Input + middle halves only; returns (h_mid, skip-tuple) for
        encoder-propagation sampling (Faster Diffusion, arXiv:2312.09608:
        encoder features evolve slowly across adjacent steps and can be
        reused; the decoder stays per-step via the time embedding)."""
        pol = self.policy
        if emb is None:
            emb = self.time_embedding(params, timesteps)
        x = pol.cast(x)
        context = pol.cast(context) if context is not None else None
        dp, cp = params["data_blocks"], params["context_blocks"]
        ccs = list(control_residuals) if control_residuals is not None else None

        hs = []
        h = x
        for op in self.plan.i_ops + self.plan.m_ops:
            kind = op[0]
            if kind == "d":
                h = apply_data_block(dp[str(op[1])], self.plan.data_specs[op[1]],
                                     h, emb, pol)
            elif kind == "c":
                spec = self.plan.context_specs[op[1]]
                h = blocks.spatial_transformer(cp[str(op[1])]["0"], h, context,
                                               spec.n_heads, pol,
                                               self_attn_fn=self_attn_fn)
            elif kind == "save":
                hs.append(h)
        if ccs is not None:
            mid_cc = ccs.pop()
            hs = [s + pol.cast(c) for s, c in zip(hs, ccs)]
            h = h + pol.cast(mid_cc)
        return h, tuple(hs)

    def apply_decoder(self, params, h, hs, timesteps, context, *,
                      self_attn_fn=None, emb=None):
        """Output half given (possibly cached) encoder state."""
        return self._run_o_ops(params, self.plan.o_ops, h, hs, timesteps,
                               context, self_attn_fn=self_attn_fn, emb=emb)

    def _run_o_ops(self, params, ops, h, hs, timesteps, context, *,
                   self_attn_fn=None, emb=None):
        pol = self.policy
        if emb is None:
            emb = self.time_embedding(params, timesteps)
        context = pol.cast(context) if context is not None else None
        dp, cp = params["data_blocks"], params["context_blocks"]
        hs = list(hs)
        for op in ops:
            kind = op[0]
            if kind == "load":
                h = jax.numpy.concatenate([h, hs.pop()], axis=-1)
            elif kind == "d":
                h = apply_data_block(dp[str(op[1])], self.plan.data_specs[op[1]],
                                     h, emb, pol)
            elif kind == "c":
                spec = self.plan.context_specs[op[1]]
                h = blocks.spatial_transformer(cp[str(op[1])]["0"], h, context,
                                               spec.n_heads, pol,
                                               self_attn_fn=self_attn_fn)
        return h

    # ---- DeepCache split (arXiv:2312.00858) --------------------------------
    # The output program is cut at its LAST 'up' block: the shallow suffix is
    # the highest-resolution decoder level (+ the up transition and the out
    # head); everything before it is the deep prefix whose output changes
    # slowly across adjacent denoise steps and can be cached. The matching
    # encoder prefix is the i_ops slice that produces the shallow skips.
    # No reference counterpart — the reference has no step-caching at all
    # (lib/model_zoo/ddim.py runs the full UNet every step).

    def decoder_split(self):
        """(o_deep, o_shallow, n_shallow_skips); None if single-level."""
        last_up = None
        for i, op in enumerate(self.plan.o_ops):
            if op[0] == "d" and self.plan.data_specs[op[1]].kind == "up":
                last_up = i
        if last_up is None:
            return None
        o_deep = self.plan.o_ops[:last_up]
        o_shallow = self.plan.o_ops[last_up:]
        n_shallow = sum(1 for op in o_shallow if op[0] == "load")
        return o_deep, o_shallow, n_shallow

    def apply_encoder_shallow(self, params, x, timesteps, context, *,
                              self_attn_fn=None, emb=None):
        """The i_ops prefix producing exactly the shallow skips (the first
        decoder_split()[2] saves); h itself is discarded — the deep branch is
        cached. Bit-identical to apply_encoder's first saves (unit-tested)."""
        pol = self.policy
        if emb is None:
            emb = self.time_embedding(params, timesteps)
        x = pol.cast(x)
        context = pol.cast(context) if context is not None else None
        dp, cp = params["data_blocks"], params["context_blocks"]
        n_saves = self.decoder_split()[2]

        hs = []
        h = x
        for op in self.plan.i_ops:
            kind = op[0]
            if kind == "d":
                h = apply_data_block(dp[str(op[1])], self.plan.data_specs[op[1]],
                                     h, emb, pol)
            elif kind == "c":
                spec = self.plan.context_specs[op[1]]
                h = blocks.spatial_transformer(cp[str(op[1])]["0"], h, context,
                                               spec.n_heads, pol,
                                               self_attn_fn=self_attn_fn)
            elif kind == "save":
                hs.append(h)
                if len(hs) == n_saves:
                    return tuple(hs)
        raise AssertionError("encoder ended before the shallow saves")

    def apply_decoder_deep(self, params, h, hs_deep, timesteps, context, *,
                           self_attn_fn=None, emb=None):
        """Deep decoder prefix: consumes the deep skips (saves n_shallow..end),
        returns the feature entering the shallow suffix (the DeepCache cache
        point, pre-up so the cached tensor stays at the lower resolution)."""
        o_deep = self.decoder_split()[0]
        return self._run_o_ops(params, o_deep, h, hs_deep, timesteps, context,
                               self_attn_fn=self_attn_fn, emb=emb)

    def apply_decoder_shallow(self, params, h, hs_shallow, timesteps, context,
                              *, self_attn_fn=None, emb=None):
        """Shallow decoder suffix: up + highest-res level + out head, fed the
        (possibly cached) deep feature and the first n_shallow skips."""
        o_shallow = self.decoder_split()[1]
        return self._run_o_ops(params, o_shallow, h, hs_shallow, timesteps,
                               context, self_attn_fn=self_attn_fn, emb=emb)


# register the classic-layout and 0d (vector) variants
from pfd_tpu.models import unet_classic  # noqa: E402,F401
from pfd_tpu.models import unet_0d  # noqa: E402,F401
from pfd_tpu.models import unet_variants  # noqa: E402,F401
