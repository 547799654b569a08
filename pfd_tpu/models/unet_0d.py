"""UNetModel0D_Next — the fully-connected (vector-data) diffuser variant.

Capability parity with the reference `openai_unet_0d_next`
(openaimodel.py:2814-2975): Linear_MultiDim stems, FCBlock_MultiDim residual
blocks (1x1-conv ResBlocks over the flattened [C, s, 1] channel dims,
openaimodel.py:2084-2142, 2275-2333), cross-attention SpatialTransformers over
the s-token sequence, and the same data/context split + i/m/o opcode program.

Used by the Versatile-Diffusion lineage for vector modalities; registered for
checkpoint-zoo surface parity. Flatten convention matches torch's
view([C, s, 1] -> C*s): C-major.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu import registry
from pfd_tpu.models import blocks
from pfd_tpu.ops import nn
from pfd_tpu.policy import Policy, FP32


def _init_fc_block(key, cin_all, cout_all, emb_ch, dtype):
    """FCBlock params (1x1 convs; torch keys in_layers.0/.2, emb_layers.1,
    out_layers.0/.3, skip_connection)."""
    ks = jax.random.split(key, 4)
    p = {
        "in_layers": {"0": nn.init_norm(cin_all, dtype),
                      "2": nn.init_conv(ks[0], 1, 1, cin_all, cout_all, dtype)},
        "emb_layers": {"1": nn.init_linear(ks[1], emb_ch, cout_all, dtype)},
        "out_layers": {"0": nn.init_norm(cout_all, dtype),
                       "3": nn.init_conv(ks[2], 1, 1, cout_all, cout_all, dtype,
                                         zero=True)},
    }
    if cin_all != cout_all:
        p["skip_connection"] = nn.init_conv(ks[3], 1, 1, cin_all, cout_all, dtype)
    return p


def _fc_block(p, h_vec, emb, policy):
    """h_vec: (B, C_all). FCBlock forward (openaimodel.py:2134-2142)."""
    x = h_vec[:, None, None, :]
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
    return (x + h)[:, 0, 0, :]


@registry.register("openai_unet_0d_next")
class UNetModel0DNext:
    def __init__(self, input_channels, model_channels, output_channels,
                 context_dim=768, num_noattn_blocks=(2, 2, 2, 2),
                 channel_mult=(1, 2, 4, 8), second_dim=(4, 4, 4, 4),
                 with_attn=(True, True, True, False), num_heads=8,
                 num_head_channels=None, use_checkpoint=False,
                 parts=("global", "data", "context"), policy: Policy = FP32):
        self.policy = policy
        self.input_channels = input_channels
        self.model_channels = model_channels
        self.output_channels = output_channels
        self.context_dim = context_dim
        self.num_heads = num_heads
        self.num_head_channels = num_head_channels

        # build the static plan (mirrors openaimodel.py:2884-2967)
        data, ctx = [], []
        i_ops, m_ops, o_ops = [], [], []

        def add_d(ops, spec):
            ops.append(("d", len(data)))
            data.append(spec)

        def add_c(ops, c_ch):
            if num_head_channels is None:
                nh, dh = num_heads, c_ch // num_heads
            else:
                nh, dh = c_ch // num_head_channels, num_head_channels
            ops.append(("c", len(ctx)))
            ctx.append((c_ch, nh, dh))

        sdim = second_dim[0]
        cur = (model_channels, sdim)  # [C, s] (trailing 1 dropped)
        add_d(i_ops, ("linear", input_channels, cur[0] * cur[1], None, cur))
        i_ops.append(("save",))
        in_chans = [cur]
        for lv, (mult, sdim) in enumerate(zip(channel_mult, second_dim)):
            for _ in range(num_noattn_blocks[lv]):
                new = (mult * model_channels, sdim)
                add_d(i_ops, ("fc", cur[0] * cur[1], new[0] * new[1], cur, new))
                cur = new
                if with_attn[lv]:
                    add_c(i_ops, cur[0])
                in_chans.append(cur)
                i_ops.append(("save",))
            if lv != len(channel_mult) - 1:
                add_d(i_ops, ("linear", cur[0] * cur[1], cur[0] * cur[1], cur, cur))
                in_chans.append(cur)
                i_ops.append(("save",))

        add_d(m_ops, ("fc", cur[0] * cur[1], cur[0] * cur[1], cur, cur))
        add_c(m_ops, cur[0])
        add_d(m_ops, ("fc", cur[0] * cur[1], cur[0] * cur[1], cur, cur))

        for lv, (mult, sdim) in list(enumerate(zip(channel_mult, second_dim)))[::-1]:
            for _ in range(num_noattn_blocks[lv] + 1):
                o_ops.append(("load",))
                extra = in_chans.pop()
                cin = ((cur[0] + extra[0]), cur[1])
                new = (mult * model_channels, sdim)
                add_d(o_ops, ("fc", cin[0] * cin[1], new[0] * new[1], cin, new))
                cur = new
                if with_attn[lv]:
                    add_c(o_ops, cur[0])
            if lv != 0:
                add_d(o_ops, ("linear", cur[0] * cur[1], cur[0] * cur[1], cur, cur))
        add_d(o_ops, ("out", cur[0] * cur[1], output_channels, cur, None))

        self.data_specs = tuple(data)
        self.context_specs = tuple(ctx)
        self.i_ops, self.m_ops, self.o_ops = tuple(i_ops), tuple(m_ops), tuple(o_ops)

    def init(self, key):
        dtype = self.policy.param_dtype
        emb_ch = self.model_channels * 4
        keys = iter(jax.random.split(key, len(self.data_specs)
                                     + len(self.context_specs) + 2))
        params = {"time_embed": blocks.init_time_embed(next(keys),
                                                       self.model_channels, dtype)}
        dblocks = {}
        for i, (kind, cin, cout, mdin, mdout) in enumerate(self.data_specs):
            if kind == "linear":
                inner = nn.init_linear(next(keys), cin, cout, dtype)
            elif kind == "fc":
                inner = _init_fc_block(next(keys), cin, cout, emb_ch, dtype)
            elif kind == "out":
                # Sequential(norm(C), SiLU, zero Linear_MultiDim) -> keys 0/2;
                # the norm is over the C dim only (openaimodel.py:2959)
                inner = {"0": nn.init_norm(mdin[0], dtype),
                         "2": nn.init_linear(next(keys), cin, cout, dtype,
                                             zero=True)}
            dblocks[str(i)] = {"0": inner}
        params["data_blocks"] = dblocks
        params["context_blocks"] = {
            str(i): {"0": blocks.init_spatial_transformer(
                next(keys), c_ch, nh, dh, self.context_dim, dtype)}
            for i, (c_ch, nh, dh) in enumerate(self.context_specs)}
        return params

    def time_embedding(self, params, timesteps):
        return blocks.time_embed(params["time_embed"], timesteps,
                                 self.model_channels, self.policy.compute_dtype)

    def apply(self, params, x, timesteps, context, *, self_attn_fn=None):
        """x: (B, input_channels) vector. Returns (B, output_channels)."""
        pol = self.policy
        emb = pol.cast(self.time_embedding(params, timesteps))
        context = pol.cast(context) if context is not None else None
        h = pol.cast(x)

        def to_seq(h_vec, md):
            c, s = md
            return h_vec.reshape(-1, c, s).transpose(0, 2, 1)[:, :, None, :]

        def to_vec(h_seq):
            b, s, _, c = h_seq.shape
            return h_seq[:, :, 0, :].transpose(0, 2, 1).reshape(b, c * s)

        cur_md = [None]

        def run(op, h, hs):
            kind = op[0]
            if kind == "d":
                spec = self.data_specs[op[1]]
                p = params["data_blocks"][str(op[1])]["0"]
                dkind, cin, cout, mdin, mdout = spec
                if dkind == "linear":
                    h = nn.linear(h, p)
                elif dkind == "fc":
                    h = _fc_block(p, h, emb, pol)
                elif dkind == "out":
                    seq = to_seq(h, mdin)          # (B, s, 1, C): norm over C
                    seq = nn.group_norm(seq, p["0"], eps=1e-5,
                                        norm_dtype=pol.norm_dtype)
                    seq = nn.silu(seq)
                    h = nn.linear(to_vec(seq), p["2"])
                cur_md[0] = mdout
            elif kind == "c":
                c_ch, nh, dh = self.context_specs[op[1]]
                seq = to_seq(h, cur_md[0])
                seq = blocks.spatial_transformer(
                    params["context_blocks"][str(op[1])]["0"], seq, context,
                    nh, pol, self_attn_fn=self_attn_fn)
                h = to_vec(seq)
            elif kind == "save":
                hs.append((h, cur_md[0]))
            elif kind == "load":
                skip, md = hs.pop()
                # concat along C of the [C, s] multidim layout (C-major flat)
                c, s = cur_md[0]
                cs, ss = md
                assert s == ss
                h = jnp.concatenate(
                    [h.reshape(-1, c, s), skip.reshape(-1, cs, s)],
                    axis=1).reshape(-1, (c + cs) * s)
                cur_md[0] = (c + cs, s)
            return h

        hs = []
        for op in self.i_ops:
            h = run(op, h, hs)
        for op in self.m_ops:
            h = run(op, h, hs)
        for op in self.o_ops:
            h = run(op, h, hs)
        return h
