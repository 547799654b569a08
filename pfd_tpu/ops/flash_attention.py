"""Pallas flash attention for TPU — the UNet/VAE spatial self-attention kernel.

Stands in for the reference's optional xformers memory-efficient attention
(attention.py:10-15, 285): non-causal, no dropout, fp32 online softmax,
bf16-friendly. Latent self-attention sequences run 256..36,864 tokens
(SURVEY §5), so K/V are streamed in blocks with the online-softmax recurrence
instead of materializing the (S, S) logits in HBM.

The SD-1.5 UNet's head dim is small (40/80/160), so the MXU matmuls are
lane-padded and the kernel is VPU-bound on the softmax elementwise passes.
Three measured optimizations keep VPU work to two passes over the logits
(max, exp) per block:

- q is pre-scaled by ``scale * log2(e)`` outside the kernel (removes a full
  (bq, bk) multiply per block — scale cost moves to (s, d)) and the softmax
  runs in base 2: ``exp(s*scale) == exp2(s*scale*log2e)``, so the kernel
  issues the VPU's native ``exp2`` without the per-element ln2 multiply the
  ``exp`` lowering needs;
- the softmax denominator ``l`` rides the PV matmul as a ones-column
  appended to v in the lane padding (free whenever d % 128 != 0, i.e. all
  UNet heads) instead of a separate VPU row-sum;
- padded-key masking is emitted only when the sequence actually pads
  (s % block != 0), so the common power-of-two shapes skip it entirely.

Block sizes default to (2048, 2048), which the VMEM clamp below turns into
(1024, 2048) at the UNet head dims — the best of the measured sweeps
(bh=64: 3.59 ms vs 3.75 for (2048,1024) vs 12.9 for (1024,1024)-pipelined;
tools/attn_lab.py re-runs them) — and into (1024, 1024) at the VAE's
d=512 head. A software-pipelined variant
(``pipelined=True``: QK^T of kv-block j issued before the softmax of block
j-1, ping-pong logits scratch) measured consistently SLOWER (10.7 vs 9.07
at the default blocks) — Mosaic serializes the predicated stages rather
than overlapping MXU/VPU across them; kept as a tested negative result.

Layout: (B, H, S, D) -> flattened (B*H, S, D). D is zero-padded to the 128
lane width (exact: zero key columns don't change q·k, zero value columns are
sliced off). Sequence is zero-padded to the block size with -inf masking of
padded keys.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  s_valid, s_pad, bk, d_valid, fused_l):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if not fused_l:
            l_scr[:] = jnp.zeros_like(l_scr)

    q = q_ref[0]                       # (bq, d_pad), pre-scaled by 1/sqrt(d)
    k = k_ref[0]                       # (bk, d_pad)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    # mask padded keys (padding is to s_pad = round_up(s, max(bq, bk)); only
    # emitted when padding exists — power-of-two sequences skip the pass)
    if s_pad != s_valid:
        first_key = j * bk
        key_ids = first_key + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < s_valid, s, NEG_INF)

    m_prev = m_scr[:, :1]              # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)   # q pre-scaled by scale*log2e
    p = jnp.exp2(s - m_new)            # (bq, bk)

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    if not fused_l:
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nk - 1)
    def _():
        if fused_l:
            l = acc_scr[:, d_valid:d_valid + 1]
        else:
            l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


# the pipelined kernel's "nothing yet" sentinels: s_prev is initialized to
# S_EMPTY and m to M_EMPTY > S_EMPTY so that at the priming step
# p = exp2(S_EMPTY - M_EMPTY) flushes to 0 and alpha = exp2(0) = 1 — a
# single NEG_INF for both would cancel to exp2(0) = 1 and poison acc.
S_EMPTY = -1e30
M_EMPTY = -1e29


def _flash_kernel_pipe(q_ref, k_ref, v_ref, o_ref, s_scr, m_scr, l_scr,
                       acc_scr, *, s_valid, s_pad, bk, d_valid, fused_l):
    """Software-pipelined variant: the QK^T for kv-block j and the
    softmax+PV of block j-1 sit UNPREDICATED in the same instruction stream
    (no pl.when between them), so the scheduler is free to overlap the MXU
    dot with the VPU softmax passes. The kv grid runs one extra drain step;
    logits ping-pong through s_scr[2]; the priming step is made harmless by
    sentinel initialization (see S_EMPTY/M_EMPTY) instead of predication."""
    j = pl.program_id(2)
    nk = pl.num_programs(2) - 1

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, M_EMPTY)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        s_scr[1] = jnp.full_like(s_scr[1], S_EMPTY)
        if not fused_l:
            l_scr[:] = jnp.zeros_like(l_scr)

    # QK^T for block j (k index map clamps at the drain step; the result is
    # written to the ping-pong slot after the previous block is consumed, and
    # that slot is never read again on the drain step)
    s_new = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    if s_pad != s_valid:
        first_key = jnp.minimum(j, nk - 1) * bk
        key_ids = first_key + jax.lax.broadcasted_iota(jnp.int32, s_new.shape, 1)
        s_new = jnp.where(key_ids < s_valid, s_new, NEG_INF)

    # softmax + PV of block j-1 (sentinels make the j==0 pass a no-op:
    # p == 0, alpha == 1, v index map clamps to block 0)
    s = s_scr[(j + 1) % 2]
    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv
    if not fused_l:
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    s_scr[j % 2] = s_new

    @pl.when(j == nk)
    def _():
        if fused_l:
            l = acc_scr[:, d_valid:d_valid + 1]
        else:
            l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


INT_NEG = -(2 ** 30)
LOG2_127 = 6.988684686772166  # log2(127)


def _flash_kernel_pv8(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr, *,
                      s_valid, s_pad, bk, d_valid):
    """bf16 QK^T + int8 PV flash attention. The full-int8 kernel
    (_flash_kernel_int8) measured SLOWER than bf16 (4.31 vs 3.73 ms at the
    ds1 shape): its int->float convert and dequant-scale multiply on the
    (bq, bk) logits serialize with the MXU dots (Mosaic schedules kernel
    stages in program order). This variant adds ZERO elementwise ops over
    the logits: p127 = exp2(s - (m - log2 127)) reuses the existing
    subtract, the f32->int8 convert replaces the f32->bf16 one, and only
    the PV dot switches to the 394-TOPS int8 path. v is per-tensor int8
    with the denominator ones-column (value 1) riding in the lane padding;
    the 127 scaling cancels in the final acc/l division, leaving one sv
    multiply outside the kernel."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # (bq, d_pad), pre-scaled by scale*log2e
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    if s_pad != s_valid:
        first_key = j * bk
        key_ids = first_key + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < s_valid, s, NEG_INF)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    # p8 = round(127 * exp2(s - m_new)) in [0, 127]; the *127 rides the
    # existing subtract as -(m_new - log2 127). The +0.5 round is the one
    # extra logit-shaped op — truncation measured 29% max error on diffuse
    # attention (the summed truncated mass competes with the retained mass)
    p8 = (jnp.exp2(s - (m_new - LOG2_127)) + 0.5).astype(jnp.int8)

    pv = jax.lax.dot_general(p8, v_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    acc_scr[:] = acc_scr[:] * alpha + pv.astype(jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nk - 1)
    def _():
        l = acc_scr[:, d_valid:d_valid + 1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _flash_kernel_int8(q_ref, k_ref, v_ref, c_ref, o_ref, m_scr, acc_scr, *,
                       s_valid, s_pad, bk, d_valid):
    """int8 flash attention: QK^T and PV run as int8 x int8 -> int32 MXU dots
    (394 TOPS on the v5e — 2x the bf16 rate at the same d -> 128 lane
    padding, which is the measured 31%%-MFU floor of the bf16 kernel at the
    UNet's d=40 heads).

    q, k, v are per-tensor symmetric int8 (quantized outside); the combined
    dequant scale ``c = sq * sk * scale * log2(e)`` arrives via SMEM so the
    softmax runs directly on integer logits: ``p*127 = exp2((s_i32 - m_i32)
    * c + log2 127)``, rounded to int8 for the PV dot. The denominator rides
    the PV matmul as a ones-column in v8 (value 1), so ``l`` accumulates in
    the SAME p8 domain as the numerator — the 127 scaling and the p8
    rounding cancel exactly in the final division. Only the fp32 ``v`` scale
    remains, applied outside the kernel (one fused XLA multiply on (s, d))."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    c = c_ref[0]

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, INT_NEG)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)

    if s_pad != s_valid:
        first_key = j * bk
        key_ids = first_key + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < s_valid, s, INT_NEG)

    m_prev = m_scr[:, :1]                       # int32 (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2((m_prev - m_new).astype(jnp.float32) * c)
    # p8 = round(127 * exp2((s - m) * c)); in [0, 127] so the +0.5 truncating
    # convert is an exact round and needs no clip
    pf = (s - m_new).astype(jnp.float32) * c + LOG2_127
    p8 = (jnp.exp2(pf) + 0.5).astype(jnp.int8)

    pv = jax.lax.dot_general(p8, v_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    acc_scr[:] = acc_scr[:] * alpha + pv.astype(jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(j == nk - 1)
    def _():
        l = acc_scr[:, d_valid:d_valid + 1]     # sum of p8 via the ones-column
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "block_k", "pipelined",
                                    "pad_d", "quant"))
def flash_attention(q, k, v, *, scale=None, block_q=2048, block_k=2048,
                    pipelined=False, pad_d=True, quant=False):
    """q, k, v: (B, H, S, D) self-attention (Sq == Sk). Returns (B, H, S, D).

    pad_d=False skips the HBM materialization of the D -> 128 lane padding
    (Mosaic pads tiles internally instead) at the cost of the fused-l
    ones-column trick (a separate VPU row-sum tracks the denominator).

    quant=True runs QK^T and PV as int8 MXU dots (_flash_kernel_int8) with
    per-tensor symmetric quantization of q/k/v — opt-in, SSIM-gated
    (tools/e2e_gate.py); requires a lane-padded head dim (D %% 128 != 0,
    true for all UNet heads) for the denominator ones-column.
    """
    b, h, s, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if quant and d % 128 == 0:
        quant = False  # no lane padding to carry the l column; bf16 path

    bq = min(block_q, _round_up(s, 128))
    bk = min(block_k, _round_up(s, 128))
    d_pad = _round_up(d, 128) if pad_d else d
    # VMEM-budget clamp: (2048, 1024) wins at the UNet head dims (d_pad=128)
    # but blows the 16MB scoped VMEM at the VAE decoder's single 512-wide
    # head (s=4096, d=512 — measured OOM at 21.6M). Estimate logits + acc +
    # double-buffered q/k/v blocks and halve the larger block until it fits.
    def _vmem_est(bq_, bk_):
        return (4 * bq_ * bk_ + 4 * bq_ * d_pad
                + 2 * 2 * (bq_ + 2 * bk_) * d_pad)

    while _vmem_est(bq, bk) > 14 * 1024 * 1024 and max(bq, bk) > 512:
        if bq >= bk:
            bq //= 2
        else:
            bk //= 2
    s_pad = _round_up(s, max(bq, bk))

    if quant:
        from pfd_tpu.ops import quant as quant_lib

        mode = "full" if quant is True else quant
        assert mode in ("full", "pv"), quant
        d_pad = _round_up(d, 128)
        LOG2E = 1.4426950408889634
        v8, sv = quant_lib.quantize_act(v)
        interpret = jax.default_backend() == "cpu"

        def prep(x, dtype=None):
            x = x.reshape(b * h, s, d)
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - d)))
            return x if dtype is None else x.astype(dtype)

        # denominator ones-column: 1 in the p8 domain, valid rows only
        col = jnp.zeros((s_pad, d_pad), jnp.int8).at[:s, d].set(1)
        v8 = prep(v8) + col[None]

        if mode == "full":
            q8, sq = quant_lib.quantize_act(q)
            k8, sk = quant_lib.quantize_act(k)
            c = (sq * sk * jnp.float32(scale * LOG2E)).reshape(1)
            args = (prep(q8), prep(k8), v8, c)
            kernel = functools.partial(_flash_kernel_int8, s_valid=s,
                                       s_pad=s_pad, bk=bk, d_valid=d)
            in_specs = [
                pl.BlockSpec((1, bq, d_pad), lambda bh, i, j: (bh, i, 0)),
                pl.BlockSpec((1, bk, d_pad), lambda bh, i, j: (bh, j, 0)),
                pl.BlockSpec((1, bk, d_pad), lambda bh, i, j: (bh, j, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ]
            m_scratch = pltpu.VMEM((bq, 128), jnp.int32)
        else:  # pv: bf16 QK^T, int8 PV
            qf = prep(q * jnp.asarray(scale * LOG2E, q.dtype))
            args = (qf, prep(k), v8)
            kernel = functools.partial(_flash_kernel_pv8, s_valid=s,
                                       s_pad=s_pad, bk=bk, d_valid=d)
            in_specs = [
                pl.BlockSpec((1, bq, d_pad), lambda bh, i, j: (bh, i, 0)),
                pl.BlockSpec((1, bk, d_pad), lambda bh, i, j: (bh, j, 0)),
                pl.BlockSpec((1, bk, d_pad), lambda bh, i, j: (bh, j, 0)),
            ]
            m_scratch = pltpu.VMEM((bq, 128), jnp.float32)

        out = pl.pallas_call(
            kernel,
            grid=(b * h, s_pad // bq, s_pad // bk),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bq, d_pad), lambda bh, i, j: (bh, i, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d_pad), q.dtype),
            scratch_shapes=[
                m_scratch,
                pltpu.VMEM((bq, d_pad), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s_pad * s_pad * d_pad,
                bytes_accessed=(b * h * s_pad * d_pad) * 3,
                transcendentals=b * h * s_pad * s_pad,
            ),
            interpret=interpret,
        )(*args)
        out = out[:, :s, :d].astype(jnp.float32) * sv
        return out.astype(q.dtype).reshape(b, h, s, d)

    # the softmax denominator rides the PV matmul in the lane padding when
    # there is room (always true for the 40/80/160 UNet head dims)
    fused_l = d_pad > d

    def prep(x):
        x = x.reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - d)))

    LOG2E = 1.4426950408889634
    qf = prep(q * jnp.asarray(scale * LOG2E, q.dtype))
    kf, vf = prep(k), prep(v)
    if fused_l:
        # ones-column for valid rows only (padded rows must contribute 0)
        col = jnp.zeros((s_pad, d_pad), vf.dtype).at[:s, d].set(1.0)
        vf = vf + col[None]

    nk = s_pad // bk
    interpret = jax.default_backend() == "cpu"  # tests run on the CPU mesh
    common = dict(s_valid=s, s_pad=s_pad, bk=bk, d_valid=d, fused_l=fused_l)
    scratch = [
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, d_pad), jnp.float32),
    ]
    if pipelined:
        grid = (b * h, s_pad // bq, nk + 1)
        kernel = functools.partial(_flash_kernel_pipe, **common)
        # k_j on the compute step, v_{j-1} on the drain side (clamped)
        k_spec = pl.BlockSpec((1, bk, d_pad),
                              lambda bh, i, j: (bh, jnp.minimum(j, nk - 1), 0))
        v_spec = pl.BlockSpec((1, bk, d_pad),
                              lambda bh, i, j: (bh, jnp.maximum(j - 1, 0), 0))
        scratch = [pltpu.VMEM((2, bq, bk), jnp.float32)] + scratch
    else:
        grid = (b * h, s_pad // bq, nk)
        kernel = functools.partial(_flash_kernel, **common)
        k_spec = pl.BlockSpec((1, bk, d_pad), lambda bh, i, j: (bh, j, 0))
        v_spec = k_spec

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda bh, i, j: (bh, i, 0)),
            k_spec,
            v_spec,
        ],
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d_pad), q.dtype),
        scratch_shapes=scratch,  # acc is (bq, d_pad): unpadded when pad_d=False
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * d_pad,
            bytes_accessed=(b * h * s_pad * d_pad * 2) * 4,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    return out[:, :s, :d].reshape(b, h, s, d)


def _cross_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_valid, kv_pad):
    """One pass: kv is fully VMEM-resident (148 tokens ~ 12 KB), q streams.
    No online-softmax recurrence — the full row of logits fits in registers."""
    q = q_ref[0]                      # (bq, d_pad), pre-scaled by scale*log2e
    s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_pad != kv_valid:
        ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(ids < kv_valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def cross_attention(q, k, v, *, scale=None, block_q=2048):
    """Short-KV attention (the UNet's context cross-attention: 148 tokens).

    The XLA path costs 1.2 ms per ds1 block at b16 (5.2% MFU — the (S, 148)
    logits round-trip HBM); with kv resident in VMEM this is one kernel and
    one pass over q. q: (B, H, Sq, D); k, v: (B, H, Skv, D), Skv small.
    """
    b, h, s, d = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    bq = min(block_q, _round_up(s, 128))
    s_pad = _round_up(s, bq)
    d_pad = _round_up(d, 128)
    kv_pad = _round_up(skv, 128)

    LOG2E = 1.4426950408889634
    qf = q.reshape(b * h, s, d) * jnp.asarray(scale * LOG2E, q.dtype)
    qf = jnp.pad(qf, ((0, 0), (0, s_pad - s), (0, d_pad - d)))
    kf = jnp.pad(k.reshape(b * h, skv, d),
                 ((0, 0), (0, kv_pad - skv), (0, d_pad - d)))
    vf = jnp.pad(v.reshape(b * h, skv, d),
                 ((0, 0), (0, kv_pad - skv), (0, d_pad - d)))

    kernel = functools.partial(_cross_kernel, kv_valid=skv, kv_pad=kv_pad)
    interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kernel,
        grid=(b * h, s_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d_pad), lambda bh, i: (bh, i, 0)),
            pl.BlockSpec((1, kv_pad, d_pad), lambda bh, i: (bh, 0, 0)),
            pl.BlockSpec((1, kv_pad, d_pad), lambda bh, i: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d_pad), lambda bh, i: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * kv_pad * d_pad,
            bytes_accessed=b * h * s_pad * d_pad * 2 * 2,
            transcendentals=b * h * s_pad * kv_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :s, :d].reshape(b, h, s, d)


def cross_attn_fn(q, k, v, *, min_seq=1024, max_kv=512):
    """Drop-in for short-KV cross-attention: Pallas kernel for long q over a
    VMEM-resident kv, plain XLA attention otherwise."""
    from pfd_tpu.ops import nn

    if q.shape[2] >= min_seq and k.shape[2] <= max_kv:
        return cross_attention(q, k, v)
    return nn.dot_product_attention(q, k, v)


def self_attn_fn(q, k, v, *, min_seq=1024):
    """Drop-in for ops.nn.dot_product_attention on self-attention: flash for
    long sequences, plain XLA attention for short ones.

    Block/pad defaults follow the round-4 pad_d sweep at the serving shapes
    (tools/attn_lab.py pad_sweep, TPU 2026-08-19): at d<=64 (the UNet's
    lane-padded d=40 heads) skipping the HBM lane-pad materialization wins —
    B=8 s=4096: 3.626 ms (1024,1024,nopad) vs 3.976 (1024,2048,padd);
    B=16: 7.788 ms (1024,2048,nopad) vs 8.301 padd — while at d=80
    (s=1024) pad_d=True is 2x faster (0.201 vs 0.393), so wide heads keep
    the padded fused-l path. Lossless either way (both paths are exact,
    tests/test_flash_attention.py)."""
    from pfd_tpu.ops import nn

    if q.shape[2] >= min_seq and q.shape[2] == k.shape[2]:
        if q.shape[3] <= 64:
            bk = 2048 if q.shape[0] >= 16 else 1024
            return flash_attention(q, k, v, block_q=1024, block_k=bk,
                                   pad_d=False)
        return flash_attention(q, k, v)
    return nn.dot_product_attention(q, k, v)


def self_attn_fn_int8(q, k, v, *, min_seq=1024, mode="pv"):
    """int8 variant of :func:`self_attn_fn` — PV (and optionally QK^T) on
    the 394-TOPS int8 MXU path. Opt-in for the int8 serving mode;
    SSIM-gated end-to-end (tools/e2e_gate.py) like the conv path. Default
    mode "pv": the full-int8 kernel measured slower (see _flash_kernel_pv8
    docstring)."""
    from pfd_tpu.ops import nn

    if q.shape[2] >= min_seq and q.shape[2] == k.shape[2]:
        return flash_attention(q, k, v, quant=mode)
    return nn.dot_product_attention(q, k, v)
