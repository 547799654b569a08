"""Token merging (ToMe) for the UNet's long spatial self-attention.

Implements the ToMe-for-SD recipe (Bolya & Hoffman, "Token Merging for
Fast Stable Diffusion", 2023 — public technique; no reference-repo
counterpart) re-designed for the TPU/JAX serving path:

- **Where**: wrapped around ``self_attn_fn`` only — attention is the
  quadratic term (PARITY.md round-2 attribution: 56 ms of the 150 ms CFG
  step at b16; the ds1 padded-matmul floor dominates). Projections/FF stay
  full-length, like tomesd's default (merge_attn=True, merge_mlp=False).
- **Metric**: attention *keys* (heads concatenated), the original ToMe
  metric — available inside the attention wrapper with no model plumbing,
  unlike tomesd's block-input metric.
- **Matching**: bipartite soft matching with a 2-D strided dst set (one
  dst token per sx*sy cell), cosine similarity, top-r src tokens merged
  into their most-similar dst by mean. All shapes static: r is a trace
  constant, so the whole thing jits into the DDIM scan.
- **TPU mapping**: the value merge is a one-hot assignment MATMUL (MXU)
  built from a cheap scalar scatter — not a big gather/scatter of
  activations, which XLA lowers to serialized HBM scatter ops.

Output-changing: opt-in, SSIM-gated vs the torch-fp32 reference output
(tools/e2e_gate.py variants) exactly like encoder propagation and int8.

Reference hot path this accelerates: lib/model_zoo/attention.py:159-225
(CrossAttention.forward self-attention) via ddim.py:145-150.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _partition(h, w, sx, sy, ox, oy):
    """Static src/dst index split of a row-major h*w token grid: dst = one
    token per sx*sy cell (at offset (ox, oy)), src = the rest."""
    idx = np.arange(h * w)
    rows, cols = idx // w, idx % w
    dst_mask = (rows % sy == oy) & (cols % sx == ox)
    return (np.flatnonzero(~dst_mask).astype(np.int32),
            np.flatnonzero(dst_mask).astype(np.int32))


def compute_merge(metric, h, w, r, *, sx=2, sy=2, ox=0, oy=0):
    """Build merge/unmerge closures from a (B, S, C) similarity metric.

    Returns (merge, unmerge): ``merge(x)`` maps (B, S, C') -> (B, S-r, C')
    where the first Sd rows are the (mean-merged) dst tokens and the rest
    are the kept src tokens; ``unmerge(y)`` maps back to (B, S, C') with
    merged src positions receiving their dst group's row.
    """
    B, S, _ = metric.shape
    assert S == h * w, (S, h, w)
    src_idx, dst_idx = _partition(h, w, sx, sy, ox, oy)
    Sd, Ss = len(dst_idx), len(src_idx)
    r = min(r, Ss)

    m = metric.astype(jnp.float32)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-6)
    a = m[:, src_idx]                                    # (B, Ss, C)
    bm = m[:, dst_idx]                                   # (B, Sd, C)
    scores = jnp.einsum("bsc,bdc->bsd", a, bm)           # (B, Ss, Sd)
    node_max = jnp.max(scores, axis=-1)                  # (B, Ss)
    node_idx = jnp.argmax(scores, axis=-1)               # (B, Ss) dst slot
    order = jnp.argsort(-node_max, axis=-1)              # most similar first
    merged = order[:, :r]                                # (B, r)
    kept = order[:, r:]                                  # (B, Ss-r)
    tgt = jnp.take_along_axis(node_idx, merged, axis=1)  # (B, r)

    # one-hot assignment built by a scalar scatter (B*r writes), so the
    # activation merge below is a single MXU matmul instead of an HBM
    # scatter of (B, r, C) rows
    bgrid = jnp.arange(B)[:, None]
    assign = jnp.zeros((B, Sd, Ss), jnp.bfloat16)
    assign = assign.at[bgrid, tgt, jnp.take_along_axis(
        jnp.broadcast_to(jnp.arange(Ss)[None], (B, Ss)), merged, axis=1)
    ].set(1)
    counts = 1.0 + jnp.sum(assign.astype(jnp.float32), axis=-1)  # (B, Sd)

    def merge(x):
        src = x[:, src_idx]
        dst = x[:, dst_idx]
        summed = dst + jnp.einsum(
            "bds,bsc->bdc", assign.astype(x.dtype), src)  # 0/1 exact in bf16
        dst_m = (summed.astype(jnp.float32)
                 / counts[..., None]).astype(x.dtype)
        kept_vals = jnp.take_along_axis(src, kept[..., None], axis=1)
        return jnp.concatenate([dst_m, kept_vals], axis=1)

    # token sizes of the merged sequence (dst groups first, then kept srcs)
    merge.sizes = jnp.concatenate(
        [counts, jnp.ones((B, Ss - r), jnp.float32)], axis=1)

    # unmerge as ONE coalesced row gather: build an int32 position->row map
    # with scalar scatters (B*S writes), then take_along_axis — XLA row
    # scatters of (B, r, C) activations serialize on the TPU, row gathers
    # vectorize.
    src_pos = jnp.asarray(src_idx)
    row_map = jnp.zeros((B, S), jnp.int32)
    row_map = row_map.at[:, dst_idx].set(jnp.arange(Sd)[None])
    row_map = row_map.at[bgrid, src_pos[kept]].set(
        Sd + jnp.arange(Ss - r)[None] + jnp.zeros((B, 1), jnp.int32))
    row_map = row_map.at[bgrid, src_pos[merged]].set(tgt)

    def unmerge(y):
        return jnp.take_along_axis(y, row_map[..., None], axis=1)

    return merge, unmerge


def make_tome_attn(inner, hw, *, ratio=0.5, min_s=4096, sx=2, sy=2,
                   prop_attn=True):
    """Wrap a (q, k, v) -> out self-attention fn with token merging.

    hw: the (h, w) token grid this wrapper targets (the ds1 latent grid);
    sequences whose length differs from h*w — or is below min_s — pass
    through unmerged (ds2/ds4 attention is cheap; see PARITY attribution).
    ratio: fraction of ALL tokens merged away (0.5 halves the sequence).

    prop_attn: size-proportional attention (each merged key weighted by its
    group size, the original-ToMe correction that makes duplicate-merging
    exact) implemented WITHOUT kernel support: append a ones-column to q
    and ``log(size) * sqrt(D+1)`` to k, so the inner fn's own
    ``1/sqrt(D+1)`` scaling yields ``q.k/sqrt(D) + log(size)`` exactly
    (q is pre-scaled by sqrt((D+1)/D)). The extra column is free on the
    TPU — head dims pad to the 128-lane MXU width regardless.
    """
    h, w = hw
    r = int(h * w * ratio)

    def attn(q, k, v):
        B, H, S, D = q.shape
        if S != h * w or S < min_s or r <= 0:
            return inner(q, k, v)
        # metric: keys, heads concatenated -> (B, S, H*D)
        metric = k.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        merge, unmerge = compute_merge(metric, h, w, r, sx=sx, sy=sy)

        # q|k|v merged in ONE pass (one assignment matmul + one gather over
        # a 3*H*D-wide activation instead of three)
        qkv = jnp.concatenate(
            [x.transpose(0, 2, 1, 3).reshape(B, S, H * D) for x in (q, k, v)],
            axis=-1)
        qkvm = merge(qkv).reshape(B, S - r, 3, H, D).transpose(2, 0, 3, 1, 4)
        qm, km, vm = qkvm[0], qkvm[1], qkvm[2]
        if prop_attn:
            Sm = S - r
            ones = jnp.ones((B, H, Sm, 1), qm.dtype)
            logsz = jnp.log(merge.sizes) * np.sqrt(D + 1.0)
            logsz = jnp.broadcast_to(
                logsz[:, None, :, None], (B, H, Sm, 1)).astype(km.dtype)
            qm = jnp.concatenate(
                [qm * float(np.sqrt((D + 1.0) / D)), ones], -1)
            km = jnp.concatenate([km, logsz], -1)
            vm = jnp.concatenate([vm, jnp.zeros((B, H, Sm, 1), vm.dtype)], -1)
        out = inner(qm, km, vm)
        if prop_attn:
            out = out[..., :D]
        out = unmerge(out.transpose(0, 2, 1, 3).reshape(B, S - r, H * D))
        return out.reshape(B, S, H, D).transpose(0, 2, 1, 3)

    return attn
