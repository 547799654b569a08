"""KV-pooled self-attention for turbo REUSE steps.

At the promoted phased schedule the key steps are few (6 of 50) and the
reuse steps — conditional-half-only, ds1-level-only under DeepCache — are
dominated by the s=4096, d=40 self-attention (PARITY round-2 attribution:
the d=40 head pads to the 128-lane MXU, a hard 31% ceiling, and the fp32
online-softmax VPU chain serializes with the dots). Average-pooling K and V
over pool x pool spatial cells cuts BOTH terms by pool^2: the logits matmul
shrinks s x s -> s x s/p^2 and the softmax rows shrink the same way, while
Q (and the output length) stay full-resolution.

This is the spatial KV-compression idea from PixArt-Sigma (arXiv:2403.04692
§2.2, "KV token compression" — public technique; no reference-repo
counterpart), applied here ONLY on turbo reuse steps: key steps keep exact
attention, so the approximation lives exactly where the turbo stack already
approximates (cached skips, extrapolated guidance). All-equal group sizes
make plain softmax over pooled keys the size-proportional-correct
approximation (the uniform log(p^2) logit offset cancels in softmax).

Output-changing: opt-in (`reuse_self_attn_fn` on the sampler,
BENCH_KVPOOL, pipeline `kv_pool`), SSIM-gated on both regimes like every
other turbo (tools/{quant_gate,e2e_gate}.py `_kv2` variants).

Reference hot path this accelerates: lib/model_zoo/attention.py:159-225
(CrossAttention.forward self-attention) via ddim.py:145-150.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_kvpool_attn(inner, hw, *, pool=2, min_s=4096):
    """Wrap a (q, k, v) -> out self-attention fn with pool x pool KV pooling.

    hw: the (h, w) token grid this wrapper targets (the ds1 latent grid);
    sequences whose length differs from h*w — or is below min_s — pass
    through to ``inner`` unpooled (ds2/ds4 attention is cheap, and context
    cross-attention has its own resident-KV kernel). The pooled path rides
    that same short-KV kernel (ops/flash_attention.cross_attention): K/V
    resident in VMEM, one pass over Q.
    """
    h, w = hw

    def attn(q, k, v):
        B, H, S, D = q.shape
        if pool <= 1 or S != h * w or S < min_s or h % pool or w % pool:
            return inner(q, k, v)

        def pool2d(x):
            xs = x.reshape(B, H, h // pool, pool, w // pool, pool, D)
            return xs.astype(jnp.float32).mean(axis=(3, 5)) \
                .astype(x.dtype).reshape(B, H, S // pool ** 2, D)

        from pfd_tpu.ops.flash_attention import cross_attention
        return cross_attention(q, pool2d(k), pool2d(v))

    return attn
