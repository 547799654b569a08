"""Token merging (ops/tome.py) — structural invariants + approximation.

ToMe is a public technique (Bolya & Hoffman 2023) with no reference-repo
counterpart, so there is no torch parity target; correctness here means
the merge/unmerge algebra is right and the wrapped attention converges to
exact attention as the merge set degenerates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu.ops import tome
from pfd_tpu.ops import nn


def _sdpa(q, k, v):
    return nn.dot_product_attention(q, k, v, softmax_dtype=jnp.float32)


def test_partition_disjoint_cover():
    src, dst = tome._partition(8, 8, 2, 2, 0, 0)
    assert len(src) + len(dst) == 64
    assert len(dst) == 16
    assert set(src) | set(dst) == set(range(64))
    assert set(src) & set(dst) == set()
    # dst = every (even row, even col) in row-major order
    assert all((i // 8) % 2 == 0 and (i % 8) % 2 == 0 for i in dst)


def test_merge_unmerge_identity_roundtrip():
    """With identity 'attention', every kept token round-trips exactly and
    every merged src position lands on its dst group's (mean) row."""
    h = w = 8
    S = h * w
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, S, 16)), jnp.float32)
    r = 24
    merge, unmerge = tome.compute_merge(x, h, w, r)
    y = unmerge(merge(x))
    assert y.shape == x.shape
    # exactly S - r distinct rows survive per batch element
    for b in range(2):
        uniq = np.unique(np.asarray(y[b]).round(5), axis=0)
        assert len(uniq) == S - r
    # positions that were kept (not merged, not dst) must be bit-identical
    src_idx, dst_idx = tome._partition(h, w, 2, 2, 0, 0)
    same = np.isclose(np.asarray(y), np.asarray(x), atol=1e-6).all(-1)
    # at least the kept srcs survive untouched: S - r - len(dst) of them
    # (dst rows change only if something merged into them)
    assert same.sum(axis=-1).min() >= len(src_idx) - r


def test_r_zero_passthrough():
    q = jnp.asarray(np.random.default_rng(1).standard_normal((1, 2, 64, 8)),
                    jnp.float32)
    attn = tome.make_tome_attn(_sdpa, (8, 8), ratio=0.0, min_s=1)
    np.testing.assert_allclose(np.asarray(attn(q, q, q)),
                               np.asarray(_sdpa(q, q, q)), rtol=1e-6)


def test_shape_mismatch_passthrough():
    """Sequences that are not the target grid (ds2 etc.) pass through."""
    q = jnp.asarray(np.random.default_rng(2).standard_normal((1, 2, 16, 8)),
                    jnp.float32)
    attn = tome.make_tome_attn(_sdpa, (8, 8), ratio=0.5, min_s=1)
    np.testing.assert_allclose(np.asarray(attn(q, q, q)),
                               np.asarray(_sdpa(q, q, q)), rtol=1e-6)


def test_wrapped_attention_approximates_full():
    """Tokens drawn from a few clusters: merging mostly removes duplicates,
    so ToMe attention stays close to exact attention."""
    h = w = 8
    S = h * w
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 4, 8))          # 8 clusters, H=4, D=8
    assign = rng.integers(0, 8, S)
    toks = centers[assign] + 0.01 * rng.standard_normal((S, 4, 8))
    q = jnp.asarray(toks.transpose(1, 0, 2)[None], jnp.float32)  # (1,4,S,8)
    attn = tome.make_tome_attn(_sdpa, (h, w), ratio=0.4, min_s=1)
    out = np.asarray(attn(q, q, q))
    ref = np.asarray(_sdpa(q, q, q))
    # not exact (no proportional attention, by design — tomesd default),
    # but must be strongly correlated and close
    err = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert err < 0.05, err


def test_jit_and_grad_free_shapes():
    """The wrapper must jit with static shapes (scan-compatible)."""
    h = w = 8
    q = jnp.asarray(np.random.default_rng(4).standard_normal((2, 2, 64, 8)),
                    jnp.float32)
    attn = jax.jit(tome.make_tome_attn(_sdpa, (h, w), ratio=0.5, min_s=1))
    out = attn(q, q, q)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_tome_flash_composition():
    """ToMe wrapping the real Pallas flash kernel (interpret mode on CPU):
    the prop-attn head-dim augmentation (d -> d+1) must agree with the
    exact-attention inner fn within bf16 rounding. Merged S' = 2048 stays
    above self_attn_fn's min_seq so the kernel path actually runs."""
    from pfd_tpu.ops.flash_attention import self_attn_fn

    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((1, 1, 4096, 8)), jnp.bfloat16)
    a_fl = tome.make_tome_attn(self_attn_fn, (64, 64), ratio=0.5)
    a_ex = tome.make_tome_attn(
        lambda x, y, z: nn.dot_product_attention(
            x, y, z, softmax_dtype=jnp.float32), (64, 64), ratio=0.5)
    of = np.asarray(a_fl(q, q, q), np.float32)
    oe = np.asarray(a_ex(q, q, q), np.float32)
    assert np.isfinite(of).all()
    assert np.abs(of - oe).max() < 0.05


def test_pipeline_tome_wiring():
    """tome_ratio wires through _sample_decode_fn without breaking the tiny
    pipeline (tiny latents are below min_s, so the wrapper passes through —
    this is a plumbing smoke, not a quality test)."""
    from pfd_tpu.pipeline import PromptFreeDiffusionPipeline
    from tests.test_pipeline_hotswap import TINY_PFD

    pipe = PromptFreeDiffusionPipeline(
        fp16=False, config_override=TINY_PFD, tag_ctx="SeeCoder",
        tag_diffuser="SD-v1.5", tag_ctl="canny", tome_ratio=0.5)
    pipe.ddim_steps = 2
    ref = np.random.default_rng(0).random((64, 64, 3), dtype=np.float32)
    out = pipe.action_inference(ref, None, "none", False, 64, 64, 2.0, 7)
    img = np.asarray(out[0])
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()


@pytest.mark.parametrize("hw", [(8, 12)])
def test_non_square_grid(hw):
    h, w = hw
    q = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, 2, h * w, 8)),
        jnp.float32)
    attn = tome.make_tome_attn(_sdpa, (h, w), ratio=0.3, min_s=1)
    out = attn(q, q, q)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()
