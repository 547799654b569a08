"""Flash attention kernel vs plain XLA attention (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfd_tpu.ops import nn
from pfd_tpu.ops.flash_attention import flash_attention
from tests.ref_utils import assert_close


@pytest.mark.parametrize("s,d", [(256, 40), (520, 80), (1024, 64),
                                 (520, 128)])  # d=128: separate-l path
def test_flash_matches_xla(s, d):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 3, s, d), jnp.float32)
    k = jax.random.normal(kk, (2, 3, s, d), jnp.float32)
    v = jax.random.normal(kv, (2, 3, s, d), jnp.float32)

    want = nn.dot_product_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128)
    assert_close(got, want, rtol=2e-3, atol=2e-4, name=f"flash s={s} d={d}")


def test_flash_bf16():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 2, 384, 40), jnp.bfloat16)
    want = nn.dot_product_attention(q, q, q)
    got = flash_attention(q, q, q, block_q=128, block_k=128)
    assert_close(np.asarray(got, np.float32), np.asarray(want, np.float32),
                 rtol=3e-2, atol=3e-2, name="flash bf16")


@pytest.mark.parametrize("s,d", [(256, 40), (520, 80), (520, 128)])
def test_flash_pipelined_matches_xla(s, d):
    """Software-pipelined kernel (QK^T of block j overlapped with softmax of
    block j-1) must match the plain online-softmax kernel and XLA."""
    key = jax.random.PRNGKey(2)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 3, s, d), jnp.float32)
    k = jax.random.normal(kk, (2, 3, s, d), jnp.float32)
    v = jax.random.normal(kv, (2, 3, s, d), jnp.float32)

    want = nn.dot_product_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, pipelined=True)
    assert_close(got, want, rtol=2e-3, atol=2e-4,
                 name=f"flash pipelined s={s} d={d}")


@pytest.mark.parametrize("s,skv,d", [(1024, 148, 40), (520, 77, 80),
                                     (1024, 148, 128)])
def test_cross_attention_matches_xla(s, skv, d):
    """Resident-KV cross-attention kernel vs XLA (kv=148 exercises the
    non-128-multiple kv masking)."""
    from pfd_tpu.ops.flash_attention import cross_attention
    key = jax.random.PRNGKey(3)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 3, s, d), jnp.float32)
    k = jax.random.normal(kk, (2, 3, skv, d), jnp.float32)
    v = jax.random.normal(kv_, (2, 3, skv, d), jnp.float32)
    want = nn.dot_product_attention(q, k, v)
    got = cross_attention(q, k, v, block_q=256)
    assert_close(got, want, rtol=2e-3, atol=2e-4, name=f"cross s={s} kv={skv}")


def test_flash_unpadded_d():
    """pad_d=False path (no HBM lane-padding; separate-l) matches XLA."""
    key = jax.random.PRNGKey(4)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 3, 256, 40), jnp.float32)
    k = jax.random.normal(kk, (2, 3, 256, 40), jnp.float32)
    v = jax.random.normal(kv_, (2, 3, 256, 40), jnp.float32)
    want = nn.dot_product_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, pad_d=False)
    assert_close(got, want, rtol=2e-3, atol=2e-4, name="flash pad_d=False")


@pytest.mark.parametrize("s,d", [(256, 40), (520, 80)])
@pytest.mark.parametrize("mode", [True, "pv"])
def test_flash_int8_close_to_float(s, d, mode):
    """int8 QK^T/PV kernel (quant=True): per-tensor int8 q/k/v with the
    integer-domain online softmax must track float attention to quantization
    tolerance (the serving-quality bound is the e2e SSIM gate, not this)."""
    key = jax.random.PRNGKey(5)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 3, s, d), jnp.float32)
    k = jax.random.normal(kk, (2, 3, s, d), jnp.float32)
    v = jax.random.normal(kv_, (2, 3, s, d), jnp.float32)

    want = np.asarray(nn.dot_product_attention(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     quant=mode))
    err = np.abs(got - want)
    scale = np.abs(want).max()
    assert err.max() / scale < 0.08, (err.max(), scale)
    assert err.mean() / scale < 0.01, (err.mean(), scale)
    # d % 128 == 0 falls back to the bf16 kernel (no room for the l column)
    q128 = jax.random.normal(kq, (1, 2, 256, 128), jnp.float32)
    got128 = flash_attention(q128, q128, q128, block_q=128, block_k=128,
                             quant=True)
    assert np.isfinite(np.asarray(got128)).all()


def test_flash_768sq_serving_shape():
    """The 768^2 ds1 serving shape (s = (768/8)^2 = 9216 tokens, d=40) at the
    serving block sizes — backs the resolution-range contract
    (/root/reference/app.py:197-207: 512-1536 px) beyond the 1024-token
    envelope the small cases cover. pad_d=False is the d<=64 serving default
    (PARITY pad_d sweep)."""
    key = jax.random.PRNGKey(6)
    q = jax.random.normal(key, (1, 2, 9216, 40), jnp.float32)
    want = nn.dot_product_attention(q, q, q)
    got = flash_attention(q, q, q, block_q=1024, block_k=1024, pad_d=False)
    assert_close(got, want, rtol=2e-3, atol=2e-4, name="flash s=9216 d=40")


@pytest.mark.slow
def test_flash_1536sq_envelope():
    """The claimed 36,864-token envelope (1536^2 / 8^2 ds1 tokens): flash at
    serving blocks vs a streamed float64 online-softmax reference (the plain
    XLA reference would need a 5.4 GB logits tensor)."""
    rng = np.random.default_rng(7)
    s, d = 36864, 40
    q = rng.standard_normal((1, 1, s, d), dtype=np.float32)
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(q),
                                     jnp.asarray(q),
                                     block_q=1024, block_k=1024, pad_d=False))
    qf = q[0, 0].astype(np.float64) * (d ** -0.5)
    kf = q[0, 0].astype(np.float64)
    want = np.empty((s, d))
    for i in range(0, s, 2304):
        logits = qf[i:i + 2304] @ kf.T
        logits -= logits.max(axis=1, keepdims=True)
        p = np.exp(logits)
        want[i:i + 2304] = (p @ kf) / p.sum(axis=1, keepdims=True)
    err = np.abs(got[0, 0] - want)
    assert err.max() < 2e-4, err.max()
