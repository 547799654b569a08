"""int8 quantization path: ops/quant.py + the kernel_q branches in ops/nn.py."""

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu.ops import nn
from pfd_tpu.ops import quant


def test_weight_roundtrip_error():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 3, 64, 128), jnp.float32) * 0.1
    q, s = quant.quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (128,)
    back = q.astype(jnp.float32) * s
    # symmetric int8: error bounded by scale/2 per element
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(s)[None, None, None, :] * 0.5 + 1e-8
    assert (err <= bound).all()


def test_linear_int8_close_to_fp():
    key = jax.random.PRNGKey(1)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (32, 256), jnp.float32)
    p = nn.init_linear(kw, 256, 512, jnp.float32)
    want = nn.linear(x, p)
    # quantize_params leaves 2-D kernels alone (int8 dots lose on the v5e);
    # quantize explicitly to exercise the kernel_q branch of nn.linear
    q, s = quant.quantize_weight(p["kernel"])
    pq = {"kernel_q": q, "kernel_scale": s, "bias": p["bias"]}
    got = nn.linear(x, pq)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel


def test_conv_int8_close_to_fp():
    key = jax.random.PRNGKey(2)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (2, 16, 16, 64), jnp.float32)
    p = nn.init_conv(kw, 3, 3, 64, 64, jnp.float32)
    want = nn.conv2d(x, p, padding=1)
    got = nn.conv2d(x, quant.quantize_params(p), padding=1)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel


def test_fused_linear_int8():
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (8, 128), jnp.float32)
    ps = [nn.init_linear(k, 128, 128, jnp.float32, bias=False) for k in ks[1:]]
    want = jnp.concatenate([nn.linear(x, p) for p in ps], axis=-1)
    qs = []
    for p in ps:
        q, s = quant.quantize_weight(p["kernel"])
        qs.append({"kernel_q": q, "kernel_scale": s})
    got = nn.fused_linear(x, qs)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel
    # unquantized path unchanged
    got_fp = nn.fused_linear(x, ps)
    np.testing.assert_allclose(np.asarray(got_fp), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_quantize_params_walk_skips():
    key = jax.random.PRNGKey(4)
    tree = {
        "big": nn.init_conv(key, 3, 3, 128, 128, jnp.float32),
        "small": nn.init_conv(key, 3, 3, 4, 320, jnp.float32),   # cin < 64
        "lin": nn.init_linear(key, 128, 128, jnp.float32),       # 2-D: bf16
        "one": nn.init_conv(key, 1, 1, 128, 128, jnp.float32),   # 1x1: bf16
        "zero": nn.init_conv(key, 3, 3, 128, 128, jnp.float32, zero=True),
        "norm": nn.init_norm(128),
    }
    out = quant.quantize_params(tree)
    assert "kernel_q" in out["big"] and "kernel" not in out["big"]
    assert "kernel" in out["small"] and "kernel_q" not in out["small"]
    assert "kernel" in out["lin"] and "kernel" in out["one"]   # dots stay bf16
    # zero-init kernels quantize exactly to zero (structure stays uniform
    # between fresh-init and loaded checkpoints -> no recompile on hot-swap)
    assert "kernel_q" in out["zero"]
    assert not np.asarray(out["zero"]["kernel_q"]).any()
    assert set(out["norm"]) == {"scale", "bias"}
    # dequantize restores a kernel-form tree
    back = quant.dequantize_params(out)
    assert "kernel" in back["big"]
    rel = float(jnp.linalg.norm(back["big"]["kernel"] - tree["big"]["kernel"])
                / jnp.linalg.norm(tree["big"]["kernel"]))
    assert rel < 0.01


def test_unet_forward_int8_close():
    """Whole tiny UNet: quantized params vs fp32, cosine similarity gate."""
    from pfd_tpu import registry
    from tests import ref_utils

    unet_cfg = {"type": "openai_unet_2d_next",
                "args": dict(in_channels=4, out_channels=4, model_channels=64,
                             attention_resolutions=[1, 2],
                             num_res_blocks=1, channel_mult=[1, 2],
                             num_heads=4, context_dim=96)}
    model = registry.get(unet_cfg["type"])(**unet_cfg["args"])
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    t = jnp.asarray([3, 500], jnp.int32)
    c = jnp.asarray(rng.standard_normal((2, 12, 96)), jnp.float32)

    want = model.apply(params, x, t, c)
    got = model.apply(quant.quantize_params(params), x, t, c)
    wantf = np.asarray(want, np.float64).ravel()
    gotf = np.asarray(got, np.float64).ravel()
    cos = float(wantf @ gotf / (np.linalg.norm(wantf) * np.linalg.norm(gotf)))
    assert cos > 0.995, cos


def test_quantize_act_strided_amax():
    """PFD_ACT_AMAX_STRIDE>1: abs-max from a spatial subsample. The scale
    may only shrink (missed outliers), never grow; quantized output stays
    within clipping of the exact-scale path."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    x8, s = quant.quantize_act(x)
    old = quant._AMAX_STRIDE
    try:
        quant._AMAX_STRIDE = 4
        x8s, ss = quant.quantize_act(x)
    finally:
        quant._AMAX_STRIDE = old
    assert float(ss) <= float(s) * (1 + 1e-6)
    # dequantized results agree to within the (coarser) quant step + clip
    err = np.abs(np.asarray(x8s, np.float32) * float(ss)
                 - np.asarray(x8, np.float32) * float(s))
    inlier = np.abs(np.asarray(x)) <= 127.0 * float(ss)
    assert err[np.asarray(inlier)].max() <= float(s) + float(ss)
    # tiny spatial tensors (below 2*stride) fall back to the exact reduce
    y = jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)
    try:
        quant._AMAX_STRIDE = 4
        _, sy = quant.quantize_act(y)
    finally:
        quant._AMAX_STRIDE = old
    np.testing.assert_allclose(float(sy), float(quant.quantize_act(y)[1]))
