"""Primitive-op parity vs torch (CPU fp32)."""

import jax.numpy as jnp
import numpy as np

from pfd_tpu.ops import nn as pnn
from tests import ref_utils
from tests.ref_utils import assert_close


def test_group_norm_matches_torch():
    import torch

    ref_utils.seed_all(0)
    for c, groups, eps in [(320, 32, 1e-5), (64, 32, 1e-6)]:
        x = np.random.randn(2, 6, 5, c).astype(np.float32)
        gn = torch.nn.GroupNorm(groups, c, eps=eps)
        with torch.no_grad():
            gn.weight.copy_(torch.randn(c))
            gn.bias.copy_(torch.randn(c))
        # torch runs NCHW
        ref = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        p = {"scale": jnp.asarray(ref_utils.t2n(gn.weight)),
             "bias": jnp.asarray(ref_utils.t2n(gn.bias))}
        ours = pnn.group_norm(jnp.asarray(x), p, groups=groups, eps=eps)
        assert_close(ours, ref_utils.t2n(ref), name=f"gn c={c}")


def test_layer_norm_matches_torch():
    import torch

    ref_utils.seed_all(1)
    x = np.random.randn(2, 7, 768).astype(np.float32)
    ln = torch.nn.LayerNorm(768)
    with torch.no_grad():
        ln.weight.copy_(torch.randn(768))
        ln.bias.copy_(torch.randn(768))
    ref = ln(torch.from_numpy(x))
    p = {"scale": jnp.asarray(ref_utils.t2n(ln.weight)),
         "bias": jnp.asarray(ref_utils.t2n(ln.bias))}
    assert_close(pnn.layer_norm(jnp.asarray(x), p), ref_utils.t2n(ref), name="ln")


def test_conv2d_matches_torch():
    import torch

    ref_utils.seed_all(2)
    for stride, pad, kh in [(1, 1, 3), (2, 1, 3), (1, 0, 1)]:
        conv = torch.nn.Conv2d(16, 32, kh, stride=stride, padding=pad)
        x = np.random.randn(2, 9, 11, 16).astype(np.float32)
        ref = conv(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        # torch conv weight OIHW -> HWIO
        w = ref_utils.t2n(conv.weight).transpose(2, 3, 1, 0)
        p = {"kernel": jnp.asarray(w), "bias": jnp.asarray(ref_utils.t2n(conv.bias))}
        ours = pnn.conv2d(jnp.asarray(x), p, stride=stride, padding=pad)
        assert_close(ours, ref_utils.t2n(ref), name=f"conv s{stride} p{pad} k{kh}")


def test_timestep_embedding_matches_reference():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.diffusion_utils import timestep_embedding as ref_emb

    t = np.array([0, 1, 10, 500, 999], np.int64)
    ref = ref_emb(torch.from_numpy(t), 320)
    ours = pnn.timestep_embedding(jnp.asarray(t), 320)
    # fp32 cos/sin of args up to ~1000 rad: ulp differences between XLA and
    # torch amplify to ~2e-3; mathematically both are the same embedding.
    assert_close(ours, ref_utils.t2n(ref), atol=5e-3, rtol=1.0,
                 name="timestep_embedding")


def test_cross_attention_matches_reference():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.attention import CrossAttention

    ref_utils.seed_all(3)
    m = CrossAttention(query_dim=320, context_dim=768, heads=8, dim_head=40)
    x = np.random.randn(2, 64, 320).astype(np.float32)
    c = np.random.randn(2, 148, 768).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x), torch.from_numpy(c))

    sd = ref_utils.sd_numpy(m)
    p = {
        "to_q": {"kernel": jnp.asarray(sd["to_q.weight"].T)},
        "to_k": {"kernel": jnp.asarray(sd["to_k.weight"].T)},
        "to_v": {"kernel": jnp.asarray(sd["to_v.weight"].T)},
        "to_out": {"kernel": jnp.asarray(sd["to_out.0.weight"].T),
                   "bias": jnp.asarray(sd["to_out.0.bias"])},
    }
    ours = pnn.multi_head_attention(jnp.asarray(x), jnp.asarray(c), p, n_heads=8)
    assert_close(ours, ref_utils.t2n(ref), name="cross_attention")


def test_torch_mha_matches_torch():
    import torch

    ref_utils.seed_all(4)
    m = torch.nn.MultiheadAttention(768, 8, batch_first=False)
    q = np.random.randn(10, 2, 768).astype(np.float32)  # (S, B, E) torch layout
    kv = np.random.randn(20, 2, 768).astype(np.float32)
    with torch.no_grad():
        ref, _ = m(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))

    sd = ref_utils.sd_numpy(m)
    p = {
        "in_proj": {"kernel": jnp.asarray(sd["in_proj_weight"].T),
                    "bias": jnp.asarray(sd["in_proj_bias"])},
        "out_proj": {"kernel": jnp.asarray(sd["out_proj.weight"].T),
                     "bias": jnp.asarray(sd["out_proj.bias"])},
    }
    # ours is batch-first
    ours = pnn.torch_mha(jnp.asarray(q.transpose(1, 0, 2)),
                         jnp.asarray(kv.transpose(1, 0, 2)), p, n_heads=8)
    assert_close(ours, ref_utils.t2n(ref).transpose(1, 0, 2), name="torch_mha")


def test_geglu_matches_reference():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.attention import GEGLU

    ref_utils.seed_all(5)
    m = GEGLU(320, 1280)
    x = np.random.randn(2, 16, 320).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x))
    sd = ref_utils.sd_numpy(m)
    p = {"kernel": jnp.asarray(sd["proj.weight"].T), "bias": jnp.asarray(sd["proj.bias"])}
    assert_close(pnn.geglu(jnp.asarray(x), p), ref_utils.t2n(ref), name="geglu")


def test_nearest_upsample_matches_torch():
    import torch

    x = np.random.randn(1, 4, 5, 3).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
    ).permute(0, 2, 3, 1)
    assert_close(pnn.nearest_upsample_2x(jnp.asarray(x)), ref_utils.t2n(ref),
                 name="nearest2x")


def test_config_bank_resolution():
    from pfd_tpu import config

    cfg = config.model_cfg("pfd_seecoder_with_controlnet")
    assert cfg["type"] == "pfd_with_control"
    assert cfg["args"]["beta_linear_start"] == 0.00085
    assert cfg["args"]["ctl_cfg"]["type"] == "controlnet"
    assert cfg["args"]["diffuser_cfg_list"][0][1]["args"]["model_channels"] == 320
    pa = config.model_cfg("pfd_seecoder_pa")
    assert pa["args"]["ctx_cfg_list"][0][1]["args"]["qtransformer_cfg"]["args"]["with_fea2d_pos"] is True


def test_upsample_conv2d_exact_fp32():
    """Phase-decomposed fused upsample-conv is an ALGEBRAIC identity with
    nearest_upsample_2x + 3x3 SAME conv (exact in fp32, incl. borders)."""
    rng = np.random.default_rng(0)
    for (h, w, cin, cout) in [(5, 7, 6, 10), (8, 8, 4, 4), (1, 3, 3, 5)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        p = {"kernel": jnp.asarray(
                 rng.standard_normal((3, 3, cin, cout)), jnp.float32),
             "bias": jnp.asarray(rng.standard_normal((cout,)), jnp.float32)}
        ref = pnn.conv2d(pnn.nearest_upsample_2x(x), p, padding=1)
        out = pnn.upsample_conv2d(x, p)
        assert_close(out, np.asarray(ref), rtol=1e-5, atol=1e-5,
                     name=f"upsample_conv {h}x{w} {cin}->{cout}")
        ref_nb = pnn.conv2d(pnn.nearest_upsample_2x(x),
                            {"kernel": p["kernel"]}, padding=1)
        out_nb = pnn.upsample_conv2d(x, {"kernel": p["kernel"]})
        assert_close(out_nb, np.asarray(ref_nb), rtol=1e-5, atol=1e-5,
                     name="upsample_conv nobias")


def test_upsample_conv2d_int8_close():
    """int8 path: phase kernels are quantized fresh (per-cout over 4K
    channels) — not bit-identical to quantizing the 3x3 kernel, but within
    int8 tolerance of the fp32 result."""
    from pfd_tpu.ops import quant

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 64)), jnp.float32)
    p = {"kernel": jnp.asarray(
             rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.05),
         "bias": jnp.asarray(rng.standard_normal((64,)), jnp.float32)}
    fp = np.asarray(pnn.upsample_conv2d(x, p))
    q, s = quant.quantize_weight(p["kernel"])
    qp = {"kernel_q": q, "kernel_scale": s, "bias": p["bias"]}
    out = np.asarray(pnn.upsample_conv2d(x, qp))
    ref_q = np.asarray(pnn.conv2d(pnn.nearest_upsample_2x(x), qp, padding=1))
    err_new = np.abs(out - fp).max()
    err_old = np.abs(ref_q - fp).max()
    assert np.isfinite(out).all()
    # comparable quantization noise to the existing int8 conv path
    assert err_new < max(4.0 * err_old, 0.05), (err_new, err_old)
