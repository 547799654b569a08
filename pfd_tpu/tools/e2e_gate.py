"""Serving-config quality gates vs the torch-fp32 reference, on the TPU.

Measures SSIM(variant, torch-fp32) DIRECTLY for each candidate serving
configuration at the true operating point (SD-1.5 widths, 512^2, DDIM-50,
CFG 2.0, shared weights, injected noise) — no composition bounds needed.
The BASELINE gate is SSIM >= 0.95 vs the PyTorch reference output.

The expensive torch side (hours of full-size CFG UNet forwards on one CPU
core) is NOT re-run here: tests/test_e2e_fullsize.py caches its outputs
(img_ref/x_ref/c_ref) under PFD_REF_CACHE, and the reference weights are
regenerated deterministically (ref_utils.seed_all(0) +
randomize_params(seed=42) — torch module INIT only, no forward).

Variants (select with GATE_VARIANTS=comma-list, default all):
  bf16        — bf16 policy + flash self-attention (the honest serving path;
                closes the PARITY.md:110 gap: round 2 only gated fp32-JAX)
  int8        — + int8 spatial convs (ops/quant.py, the default bench mode)
  int8_attn8  — + int8 PV flash attention (self_attn_fn_int8)
  int8_turbo2 — int8 convs + encoder propagation interval 2
  bf16_turbo2 — bf16 + encoder propagation interval 2
  int8_tome5 / int8_tome3 — + ds1 token merging (ops/tome.py) at ratio
                0.5 / 0.25
  int8_tome5_turbo2 — token merging + encoder propagation combined
  int8_cfg2 / bf16_cfg2 / int8_turbo2_cfg2 — CFG-delta reuse (ddim.py
                cfg_interval=2), alone and composed with encoder
                propagation
  int8_cfg2_deep2 / int8_turbo2_cfg2_deep2 / int8_turbo3_cfg3_deep3 —
                DeepCache (ddim.py deep_interval): reuse steps run only
                the highest-res UNet level, with a fresh shallow encoder
                (_cfg2_deep2) or fully cached skips (_turbo2_cfg2_deep2)
  int8_ph<N>x<K>_... — phased schedules (ddim.py phases): dense key steps
                early, sparse late; same row names as quant_gate.py

GATE_SET=control switches to the ControlNet serving path (BASELINE config
#3), scored against the torch-with-control cache written by
tests/test_e2e_fullsize_control.py (shared hint image, control in c_info —
app.py:243-270 semantics). Control variants: ctl_fp32 (regression control),
ctl_bf16, ctl_int8 (the current exact serving config), ctl_int8_cfg2
(CFG-delta reuse; reuse steps run the ControlNet on the conditional half
only — nothing stale), ctl_int8_turbo2_cfg2 (composed with encoder
propagation: cached control residuals on reuse steps).

Usage: python -m pfd_tpu.tools.e2e_gate   (TPU; one full compile per variant)
Reference recipe matched: app.py:212-275 semantics via lib/model_zoo/ddim.py.
"""

from __future__ import annotations

import json
import os

from pfd_tpu.utils.compile_cache import enable_compile_cache
import sys

import numpy as np
import jax

enable_compile_cache()
import jax.numpy as jnp

from pfd_tpu import config, registry
from pfd_tpu.diffusion.ddim import DDIMSampler
from pfd_tpu.io.convert import torch_sd_to_pytree
from pfd_tpu.ops import quant
from pfd_tpu.ops.flash_attention import self_attn_fn, self_attn_fn_int8
from pfd_tpu.policy import BF16
from pfd_tpu.training.evaluator import ssim

CACHE = os.environ.get("PFD_REF_CACHE", "tests/_cache")


def reference_weights():
    """Rebuild the reference torch net exactly as tests/test_e2e_fullsize.py
    does (same seeds) and return its state dict as numpy — init only, no
    torch forward."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from tests import ref_utils
    from tests.test_e2e_fullsize import AttrDict
    ref_utils.load_reference()
    from lib.model_zoo.pfd import PromptFreeDiffusion as RefPFD

    cfg = config.model_cfg("pfd_seecoder")["args"]
    vae_cfg = dict(cfg["vae_cfg_list"][0][1])
    vae_cfg["args"].setdefault("lossconfig", None)
    ctx_cfg = cfg["ctx_cfg_list"][0][1]
    unet_cfg = cfg["diffuser_cfg_list"][0][1]
    ctx_cfg["args"]["imencoder_cfg"]["args"]["drop_path_rate"] = 0.0

    ref_utils.seed_all(0)
    ref_net = RefPFD(
        vae_cfg_list=[["image", AttrDict(vae_cfg)]],
        ctx_cfg_list=[["image", AttrDict(ctx_cfg)]],
        diffuser_cfg_list=[["image", AttrDict(unet_cfg)]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012,
        timesteps=1000, use_ema=False).eval()
    ref_utils.randomize_params(ref_net, scale=0.04, seed=42)
    sd = ref_utils.sd_numpy(ref_net)
    del ref_net
    return (vae_cfg, ctx_cfg, unet_cfg), sd


def main_control():
    """ControlNet serving-path gates vs the torch-with-control cache."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from tests.test_e2e_fullsize_control import build_reference_control_net
    from tests import ref_utils

    ref = np.load(os.path.join(CACHE, "e2e_fullsize_control_ref.npz"))
    img_ref = ref["img_ref"]

    (vae_cfg, ctx_cfg, unet_cfg, ctl_args), ref_net = \
        build_reference_control_net()
    sd = ref_utils.sd_numpy(ref_net)
    del ref_net

    def build(policy=None):
        kw = {"policy": policy} if policy is not None else {}
        return registry.get("pfd_with_control")(
            vae_cfg_list=[["image", vae_cfg]],
            ctx_cfg_list=[["image", ctx_cfg]],
            diffuser_cfg_list=[["image", unet_cfg]],
            ctl_cfg={"type": "controlnet", "args": ctl_args},
            latent_scale_factor={"image": 0.18215},
            beta_linear_start=0.00085, beta_linear_end=0.012,
            timesteps=1000, **kw)

    model = build(BF16)
    model32 = build()
    params = torch_sd_to_pytree(sd)
    del sd
    qparams = dict(params)
    qparams["diffuser"] = quant.quantize_params(params["diffuser"])
    qparams["vae"] = quant.quantize_params(params["vae"])
    qparams["ctl"] = quant.quantize_params(params["ctl"])

    rng = np.random.default_rng(5)
    ref_img = jnp.asarray(rng.random((1, 512, 512, 3), dtype=np.float32))
    x_start = jnp.asarray(
        rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
        .transpose(0, 2, 3, 1))
    hint = jnp.asarray(rng.random((1, 3, 512, 512), dtype=np.float32)
                       .transpose(0, 2, 3, 1))

    def run(p, attn, interval, m=model, cfg_interval=1, deep_interval=1,
            phases=None, reuse_attn=None):
        c = m.ctx_encode(p, ref_img, "image")
        x, _ = DDIMSampler(m).sample(
            p, jax.random.PRNGKey(0), (1, 64, 64, 4),
            x_info={"xt": x_start},
            c_info={"conditioning": c,
                    "unconditional_conditioning": jnp.zeros_like(c),
                    "unconditional_guidance_scale": 2.0, "control": hint},
            steps=50, eta=0.0, self_attn_fn=attn,
            encoder_interval=interval, cfg_interval=cfg_interval,
            deep_interval=deep_interval, phases=phases,
            reuse_self_attn_fn=reuse_attn)
        return np.asarray(m.vae_decode(p, x, "image"))

    from pfd_tpu.ops.kvpool import make_kvpool_attn
    ctl_kv2 = make_kvpool_attn(self_attn_fn, (64, 64), pool=2)

    variants = {
        "ctl_fp32": lambda: run(params, None, 1, m=model32),
        "ctl_bf16": lambda: run(params, self_attn_fn, 1),
        "ctl_int8": lambda: run(qparams, self_attn_fn, 1),
        "ctl_int8_cfg2": lambda: run(qparams, self_attn_fn, 1,
                                     cfg_interval=2),
        "ctl_int8_turbo2_cfg2": lambda: run(qparams, self_attn_fn, 2,
                                            cfg_interval=2),
        # DeepCache with control rides the encoder cache (fresh shallow
        # skips would need the full ControlNet forward — ddim.py assert)
        "ctl_int8_turbo2_cfg2_deep2": lambda: run(qparams, self_attn_fn, 2,
                                                  cfg_interval=2,
                                                  deep_interval=2),
        "ctl_int8_turbo3_cfg3_deep3": lambda: run(qparams, self_attn_fn, 3,
                                                  cfg_interval=3,
                                                  deep_interval=3),
        # phased control schedules (quant_gate.py carries the proxy twins)
        "ctl_int8_ph10x2_40x8": lambda: run(
            qparams, self_attn_fn, 1, phases=[(10, 2), (40, 8)]),
        "ctl_int8_ph10x2_40x10": lambda: run(
            qparams, self_attn_fn, 1, phases=[(10, 2), (40, 10)]),
        "ctl_int8_ph10x2_40x20": lambda: run(
            qparams, self_attn_fn, 1, phases=[(10, 2), (40, 20)]),
        "ctl_int8_ph10x2_40x20_kv2": lambda: run(
            qparams, self_attn_fn, 1, phases=[(10, 2), (40, 20)],
            reuse_attn=ctl_kv2),
    }
    sel = os.environ.get("GATE_VARIANTS")
    names = sel.split(",") if sel else list(variants)
    results, bf16_img = {}, None
    for name in names:
        img = variants[name]()
        s = ssim(np.clip(img[0], 0, 1), np.clip(img_ref[0], 0, 1),
                 data_range=1.0)
        results[name] = round(float(s), 5)
        row = {"variant": name, "ssim_vs_torch_fp32": results[name],
               "finite": bool(np.isfinite(img).all()),
               "gate_0.95": bool(s >= 0.95)}
        if name == "ctl_bf16":
            bf16_img = img
        elif bf16_img is not None:
            row["ssim_vs_bf16"] = round(float(ssim(
                np.clip(img[0], 0, 1), np.clip(bf16_img[0], 0, 1),
                data_range=1.0)), 5)
        print(json.dumps(row), flush=True)
    print(json.dumps({"all": results}), flush=True)


def main():
    ref = np.load(os.path.join(CACHE, "e2e_fullsize_ref.npz"))
    img_ref = ref["img_ref"]

    (vae_cfg, ctx_cfg, unet_cfg), sd = reference_weights()
    model = registry.get("pfd")(
        vae_cfg_list=[["image", vae_cfg]],
        ctx_cfg_list=[["image", ctx_cfg]],
        diffuser_cfg_list=[["image", unet_cfg]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000,
        policy=BF16)
    params = torch_sd_to_pytree(sd)
    del sd

    qparams = dict(params)
    qparams["diffuser"] = quant.quantize_params(params["diffuser"])
    qparams["vae"] = quant.quantize_params(params["vae"])

    # EXACTLY the test's draws: `dtype=np.float32` consumes a different
    # bit-stream than float64-then-cast, so omitting it silently changes
    # BOTH ref_img and x_start vs the cached torch run (measured: the whole
    # variant table collapsed to the ~0.83 uncorrelated-image floor).
    rng = np.random.default_rng(5)
    ref_img = jnp.asarray(rng.random((1, 512, 512, 3), dtype=np.float32))
    x_start = jnp.asarray(
        rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
        .transpose(0, 2, 3, 1))

    # fp32 twin of the model for the chaos-control variants: identical
    # weights, exact-GELU fp32 math (the config test_e2e_fullsize verified
    # bit-comparable to torch, SSIM 1.000)
    model32 = registry.get("pfd")(
        vae_cfg_list=[["image", vae_cfg]],
        ctx_cfg_list=[["image", ctx_cfg]],
        diffuser_cfg_list=[["image", unet_cfg]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)

    # sanity: the SeeCoder tokens must match the cached torch tokens
    c_chk = np.asarray(model.ctx_encode(params, ref_img, "image"),
                       np.float32)
    cerr = np.abs(c_chk - ref["c_ref"]).max()
    print(json.dumps({"ctx_tokens_max_abs_err_vs_torch": float(cerr)}),
          flush=True)

    def run(p, attn, interval, m=model, x0=None, cfg_interval=1,
            deep_interval=1, extrap="const", phases=None, reuse_attn=None):
        c = m.ctx_encode(p, ref_img, "image")
        x, _ = DDIMSampler(m).sample(
            p, jax.random.PRNGKey(0), (1, 64, 64, 4),
            x_info={"xt": x_start if x0 is None else x0},
            c_info={"conditioning": c,
                    "unconditional_conditioning": jnp.zeros_like(c),
                    "unconditional_guidance_scale": 2.0},
            steps=50, eta=0.0, self_attn_fn=attn,
            encoder_interval=interval, cfg_interval=cfg_interval,
            deep_interval=deep_interval, cfg_extrapolate=extrap,
            phases=phases, reuse_self_attn_fn=reuse_attn)
        return np.asarray(m.vae_decode(p, x, "image"))

    from pfd_tpu.ops.tome import make_tome_attn
    from pfd_tpu.ops.kvpool import make_kvpool_attn

    tome5 = make_tome_attn(self_attn_fn, (64, 64), ratio=0.5)
    tome3 = make_tome_attn(self_attn_fn, (64, 64), ratio=0.25)
    kv2 = make_kvpool_attn(self_attn_fn, (64, 64), pool=2)
    kv4 = make_kvpool_attn(self_attn_fn, (64, 64), pool=4)
    variants = {
        "bf16": (params, self_attn_fn, 1),
        "int8": (qparams, self_attn_fn, 1),
        "int8_attn8": (qparams, self_attn_fn_int8, 1),
        "int8_turbo2": (qparams, self_attn_fn, 2),
        "bf16_turbo2": (params, self_attn_fn, 2),
        "int8_tome5": (qparams, tome5, 1),
        "int8_tome3": (qparams, tome3, 1),
        "int8_tome5_turbo2": (qparams, tome5, 2),
    }
    # chaos controls (fp32 exact math): "fp32" must reproduce the cached
    # torch output (~1.000 — regression check on the weight regeneration);
    # "fp32_eps" perturbs ONLY the initial latent by 1e-3 — if its SSIM
    # collapses to the same level as bf16's, the proxy operating point
    # (random weights -> noise-textured outputs) is chaotically sensitive
    # and NO non-bit-exact implementation can pass 0.95 against it; the
    # decision-relevant number for serving variants is then SSIM vs the
    # repo's own bf16 baseline (printed as ssim_vs_bf16).
    eps_x = x_start + 1e-3 * jnp.asarray(
        np.random.default_rng(11).standard_normal(x_start.shape), jnp.float32)
    # CFG-delta reuse (ddim.py cfg_interval): uncond half every 2nd step
    variants["int8_cfg2"] = (qparams, self_attn_fn, 1, model, None, 2)
    variants["bf16_cfg2"] = (params, self_attn_fn, 1, model, None, 2)
    variants["int8_turbo2_cfg2"] = (qparams, self_attn_fn, 2, model, None, 2)
    variants["int8_turbo3_cfg3"] = (qparams, self_attn_fn, 3, model, None, 3)
    # DeepCache (ddim.py deep_interval): reuse steps run only the
    # highest-res UNet level; _cfg2_deep2 keeps the shallow encoder fresh
    variants["int8_cfg2_deep2"] = (qparams, self_attn_fn, 1, model, None,
                                   2, 2)
    variants["int8_turbo2_cfg2_deep2"] = (qparams, self_attn_fn, 2, model,
                                          None, 2, 2)
    variants["int8_turbo3_cfg3_deep3"] = (qparams, self_attn_fn, 3, model,
                                          None, 3, 3)
    variants["int8_turbo4_cfg4_deep4"] = (qparams, self_attn_fn, 4, model,
                                          None, 4, 4)
    # linear (first-order) guidance-delta extrapolation
    # (ddim.py cfg_extrapolate="linear") — same cost as const
    variants["int8_turbo3_cfg3lin_deep3"] = (qparams, self_attn_fn, 3, model,
                                             None, 3, 3, "linear")
    variants["int8_turbo4_cfg4lin_deep4"] = (qparams, self_attn_fn, 4, model,
                                             None, 4, 4, "linear")
    variants["int8_turbo5_cfg5_deep5"] = (qparams, self_attn_fn, 5, model,
                                          None, 5, 5)
    variants["int8_turbo5_cfg5lin_deep5"] = (qparams, self_attn_fn, 5, model,
                                             None, 5, 5, "linear")
    variants["int8_turbo6_cfg6lin_deep6"] = (qparams, self_attn_fn, 6, model,
                                             None, 6, 6, "linear")
    # phased schedules (ddim.py phases=...): dense key steps early, sparse
    # late — ph10x2_40x5 spends the k=4 key budget (13), ph10x2_40x8 the
    # k=5 budget (10), ph5x1_45x5 adds an exact head (14 keys)
    variants["int8_ph10x2_40x5"] = (qparams, self_attn_fn, 1, model,
                                    None, 1, 1, "const", [(10, 2), (40, 5)])
    variants["int8_ph10x2_40x8"] = (qparams, self_attn_fn, 1, model,
                                    None, 1, 1, "const", [(10, 2), (40, 8)])
    variants["int8_ph5x1_45x5"] = (qparams, self_attn_fn, 1, model,
                                   None, 1, 1, "const", [(5, 1), (45, 5)])
    # sparser tails toward the 0.95 gate (quant_gate.py carries the same
    # rows): 9 keys (40x10), 7 keys (40x20), soft-head 7 keys (20x4_30x15)
    variants["int8_ph10x2_40x8lin"] = (qparams, self_attn_fn, 1, model,
                                       None, 1, 1, "linear",
                                       [(10, 2), (40, 8)])
    variants["int8_ph10x2_40x10"] = (qparams, self_attn_fn, 1, model,
                                     None, 1, 1, "const",
                                     [(10, 2), (40, 10)])
    variants["int8_ph10x2_40x20"] = (qparams, self_attn_fn, 1, model,
                                     None, 1, 1, "const",
                                     [(10, 2), (40, 20)])
    variants["int8_ph20x4_30x15"] = (qparams, self_attn_fn, 1, model,
                                     None, 1, 1, "const",
                                     [(20, 4), (30, 15)])
    # round-5 stretch: 7-key lin upgrade and the 6-key single-tail-group
    variants["int8_ph10x2_40x20lin"] = (qparams, self_attn_fn, 1, model,
                                        None, 1, 1, "linear",
                                        [(10, 2), (40, 20)])
    variants["int8_ph10x2_40x40"] = (qparams, self_attn_fn, 1, model,
                                     None, 1, 1, "const",
                                     [(10, 2), (40, 40)])
    # head-budget probes (6 and 5 keys, k=2 density kept on the head)
    variants["int8_ph8x2_42x21"] = (qparams, self_attn_fn, 1, model,
                                    None, 1, 1, "const",
                                    [(8, 2), (42, 21)])
    variants["int8_ph6x2_44x22"] = (qparams, self_attn_fn, 1, model,
                                    None, 1, 1, "const",
                                    [(6, 2), (44, 22)])
    # KV-pooled reuse-step attention (ops/kvpool.py) on the phased schedules
    variants["int8_ph8x2_42x21_kv2"] = (qparams, self_attn_fn, 1, model,
                                        None, 1, 1, "const",
                                        [(8, 2), (42, 21)], kv2)
    variants["int8_ph10x2_40x10_kv2"] = (qparams, self_attn_fn, 1, model,
                                         None, 1, 1, "const",
                                         [(10, 2), (40, 10)], kv2)
    variants["int8_ph8x2_42x21_kv4"] = (qparams, self_attn_fn, 1, model,
                                        None, 1, 1, "const",
                                        [(8, 2), (42, 21)], kv4)
    variants["int8_ph10x2_40x10_kv4"] = (qparams, self_attn_fn, 1, model,
                                         None, 1, 1, "const",
                                         [(10, 2), (40, 10)], kv4)
    # phased bf16 rows (b1 latency-mode candidates — no quant error)
    variants["bf16_ph10x2_40x8"] = (params, self_attn_fn, 1, model,
                                    None, 1, 1, "const", [(10, 2), (40, 8)])
    variants["bf16_ph10x2_40x10"] = (params, self_attn_fn, 1, model,
                                     None, 1, 1, "const", [(10, 2), (40, 10)])
    variants["bf16_ph10x2_40x20"] = (params, self_attn_fn, 1, model,
                                     None, 1, 1, "const", [(10, 2), (40, 20)])
    variants["fp32"] = (params, None, 1, model32, None)
    variants["fp32_eps"] = (params, None, 1, model32, eps_x)
    # precision-isolation ladder (used if fp32_eps does NOT collapse —
    # i.e. the bf16 drift is real, not chaos): which ingredient moves it?
    variants["bf16_xla_attn"] = (params, None, 1)         # no flash kernel
    variants["fp32_flash"] = (params, self_attn_fn, 1, model32, None)

    sel = os.environ.get("GATE_VARIANTS")
    names = sel.split(",") if sel else list(variants)

    results = {}
    images = {}
    bf16_img = None
    for name in names:
        p, attn, interval, *rest = variants[name]
        m = rest[0] if rest else model
        x0 = rest[1] if len(rest) > 1 else None
        cfg_iv = rest[2] if len(rest) > 2 else 1
        deep_iv = rest[3] if len(rest) > 3 else 1
        extrap = rest[4] if len(rest) > 4 else "const"
        phases = rest[5] if len(rest) > 5 else None
        reuse_attn = rest[6] if len(rest) > 6 else None
        img = run(p, attn, interval, m=m, x0=x0, cfg_interval=cfg_iv,
                  deep_interval=deep_iv, extrap=extrap, phases=phases,
                  reuse_attn=reuse_attn)
        images[name] = img
        s = ssim(np.clip(img[0], 0, 1), np.clip(img_ref[0], 0, 1),
                 data_range=1.0)
        results[name] = round(float(s), 5)
        row = {"variant": name,
               "ssim_vs_torch_fp32": results[name],
               "finite": bool(np.isfinite(img).all()),
               "gate_0.95": bool(s >= 0.95)}
        if name == "bf16":
            bf16_img = img
        if bf16_img is not None and name != "bf16":
            row["ssim_vs_bf16"] = round(float(ssim(
                np.clip(img[0], 0, 1), np.clip(bf16_img[0], 0, 1),
                data_range=1.0)), 5)
        print(json.dumps(row), flush=True)
    print(json.dumps({"all": results}), flush=True)


if __name__ == "__main__":
    if os.environ.get("GATE_SET") == "control":
        main_control()
    else:
        main()
