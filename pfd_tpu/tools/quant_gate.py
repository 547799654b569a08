"""int8 serving-mode quality gate at the TRUE operating point, on the TPU.

SSIM between the int8 pipeline (ops/quant.py: diffuser+VAE spatial convs
int8) and the bf16 pipeline over the full path — SD-1.5-width UNet, 512^2,
DDIM-50, CFG 2.0, shared random weights and injected noise. This is the
second weight proxy (fan-in init weights) backing the DIRECT
vs-torch-fp32 gates in tools/e2e_gate.py (bf16 0.99914, int8 0.99903 —
measured, no composition bound needed; docs/PARITY.md round 3).

Measured 2026-08-17 on the v5e: **0.99672** (recorded in docs/PARITY.md).
The CPU slow-suite analogue is tests/test_quant_e2e.py (384^2/DDIM-25 —
XLA:CPU runs int8 convs too slowly for the 512^2/50 point).

Usage: python -m pfd_tpu.tools.quant_gate   (TPU, ~15 min first compile)

GATE_SET=control switches to the ControlNet serving path (BASELINE config
#3): pfd_with_control at the same operating point with a shared random
canny-like hint, SSIM vs the exact bf16 control sampler. This is the
fan-in-proxy twin of tools/e2e_gate.py GATE_SET=control (whose direct rows
saturate at the 0.99898 int8 floor — the proxy is where control turbos
actually separate; docs/PARITY.md round 4).

Statistical gating (round 5): by default each row scores GATE_SAMPLES=8
samples — 4 noise seeds x 2 reference images (x 2 hint images under
GATE_SET=control) — batched into ONE compile, and reports min/mean/
per-sample SSIM. The promotion gate is **min >= 0.95** (a single-sample
pass is not a gate; VERDICT r4 weak #2). Sample 0 reproduces the legacy
single-sample draws bit-exactly, so `ssim_s0` is directly comparable to
every round-3/4 number. GATE_SAMPLES=1 restores the legacy behavior.
"""

from __future__ import annotations

import json
import os

from pfd_tpu.utils.compile_cache import enable_compile_cache

import numpy as np
import jax

enable_compile_cache()
import jax.numpy as jnp

from pfd_tpu import config, registry
from pfd_tpu.diffusion.ddim import DDIMSampler
from pfd_tpu.ops import quant
from pfd_tpu.ops.flash_attention import self_attn_fn
from pfd_tpu.policy import BF16
from pfd_tpu.training.evaluator import ssim


def _dezero(params, key=0, scale=0.04):
    """Randomize all-zero leaves (zero-init output convs make a fresh-init
    comparison vacuous — same rationale as tests/ref_utils.dezero_pytree,
    inlined so the tool has no test-package dependency)."""
    rng = np.random.default_rng(key)

    def fix(x):
        x = np.asarray(x)
        if x.size and not np.any(x):
            return jnp.asarray(rng.standard_normal(x.shape).astype(x.dtype)
                               * scale)
        return jnp.asarray(x)

    return jax.tree.map(fix, params)


# static row-name set, checked against the rows dict in main(); GATE_ONLY is
# validated against this BEFORE the bf16 baseline burns a 5-15 min remote
# compile on a typo'd name
ROW_NAMES = ("int8", "bf16eps", "int8_turbo2", "int8_tome3", "int8_tome5",
             "int8_tome5_turbo2", "int8_cfg2", "int8_turbo2_cfg2",
             "int8_turbo3_cfg3", "int8_tome5_turbo2_cfg2",
             "int8_cfg2_deep2", "int8_turbo2_cfg2_deep2",
             "int8_turbo3_cfg3_deep3", "int8_turbo4_cfg4_deep4",
             "int8_cfg3lin", "int8_turbo3_cfg3lin_deep3",
             "int8_turbo4_cfg4lin_deep4", "int8_turbo5_cfg5_deep5",
             "int8_turbo5_cfg5lin_deep5", "int8_turbo6_cfg6lin_deep6",
             "bf16_turbo3_cfg3_deep3",
             "int8_ph10x2_40x5", "int8_ph10x2_40x8", "int8_ph5x1_45x5",
             "int8_ph10x2_40x8lin", "int8_ph10x2_40x10",
             "int8_ph10x2_40x20", "int8_ph20x4_30x15",
             "int8_ph10x2_40x20lin", "int8_ph10x2_40x40",
             "int8_ph8x2_42x21", "int8_ph6x2_44x22",
             "bf16_ph10x2_40x8", "bf16_ph10x2_40x10", "bf16_ph10x2_40x20",
             "int8_ph8x2_42x21_kv2", "int8_ph10x2_40x10_kv2",
             "int8_ph8x2_42x21_kv4", "int8_ph10x2_40x10_kv4")


# ControlNet-path rows (GATE_SET=control); composition rule (ddim.py):
# deep caching under control requires the encoder cache too
CTL_ROW_NAMES = ("ctl_int8", "ctl_int8_cfg2", "ctl_int8_turbo2_cfg2",
                 "ctl_int8_turbo2_cfg2_deep2", "ctl_int8_turbo3_cfg3_deep3",
                 "ctl_int8_ph10x2_40x8", "ctl_int8_ph10x2_40x10",
                 "ctl_int8_ph10x2_40x20", "ctl_int8_ph10x2_40x20_kv2")


N_SAMPLES = int(os.environ.get("GATE_SAMPLES", "8"))
# GATE_SIZE: pixel size of the operating point (default 512; 768 gives the
# resolution-range evidence row — the latent grid scales with it)
SIZE = int(os.environ.get("GATE_SIZE", "512"))


def _sample_grid(n_samples, draw_legacy, draw_extra_refs, draw_extra_noise):
    """Build (refs, noises) stacked on the batch axis: sample i pairs
    ref[i // n_seeds] with noise[i % n_seeds]. Sample 0 == the legacy
    single-sample draws (same PCG64 stream), so ssim_s0 stays comparable
    to the round-3/4 single-sample tables."""
    ref0, x0 = draw_legacy()
    if n_samples == 1:
        return ref0, x0
    n_refs = 2
    n_seeds = n_samples // n_refs
    if n_refs * n_seeds != n_samples:
        raise SystemExit(f"GATE_SAMPLES={n_samples} must be 1 or even")
    refs = np.concatenate([ref0] + list(draw_extra_refs(n_refs - 1)), axis=0)
    noises = np.concatenate([x0] + list(draw_extra_noise(n_seeds - 1)),
                            axis=0)
    ref_b = np.repeat(refs, n_seeds, axis=0)       # i // n_seeds
    noise_b = np.tile(noises, (n_refs, 1, 1, 1))   # i % n_seeds
    return ref_b, noise_b


def _ssim_stats(img, img_fp):
    per = [ssim(np.clip(img[i], 0, 1), np.clip(img_fp[i], 0, 1),
                data_range=1.0) for i in range(img.shape[0])]
    return per


def _gate_names(row_names=ROW_NAMES, default=("int8",)):
    only = os.environ.get("GATE_ONLY")
    if only:
        names = [n for n in only.split(",") if n]
        unknown = sorted(set(names) - set(row_names))
        if unknown:
            raise SystemExit(f"GATE_ONLY names not in row set: {unknown}; "
                             f"valid: {sorted(row_names)}")
        return names
    if os.environ.get("GATE_EXTRA") == "1":
        return list(row_names)
    return list(default)


def main():
    names = _gate_names()  # validate the selection before any TPU work
    cfg = config.model_cfg("pfd_seecoder")["args"]
    cfg["vae_cfg_list"][0][1]["args"].setdefault("lossconfig", None)
    cfg["ctx_cfg_list"][0][1]["args"]["imencoder_cfg"]["args"][
        "drop_path_rate"] = 0.0
    model = registry.get("pfd")(**cfg, policy=BF16)
    params = _dezero(model.init(jax.random.PRNGKey(1)))

    rng = np.random.default_rng(5)
    rng2 = np.random.default_rng(1005)
    g = SIZE // 8
    ref_np, x_np = _sample_grid(
        N_SAMPLES,
        lambda: (np.asarray(rng.random((1, SIZE, SIZE, 3)), np.float32),
                 np.asarray(rng.standard_normal((1, g, g, 4)), np.float32)),
        lambda n: [np.asarray(rng2.random((1, SIZE, SIZE, 3)), np.float32)
                   for _ in range(n)],
        lambda n: [np.asarray(rng2.standard_normal((1, g, g, 4)),
                              np.float32) for _ in range(n)])
    ref_img = jnp.asarray(ref_np)
    x_start = jnp.asarray(x_np)

    def sample(p, attn=self_attn_fn, interval=1, x0=None, cfg_interval=1,
               deep_interval=1, extrap="const", phases=None,
               reuse_attn=None):
        c = model.ctx_encode(p, ref_img, "image")
        sampler = DDIMSampler(model)
        x, _ = sampler.sample(
            p, jax.random.PRNGKey(0), x_start.shape,
            x_info={"xt": x_start if x0 is None else x0},
            c_info={"conditioning": c,
                    "unconditional_conditioning": jnp.zeros_like(c),
                    "unconditional_guidance_scale": 2.0},
            steps=50, eta=0.0, self_attn_fn=attn,
            encoder_interval=interval, cfg_interval=cfg_interval,
            deep_interval=deep_interval, cfg_extrapolate=extrap,
            phases=phases, reuse_self_attn_fn=reuse_attn)
        return np.asarray(model.vae_decode(p, x, "image"))

    img_fp = sample(params)
    print("fp done", flush=True)
    qparams = dict(params)
    qparams["diffuser"] = quant.quantize_params(params["diffuser"])
    qparams["vae"] = quant.quantize_params(params["vae"])

    sz = "" if SIZE == 512 else f"_{SIZE}"

    def gate(name, img):
        per = _ssim_stats(img, img_fp)
        print(json.dumps({
            # the headline key is now the MIN over samples (the gate);
            # s0 reproduces the legacy single-sample number exactly
            f"fullsize{sz}_ddim50_ssim_{name}_vs_bf16": round(min(per), 5),
            "mean": round(float(np.mean(per)), 5),
            "s0": round(per[0], 5), "n": len(per),
            "per_sample": [round(s, 5) for s in per],
            "finite": bool(np.isfinite(img).all()),
        }), flush=True)

    # GATE_ONLY=comma-list selects specific rows (each row is its own full
    # 50-step remote compile, so re-running already-recorded ones is
    # expensive); default/GATE_EXTRA behavior unchanged.
    from pfd_tpu.ops.tome import make_tome_attn

    eps_x = x_start + 1e-3 * jnp.asarray(
        np.random.default_rng(11).standard_normal(x_start.shape),
        jnp.float32)
    tome3 = make_tome_attn(self_attn_fn, (g, g), ratio=0.25)
    tome5 = make_tome_attn(self_attn_fn, (g, g), ratio=0.5)
    from pfd_tpu.ops.kvpool import make_kvpool_attn
    kv2 = make_kvpool_attn(self_attn_fn, (g, g), pool=2)
    kv4 = make_kvpool_attn(self_attn_fn, (g, g), pool=4)
    rows = {
        "int8": lambda: sample(qparams),
        "bf16eps": lambda: sample(params, x0=eps_x),
        "int8_turbo2": lambda: sample(qparams, interval=2),
        "int8_tome3": lambda: sample(qparams, attn=tome3),
        "int8_tome5": lambda: sample(qparams, attn=tome5),
        "int8_tome5_turbo2": lambda: sample(qparams, attn=tome5, interval=2),
        # CFG-delta reuse (ddim.py cfg_interval) under the fan-in proxy —
        # the regime where guidance actually bends the trajectory
        "int8_cfg2": lambda: sample(qparams, cfg_interval=2),
        "int8_turbo2_cfg2": lambda: sample(qparams, interval=2,
                                           cfg_interval=2),
        "int8_turbo3_cfg3": lambda: sample(qparams, interval=3,
                                           cfg_interval=3),
        # maximal composition: every gated turbo at once
        "int8_tome5_turbo2_cfg2": lambda: sample(qparams, attn=tome5,
                                                 interval=2, cfg_interval=2),
        # DeepCache (ddim.py deep_interval): _cfg2_deep2 re-runs the shallow
        # encoder each reuse step (DeepCache proper — the latent still enters
        # the model); _turbo2_cfg2_deep2 reuses the cached shallow skips too
        "int8_cfg2_deep2": lambda: sample(qparams, cfg_interval=2,
                                          deep_interval=2),
        "int8_turbo2_cfg2_deep2": lambda: sample(qparams, interval=2,
                                                 cfg_interval=2,
                                                 deep_interval=2),
        "int8_turbo3_cfg3_deep3": lambda: sample(qparams, interval=3,
                                                 cfg_interval=3,
                                                 deep_interval=3),
        # k=4 probe (50 % 4 = 2: trailing partial group) — candidate only
        # if this row holds the >= 0.95 gate with margin
        "int8_turbo4_cfg4_deep4": lambda: sample(qparams, interval=4,
                                                 cfg_interval=4,
                                                 deep_interval=4),
        # linear (first-order) delta extrapolation (ddim.py
        # cfg_extrapolate="linear") — same cost as const; candidate quality
        # upgrade for k>=3 and the enabler for a gateable k=4
        "int8_cfg3lin": lambda: sample(qparams, cfg_interval=3,
                                       extrap="linear"),
        "int8_turbo3_cfg3lin_deep3": lambda: sample(qparams, interval=3,
                                                    cfg_interval=3,
                                                    deep_interval=3,
                                                    extrap="linear"),
        "int8_turbo4_cfg4lin_deep4": lambda: sample(qparams, interval=4,
                                                    cfg_interval=4,
                                                    deep_interval=4,
                                                    extrap="linear"),
        # k=5 probe (50 = 10 even groups): proxy trend is ~-0.012/k
        # (0.99093/0.98177/0.9698 at k=2/3/4) so const-k5 sits near the
        # 0.95 gate; the lin row is the realistic candidate
        "int8_turbo5_cfg5_deep5": lambda: sample(qparams, interval=5,
                                                 cfg_interval=5,
                                                 deep_interval=5),
        "int8_turbo5_cfg5lin_deep5": lambda: sample(qparams, interval=5,
                                                    cfg_interval=5,
                                                    deep_interval=5,
                                                    extrap="linear"),
        # k=6 probe (50 = 8*6+2: trailing partial group); the lin proxy
        # trend (0.985/0.975/0.964 at k=3/4/5) puts it right at the gate
        "int8_turbo6_cfg6lin_deep6": lambda: sample(qparams, interval=6,
                                                    cfg_interval=6,
                                                    deep_interval=6,
                                                    extrap="linear"),
        # phased schedules (ddim.py phases=...): dense key steps early where
        # guidance bends the trajectory most, sparse late — same key-step
        # budget as uniform k=4 (13 keys: ph10x2_40x5) / k=5 (10 keys:
        # ph10x2_40x8); ph5x1_45x5 spends 14 keys with an exact head
        "int8_ph10x2_40x5": lambda: sample(qparams,
                                           phases=[(10, 2), (40, 5)]),
        "int8_ph10x2_40x8": lambda: sample(qparams,
                                           phases=[(10, 2), (40, 8)]),
        "int8_ph5x1_45x5": lambda: sample(qparams,
                                          phases=[(5, 1), (45, 5)]),
        # sparser-tail phased probes (round 5): ph10x2_40x8 measured
        # 0.98849 min-over-8 — k=5's key budget at near-k=3 quality — so
        # the tail has headroom toward the 0.95 gate: 9 keys (40x10),
        # 7 keys (40x20), and a soft-head 7-key variant; lin = first-order
        # delta extrapolation composed with the dense-early schedule
        "int8_ph10x2_40x8lin": lambda: sample(qparams,
                                              phases=[(10, 2), (40, 8)],
                                              extrap="linear"),
        "int8_ph10x2_40x10": lambda: sample(qparams,
                                            phases=[(10, 2), (40, 10)]),
        "int8_ph10x2_40x20": lambda: sample(qparams,
                                            phases=[(10, 2), (40, 20)]),
        "int8_ph20x4_30x15": lambda: sample(qparams,
                                            phases=[(20, 4), (30, 15)]),
        # round-5 stretch: ph10x2_40x20 measured 0.98263 min-over-8 with 7
        # keys, so the tail can go to ONE key group (6 keys total) and the
        # lin upgrade is free on the 7-key schedule
        "int8_ph10x2_40x20lin": lambda: sample(qparams,
                                               phases=[(10, 2), (40, 20)],
                                               extrap="linear"),
        "int8_ph10x2_40x40": lambda: sample(qparams,
                                            phases=[(10, 2), (40, 40)]),
        # head-budget probes: the k=2 head is 5 of the 7 keys at 40x20
        # (a third of the serving cost) — shave it while keeping k=2
        # density on the MOST guidance-bent steps: 6 keys (8x2 head) and
        # 5 keys (6x2 head), tails at one-group sparsity
        "int8_ph8x2_42x21": lambda: sample(qparams,
                                           phases=[(8, 2), (42, 21)]),
        "int8_ph6x2_44x22": lambda: sample(qparams,
                                           phases=[(6, 2), (44, 22)]),
        # KV-pooled reuse-step attention (ops/kvpool.py): pool=2 shrinks the
        # reuse steps' ds1 K/V 4x (key steps stay exact) — the reuse steps
        # dominate the phased schedules' cost, so this is the next lever if
        # the quality holds
        "int8_ph8x2_42x21_kv2": lambda: sample(
            qparams, phases=[(8, 2), (42, 21)], reuse_attn=kv2),
        "int8_ph10x2_40x10_kv2": lambda: sample(
            qparams, phases=[(10, 2), (40, 10)], reuse_attn=kv2),
        # pool=4 stretch probe (16x fewer KV tokens): measure only if kv2
        # holds with margin
        "int8_ph8x2_42x21_kv4": lambda: sample(
            qparams, phases=[(8, 2), (42, 21)], reuse_attn=kv4),
        "int8_ph10x2_40x10_kv4": lambda: sample(
            qparams, phases=[(10, 2), (40, 10)], reuse_attn=kv4),
        # bf16 turbo composition (no int8): isolates the turbo error from
        # the quant error — gates the latency-oriented b1 bf16 serving mode
        # (PARITY: b1 int8 loses to b1 bf16, so low-latency serving is bf16)
        "bf16_turbo3_cfg3_deep3": lambda: sample(params, interval=3,
                                                 cfg_interval=3,
                                                 deep_interval=3),
        # phased bf16 rows: candidate upgrades for the b1 latency mode
        # (phases dominate uniform k at equal key budget on the int8 path;
        # check the same holds without quant error in the mix)
        "bf16_ph10x2_40x8": lambda: sample(params,
                                           phases=[(10, 2), (40, 8)]),
        "bf16_ph10x2_40x10": lambda: sample(params,
                                            phases=[(10, 2), (40, 10)]),
        "bf16_ph10x2_40x20": lambda: sample(params,
                                            phases=[(10, 2), (40, 20)]),
    }
    assert set(rows) == set(ROW_NAMES), "ROW_NAMES drifted from rows{}"
    for name in names:
        gate(name, rows[name]())


def main_control():
    """ControlNet-path fan-in proxy (GATE_SET=control): SSIM of the int8
    control turbo variants vs the exact bf16 control sampler, shared
    random fan-in weights, shared canny hint. The direct twin
    (tools/e2e_gate.py GATE_SET=control) saturates at the int8 floor
    (0.99898 across all rows) — this is the discriminating regime."""
    names = _gate_names(CTL_ROW_NAMES, default=CTL_ROW_NAMES)
    from pfd_tpu import annotators

    cfg = config.model_cfg("pfd_seecoder_with_controlnet")["args"]
    cfg["vae_cfg_list"][0][1]["args"].setdefault("lossconfig", None)
    cfg["ctx_cfg_list"][0][1]["args"]["imencoder_cfg"]["args"][
        "drop_path_rate"] = 0.0
    model = registry.get("pfd_with_control")(**cfg, policy=BF16)
    params = _dezero(model.init(jax.random.PRNGKey(1)))

    rng = np.random.default_rng(5)
    rng2 = np.random.default_rng(1005)
    ref_np, x_np = _sample_grid(
        N_SAMPLES,
        lambda: (np.asarray(rng.random((1, 512, 512, 3)), np.float32),
                 np.asarray(rng.standard_normal((1, 64, 64, 4)), np.float32)),
        lambda n: [np.asarray(rng2.random((1, 512, 512, 3)), np.float32)
                   for _ in range(n)],
        lambda n: [np.asarray(rng2.standard_normal((1, 64, 64, 4)),
                              np.float32) for _ in range(n)])
    ref_img = jnp.asarray(ref_np)
    x_start = jnp.asarray(x_np)
    # one hint source per reference image (sample i -> hint[i // n_seeds]);
    # hint 0 reproduces the legacy stream position (drawn after ref0/x0)
    hint_srcs = [rng.random((512, 512, 3), dtype=np.float32)]
    if N_SAMPLES > 1:
        hint_srcs.append(rng2.random((512, 512, 3), dtype=np.float32))
    hints = np.stack([np.asarray(annotators.preprocess(
        h, method="canny", size=(512, 512))) for h in hint_srcs])
    hint = jnp.asarray(np.repeat(hints, N_SAMPLES // len(hint_srcs), axis=0))

    def sample(p, interval=1, cfg_interval=1, deep_interval=1, phases=None,
               reuse_attn=None):
        c = model.ctx_encode(p, ref_img, "image")
        sampler = DDIMSampler(model)
        x, _ = sampler.sample(
            p, jax.random.PRNGKey(0), x_start.shape,
            x_info={"xt": x_start},
            c_info={"conditioning": c,
                    "unconditional_conditioning": jnp.zeros_like(c),
                    "unconditional_guidance_scale": 2.0,
                    "control": hint},
            steps=50, eta=0.0, self_attn_fn=self_attn_fn,
            encoder_interval=interval, cfg_interval=cfg_interval,
            deep_interval=deep_interval, phases=phases,
            reuse_self_attn_fn=reuse_attn)
        return np.asarray(model.vae_decode(p, x, "image"))

    img_fp = sample(params)
    print("ctl fp done", flush=True)
    qparams = dict(params)
    for k in ("diffuser", "vae", "ctl"):
        if k in qparams:
            qparams[k] = quant.quantize_params(params[k])

    from pfd_tpu.ops.kvpool import make_kvpool_attn
    ctl_kv2 = make_kvpool_attn(self_attn_fn, (64, 64), pool=2)

    def gate(name, img):
        per = _ssim_stats(img, img_fp)
        print(json.dumps({
            f"fullsize_ddim50_ssim_{name}_vs_bf16": round(min(per), 5),
            "mean": round(float(np.mean(per)), 5),
            "s0": round(per[0], 5), "n": len(per),
            "per_sample": [round(s, 5) for s in per],
            "finite": bool(np.isfinite(img).all()),
        }), flush=True)

    rows = {
        "ctl_int8": lambda: sample(qparams),
        "ctl_int8_cfg2": lambda: sample(qparams, cfg_interval=2),
        "ctl_int8_turbo2_cfg2": lambda: sample(qparams, interval=2,
                                               cfg_interval=2),
        "ctl_int8_turbo2_cfg2_deep2": lambda: sample(qparams, interval=2,
                                                     cfg_interval=2,
                                                     deep_interval=2),
        "ctl_int8_turbo3_cfg3_deep3": lambda: sample(qparams, interval=3,
                                                     cfg_interval=3,
                                                     deep_interval=3),
        # phased control (phases ride the cfg-reuse group scan with the
        # encoder cache, so control residuals compose): k=5 key budget at
        # the dense-early quality premium measured on the plain path
        "ctl_int8_ph10x2_40x8": lambda: sample(qparams,
                                               phases=[(10, 2), (40, 8)]),
        # sparser control tails: ctl ph10x2_40x8 held 0.99042 min-over-8
        # (control quality degrades SLOWER than the plain path under
        # phases — the hint pins the trajectory), so probe toward the
        # same 7-key budget that passed plain
        "ctl_int8_ph10x2_40x10": lambda: sample(qparams,
                                                phases=[(10, 2), (40, 10)]),
        "ctl_int8_ph10x2_40x20": lambda: sample(qparams,
                                                phases=[(10, 2), (40, 20)]),
        # KV-pooled reuse attention on the promoted control schedule
        # (control reuse steps run the same ds1-only level, so the wrapper
        # composes identically to the plain path)
        "ctl_int8_ph10x2_40x20_kv2": lambda: sample(
            qparams, phases=[(10, 2), (40, 20)], reuse_attn=ctl_kv2),
    }
    assert set(rows) == set(CTL_ROW_NAMES), "CTL_ROW_NAMES drifted"
    for name in names:
        gate(name, rows[name]())


if __name__ == "__main__":
    if os.environ.get("GATE_SET") == "control":
        main_control()
    else:
        main()
