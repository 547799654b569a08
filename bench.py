"""Benchmarks for the five BASELINE.md configs (TPU v5e, one chip).

Default (driver contract): prints ONE JSON line — the headline metric,
512x512 images/sec/chip at DDIM-50 on BASELINE config #1 (SD-v1-5 +
seecoder, no ControlNet).

BENCH_CONFIGS=all additionally benchmarks the other BASELINE.md configs,
one JSON line each, headline LAST (the driver parses the final line):

  zoo_swap    — style-zoo checkpoint hot-swap: pytree swap must not recompile
                (app.py:137-195 semantics; all diffusers share one structure)
  controlnet  — ControlNet branch on (canny/depth share this compute path:
                50x2 extra encoder forwards, reference pfd.py:473)
  preprocess  — full annotator stack, per-method milliseconds @512^2
  dp_serve    — batch-8 mixed-reference serving (8 distinct reference images,
                per-sample contexts): the per-chip share of the 8-way DP config

Env knobs: BENCH_BATCH/STEPS/SIZE/FLASH/ENCODER_INTERVAL/CFG_INTERVAL/
DEEP_INTERVAL/ITERS/CONFIGS/QUANT/TOME/PHASES. Default serving config
(round 5): batch 8, int8 convs + the PHASED turbo schedule "8x2,42x21"
(8 steps at interval 2 then 42 at interval 21 — encoder propagation,
CFG-delta reuse and DeepCache all keyed on the same steps) — SSIM-gated
DIRECTLY vs torch-fp32 at the 512^2/DDIM-50 operating point
(tools/e2e_gate.py, gate >= 0.95) AND min-over-8-samples under the
sensitive fan-in proxy vs the exact bf16 sampler (0.97386,
tools/quant_gate.py). Quality-conservative alternatives:
BENCH_PHASES=10x2,40x10 (proxy min 0.98760, 3.35 img/s) or the round-4
uniform BENCH_{ENCODER,CFG,DEEP}_INTERVAL=3 (proxy min 0.98059,
2.42 img/s); BENCH_QUANT=0 + BENCH_PHASES="" + intervals=1 restore the
exact bf16 sampler.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from pfd_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def _env_int(name, default):
    return int(os.environ.get(name, str(default)))


# batch 8 is the measured optimum under CFG-delta reuse (round-4 sweep:
# b4 1.50, b8 1.78 turbo2+cfg2; b8 1.93 deep2, 2.37 deep3): reuse steps
# run the conditional half alone (model batch n, not 2n), so b8's reuse
# steps execute at model batch 8 where convs are efficient while b4's
# collapse (the known int8 small-batch cliff: b2 0.66, b4 1.22, b6 0.96,
# b8 1.16 exact-sampler sweep 2026-08-17). BENCH_QUANT=0 restores bf16.
BATCH = _env_int("BENCH_BATCH", 8)
STEPS = _env_int("BENCH_STEPS", 50)
SIZE = _env_int("BENCH_SIZE", 512)
ITERS = _env_int("BENCH_ITERS", 3)
USE_FLASH = os.environ.get("BENCH_FLASH", "1") == "1"
# Encoder propagation (Faster Diffusion, diffusion/ddim.py:239-272) is
# promoted to the default serving/bench config: SSIM-gated DIRECTLY vs the
# torch-fp32 reference at the operating point (int8+interval-2 = 0.99903,
# tools/e2e_gate.py; BASELINE gate is >= 0.95). Output-changing — the metric
# name carries a _turbo2 suffix; BENCH_ENCODER_INTERVAL=1 restores the exact
# sampler. ControlNet keeps interval 1 unless explicitly overridden (cached
# encoder skips would hold stale control residuals — ungated).
_ENC_ENV = "BENCH_ENCODER_INTERVAL" in os.environ
ENC_INTERVAL = _env_int("BENCH_ENCODER_INTERVAL", 3)
# CFG-delta reuse (diffusion/ddim.py sample_fn): the uncond half runs every
# k-th step only; in between the conditional half alone is evaluated and the
# guidance delta is extrapolated. Default ON at k=3 (round 4): gated
# directly vs torch-fp32 (e2e_gate int8_turbo3_cfg3_deep3 = 0.99898) and
# under the sensitive fan-in proxy (quant_gate turbo3_cfg3 0.98252).
CFG_INTERVAL = _env_int("BENCH_CFG_INTERVAL", 3)
# BENCH_CFG_EXTRAPOLATE=linear: first-order guidance-delta extrapolation on
# reuse steps (ddim.py sample_fn) — same cost as const, gated separately
# (metric suffix becomes _cfg{K}lin).
CFG_EXTRAPOLATE = os.environ.get("BENCH_CFG_EXTRAPOLATE", "const")
# DeepCache (ddim.py deep_interval): reuse steps run only the highest-res
# UNet level. Requires BENCH_CFG_INTERVAL == BENCH_DEEP_INTERVAL. Default
# ON at k=3 (round 4): SSIM-free on top of cfg3 under the fan-in proxy
# (0.98252 -> 0.98177, quant_gate) and 0.99898 direct vs torch-fp32.
DEEP_INTERVAL = _env_int("BENCH_DEEP_INTERVAL", 3)

# BENCH_PHASES="10x2,40x5": phased turbo schedule (ddim.py sample_fn
# phases=...) — the first 10 steps at maximal-turbo interval 2, the last 40
# at interval 5 (kx1 phases run the exact sampler). Overrides the uniform
# interval knobs (they are forced to 1); metric suffix _ph10x2-40x5.
#
# DEFAULT (round-5 promotion): "8x2,42x21" — 6 key steps, dense head where
# guidance bends the trajectory most. Gated on BOTH regimes: fan-in proxy
# min-over-8 0.97386 (tools/quant_gate.py int8_ph8x2_42x21) and direct vs
# torch-fp32 (tools/e2e_gate.py), gate >= 0.95; 3.8947 img/s/chip measured
# (1.95x the 2.0 target) vs 2.42 for uniform turbo3. BENCH_PHASES="" (or
# setting any BENCH_*_INTERVAL knob) restores the uniform-interval path;
# quality-conservative phased alternative: "10x2,40x10" (proxy min
# 0.98760, 3.3487 img/s).


def _parse_phases(spec):
    if not spec:
        return None
    return [(int(n), int(k)) for n, k in
            (part.split("x") for part in spec.split(","))]


def _ph_suffix(phases, extrapolate="const"):
    if not phases:
        return ""
    return ("_ph" + "-".join(f"{n}x{k}" for n, k in phases)
            + ("lin" if extrapolate == "linear" else ""))


_UNIFORM_ENV = any(f"BENCH_{k}_INTERVAL" in os.environ
                   for k in ("ENCODER", "CFG", "DEEP"))
# the default schedule sums to 50 steps — fall back to uniform intervals
# when BENCH_STEPS is changed without an explicit BENCH_PHASES
PHASES = _parse_phases(os.environ.get(
    "BENCH_PHASES",
    "" if (_UNIFORM_ENV or STEPS != 50) else "8x2,42x21"))
if PHASES is not None:
    ENC_INTERVAL = CFG_INTERVAL = DEEP_INTERVAL = 1


TOME = float(os.environ.get("BENCH_TOME", "0"))


def _ctl_phases():
    """Phased control schedule (BENCH_CTL_PHASES; rides the encoder cache, so
    control residuals compose). DEFAULT (round-5 promotion): "10x2,40x20" —
    gated min-over-8 0.98612 under the control fan-in proxy
    (GATE_SET=control tools/quant_gate.py) + direct vs torch-with-control
    (GATE_SET=control tools/e2e_gate.py). The hint pins the trajectory, so
    control degrades SLOWER than the plain path at equal sparsity (7-key
    0.98612 vs the promoted 13-key uniform turbo3's 0.98406). "" (or any
    BENCH_CTL_*_INTERVAL knob) restores the uniform-interval control path."""
    uniform = any(f"BENCH_CTL_{k}_INTERVAL" in os.environ
                  for k in ("ENCODER", "CFG", "DEEP"))
    return _parse_phases(os.environ.get(
        "BENCH_CTL_PHASES",
        "" if (uniform or STEPS != 50) else "10x2,40x20"))


def _attn():
    if not USE_FLASH:
        return None
    from pfd_tpu.ops.flash_attention import self_attn_fn
    if TOME > 0:
        # ds1 token merging (ops/tome.py) — output-changing turbo,
        # SSIM-gated via tools/e2e_gate.py like encoder propagation
        from pfd_tpu.ops.tome import make_tome_attn
        return make_tome_attn(self_attn_fn, (SIZE // 8, SIZE // 8),
                              ratio=TOME)
    return self_attn_fn


QUANT = os.environ.get("BENCH_QUANT", "1") == "1"

# BENCH_KVPOOL=2: KV-pooled self-attention on turbo REUSE steps only
# (ops/kvpool.py — key steps keep exact attention). Output-changing,
# opt-in pending its gate rows (quant_gate/e2e_gate `_kv2` variants).
KVPOOL = _env_int("BENCH_KVPOOL", 0)


# BENCH_CTL_KVPOOL=2: same, for the ControlNet configs (control reuse
# steps run the same ds1-only level; `ctl_..._kv2` gate rows)
CTL_KVPOOL = _env_int("BENCH_CTL_KVPOOL", 0)


def _reuse_attn(attn, size, pool=None):
    pool = KVPOOL if pool is None else pool
    if pool <= 1:
        return None
    from pfd_tpu.ops.kvpool import make_kvpool_attn
    if attn is None:
        from pfd_tpu.ops import nn
        attn = nn.dot_product_attention
    return make_kvpool_attn(attn, (size // 8, size // 8), pool=pool)


def build(with_control=False, quantized=None):
    from pfd_tpu import config, registry
    from pfd_tpu.diffusion.ddim import DDIMSampler
    from pfd_tpu.policy import BF16

    name = "pfd_seecoder_with_controlnet" if with_control else "pfd_seecoder"
    cfg = config.model_cfg(name)
    model = registry.get(cfg["type"])(**cfg["args"], policy=BF16)
    params = model.init(jax.random.PRNGKey(0))
    if QUANT if quantized is None else quantized:
        # int8 serving mode (ops/quant.py; SSIM-gated in tests/test_quant_e2e)
        from pfd_tpu.ops import quant
        params["diffuser"] = quant.quantize_params(params["diffuser"])
        params["vae"] = quant.quantize_params(params["vae"])
        if "ctl" in params:
            params["ctl"] = quant.quantize_params(params["ctl"])
    return model, params, DDIMSampler(model)


def make_e2e(model, sampler, tables, *, batch, with_control=False,
             mixed_refs=False, enc_interval=None, ctl_cfg_interval=1,
             ctl_deep_interval=1, ctl_phases=None):
    """One jitted program: SeeCoder encode -> CFG DDIM scan -> VAE decode."""
    attn = _attn()
    interval = ENC_INTERVAL if enc_interval is None else enc_interval

    def e2e(params, rng, ref_image, hint):
        c = model.ctx_encode(params, ref_image, "image")
        if not mixed_refs:
            c = jnp.tile(c, (batch, 1, 1))
        u = jnp.zeros_like(c)
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, (batch, SIZE // 8, SIZE // 8, 4),
                              jnp.float32)
        c_info = {"conditioning": c, "unconditional_conditioning": u,
                  "unconditional_guidance_scale": 2.0}
        if with_control:
            c_info["control"] = hint
        x, _ = sampler.sample_fn(params, rng, x, c_info, tables,
                                 self_attn_fn=attn,
                                 encoder_interval=interval,
                                 cfg_interval=ctl_cfg_interval
                                 if with_control else CFG_INTERVAL,
                                 deep_interval=ctl_deep_interval
                                 if with_control else DEEP_INTERVAL,
                                 cfg_extrapolate="const" if with_control
                                 else CFG_EXTRAPOLATE,
                                 phases=ctl_phases if with_control else PHASES,
                                 reuse_self_attn_fn=_reuse_attn(
                                     attn, SIZE, pool=CTL_KVPOOL)
                                 if with_control
                                 else _reuse_attn(attn, SIZE))
        return model.vae_decode(params, x, "image")

    return jax.jit(e2e)


def _force(out):
    """Value fetch — the only reliable execution barrier on the axon backend
    (block_until_ready can return before the program runs; CLAUDE.md)."""
    return float(jnp.sum(out.astype(jnp.float32)))


def throughput(fn, params, args, iters=ITERS):
    """(images/sec for BATCH images per call, steady-state seconds per call).

    Each call's output feeds a scalar fetch so the chain of `iters` calls is
    provably executed inside the timed window; the single end fetch adds one
    tunnel roundtrip (~50 ms), amortized over `iters` multi-second calls."""
    out = fn(params, jax.random.PRNGKey(1), *args)
    _force(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(params, jax.random.PRNGKey(2 + i), *args)
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    return BATCH / dt, dt


def emit(obj):
    print(json.dumps(obj), flush=True)


def bench_headline(shared):
    model, params, sampler = shared["plain"]
    fn = make_e2e(model, sampler, shared["tables"], batch=BATCH)
    ref = jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    ips, _ = throughput(fn, params, (ref, None))
    shared["headline"] = {
        "metric": f"{SIZE}x{SIZE}_images_per_sec_per_chip_ddim{STEPS}"
                  + ("_int8" if QUANT else "")
                  + (f"_turbo{ENC_INTERVAL}" if ENC_INTERVAL > 1 else "")
                  + (f"_cfg{CFG_INTERVAL}{'lin' if CFG_EXTRAPOLATE == 'linear' else ''}" if CFG_INTERVAL > 1 else "")
                  + (f"_deep{DEEP_INTERVAL}" if DEEP_INTERVAL > 1 else "")
                  + _ph_suffix(PHASES, CFG_EXTRAPOLATE)
                  + (f"_kv{KVPOOL}" if KVPOOL > 1 else "")
                  + (f"_tome{TOME:g}" if TOME > 0 else ""),
        "value": round(ips, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / 2.0, 4),
    }
    shared["headline_fn"] = (fn, ref)


def bench_zoo_swap(shared):
    """Hot-swap = pytree swap, zero recompile: steady-state latency with the
    swapped-in diffuser/SeeCoder params must match the warm latency."""
    model, params, sampler = shared["plain"]
    fn, ref = shared["headline_fn"]
    _, warm_dt = throughput(fn, params, (ref, None), iters=2)

    # "Anything-v4 + SeeCoder-Anime" stand-in: same structure, new values
    # (zoo files are not shipped in this environment; the contract under test
    # is structural identity -> no recompile, pfd.py:297-304 invariant)
    t0 = time.perf_counter()
    def perturb(a):
        return a * 1.0001 if jnp.issubdtype(a.dtype, jnp.floating) else a

    swapped = dict(params)
    swapped["diffuser"] = jax.tree.map(perturb, params["diffuser"])
    swapped["ctx"] = jax.tree.map(perturb, params["ctx"])
    # force the swap's execution with a value fetch (block_until_ready is
    # unreliable on axon — see _force)
    _force(jax.tree.leaves(swapped["diffuser"])[0])
    swap_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    out = fn(swapped, jax.random.PRNGKey(7), ref, None)
    _force(out)
    first_dt = time.perf_counter() - t0
    emit({"metric": "zoo_swap_first_request_overhead",
          "value": round(max(first_dt - warm_dt, 0.0) * 1e3, 1), "unit": "ms",
          "swap_ms": round(swap_ms, 1),
          "recompiled": bool(first_dt > 2.0 * warm_dt),
          "vs_baseline": round((BATCH / first_dt) / 2.0, 4)})


def bench_controlnet(shared):
    from pfd_tpu import annotators
    import numpy as np

    model, params, sampler = build(with_control=True)
    rng = np.random.default_rng(0)
    img = rng.random((SIZE, SIZE, 3), dtype=np.float32)
    hint = annotators.preprocess(img, method="canny", size=(SIZE, SIZE))
    hint = jnp.tile(jnp.asarray(hint)[None], (BATCH, 1, 1, 1))
    # control-path turbo intervals (BENCH_CTL_*): default k=3 (round 5) —
    # gated on BOTH regimes: direct vs torch-fp32-with-control 0.99898
    # (GATE_SET=control e2e_gate) and 0.98406 under the control fan-in
    # proxy (GATE_SET=control quant_gate). 1.9296 img/s/chip measured vs
    # 0.8930 exact; BENCH_CTL_*_INTERVAL=1 restores exact control sampling
    # (the pipeline/serving API keeps control requests exact by default).
    ctl_enc = _env_int("BENCH_CTL_ENCODER_INTERVAL",
                       ENC_INTERVAL if _ENC_ENV else 3)
    ctl_cfg = _env_int("BENCH_CTL_CFG_INTERVAL", 3)
    ctl_deep = _env_int("BENCH_CTL_DEEP_INTERVAL", 3)
    ctl_ph = _ctl_phases()
    if ctl_ph is not None:
        ctl_enc = ctl_cfg = ctl_deep = 1
    fn = make_e2e(model, sampler, shared["tables"], batch=BATCH,
                  with_control=True, enc_interval=ctl_enc,
                  ctl_cfg_interval=ctl_cfg, ctl_deep_interval=ctl_deep,
                  ctl_phases=ctl_ph)
    ref = jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    ips, _ = throughput(fn, params, (ref, hint))
    suffix = ((f"_turbo{ctl_enc}" if ctl_enc > 1 else "")
              + (f"_cfg{ctl_cfg}" if ctl_cfg > 1 else "")
              + (f"_deep{ctl_deep}" if ctl_deep > 1 else "")
              + _ph_suffix(ctl_ph)
              + (f"_kv{CTL_KVPOOL}" if CTL_KVPOOL > 1 else ""))
    emit({"metric": f"{SIZE}x{SIZE}_images_per_sec_per_chip_ddim{STEPS}"
                    f"_controlnet{suffix}",
          "value": round(ips, 4), "unit": "images/sec/chip",
          "vs_baseline": round(ips / 2.0, 4)})


def bench_preprocess(shared):
    from pfd_tpu import annotators
    import numpy as np

    def random_init(method):
        """Shape-correct random params when the pretrained checkpoint is
        absent (nets/_specs.py) — FLOP-identical to the real weights, so
        the timing is honest; the row is labeled `_random_init`."""
        key = jax.random.PRNGKey(0)
        if method == "hed":
            from pfd_tpu.annotators.nets import hed
            return hed.init_params(key)
        if method == "scribble":
            from pfd_tpu.annotators.nets import pidinet
            return pidinet.init_params(key)
        if method == "mlsd":
            from pfd_tpu.annotators.nets import mlsd
            return mlsd.init_params(key)
        if method == "depth":
            from pfd_tpu.annotators.nets import midas
            return midas.init_params(key)
        if method == "openpose":
            from pfd_tpu.annotators.nets import openpose
            return openpose.init_detector_params(key)
        return None

    rng = np.random.default_rng(0)
    img = rng.random((SIZE, SIZE, 3), dtype=np.float32)
    per_method = {}
    for method in ["canny", "hed", "scribble", "mlsd", "depth", "openpose"]:
        name, params = method, None
        try:
            try:
                annotators.preprocess(img, method=method, size=(SIZE, SIZE))
            except FileNotFoundError:
                params = random_init(method)
                name = f"{method}_random_init"
                annotators.preprocess(img, method=method, size=(SIZE, SIZE),
                                      params=params)  # warm
            t0 = time.perf_counter()
            for _ in range(3):
                annotators.preprocess(img, method=method, size=(SIZE, SIZE),
                                      params=params)
            per_method[name] = round((time.perf_counter() - t0) / 3 * 1e3, 1)
        except Exception as e:  # noqa: BLE001
            per_method[name] = f"error: {type(e).__name__}"
    emit({"metric": "preprocess_stack_ms_per_image", "value": per_method,
          "unit": "ms", "vs_baseline": None})


def bench_dp_serve(shared):
    """Mixed-reference batch: 8 distinct reference images -> 8 contexts.
    One chip's share of the BASELINE 8-way DP serving config (the DP axis is
    embarrassingly parallel; multi-chip sharding is validated by
    __graft_entry__.dryrun_multichip on the virtual mesh)."""
    model, params, sampler = shared["plain"]
    dp_batch = _env_int("BENCH_DP_BATCH", 8)   # BASELINE.md batch-8 config
    fn = make_e2e(model, sampler, shared["tables"], batch=dp_batch,
                  mixed_refs=True)
    refs = jax.random.uniform(jax.random.PRNGKey(3),
                              (dp_batch, SIZE, SIZE, 3), jnp.bfloat16)
    out = fn(params, jax.random.PRNGKey(1), refs, None)
    _force(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(params, jax.random.PRNGKey(2 + i), refs, None)
    _force(out)
    dt = (time.perf_counter() - t0) / ITERS
    ips = dp_batch / dt
    emit({"metric": f"{SIZE}x{SIZE}_images_per_sec_per_chip_mixed_ref_batch{dp_batch}"
                    + (f"_turbo{ENC_INTERVAL}" if ENC_INTERVAL > 1 else "")
                    + (f"_cfg{CFG_INTERVAL}{'lin' if CFG_EXTRAPOLATE == 'linear' else ''}" if CFG_INTERVAL > 1 else "")
                    + (f"_deep{DEEP_INTERVAL}" if DEEP_INTERVAL > 1 else "")
                    + _ph_suffix(PHASES, CFG_EXTRAPOLATE)
                    + (f"_kv{KVPOOL}" if KVPOOL > 1 else "")
                    + (f"_tome{TOME:g}" if TOME > 0 else ""),
          "value": round(ips, 4), "unit": "images/sec/chip",
          "vs_baseline": round(ips / 2.0, 4)})


def bench_latency(shared):
    """BASELINE named metric: p50 end-to-end image->image latency, batch 1.

    The low-latency serving mode is bf16 (b1 int8 loses to b1 bf16 —
    PARITY round 4) with the gated turbo composition. DEFAULT (round-5
    promotion): phased "10x2,40x8" (bf16_ph10x2_40x8 proxy min-over-8
    0.99321 — the bf16 phased schedule out-scores uniform turbo3's
    0.98542 at similar cost). BENCH_LAT_PHASES overrides ("" selects
    uniform turbo3+cfg3+deep3); BENCH_LAT_EXACT=1 restores the exact
    bf16 sampler."""
    from pfd_tpu.diffusion.ddim import DDIMSampler  # noqa: F401 (build path)

    exact = os.environ.get("BENCH_LAT_EXACT") == "1"
    phases = _parse_phases(os.environ.get(
        "BENCH_LAT_PHASES", "10x2,40x8" if STEPS == 50 else ""))
    model, params, sampler = build(with_control=False, quantized=False)
    attn = _attn()

    def e2e(p, rng, ref_image):
        c = model.ctx_encode(p, ref_image, "image")
        u = jnp.zeros_like(c)
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, (1, SIZE // 8, SIZE // 8, 4),
                              jnp.float32)
        iv = 1 if (exact or phases) else 3
        x, _ = sampler.sample_fn(
            p, rng, x,
            {"conditioning": c, "unconditional_conditioning": u,
             "unconditional_guidance_scale": 2.0},
            shared["tables"], self_attn_fn=attn,
            encoder_interval=iv, cfg_interval=iv, deep_interval=iv,
            phases=None if exact else phases)
        return model.vae_decode(p, x, "image")

    fn = jax.jit(e2e)
    ref = jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16)
    _force(fn(params, jax.random.PRNGKey(1), ref))  # compile
    lats = []
    for i in range(max(ITERS * 3, 9)):
        t0 = time.perf_counter()
        _force(fn(params, jax.random.PRNGKey(2 + i), ref))
        lats.append(time.perf_counter() - t0)
    lats.sort()
    p50 = lats[len(lats) // 2]
    suffix = ("_exact" if exact else
              (_ph_suffix(phases) if phases else "_turbo3_cfg3_deep3"))
    emit({"metric": f"{SIZE}x{SIZE}_p50_latency_s_b1_bf16{suffix}",
          "value": round(p50, 4), "unit": "s/image",
          "p90": round(lats[(len(lats) * 9) // 10], 4),
          "vs_baseline": round((1.0 / p50) / 2.0, 4)})


def bench_zoo_serve(shared):
    """BASELINE config #5 AS WRITTEN: batch-8 serving with per-request
    MIXED CHECKPOINTS (2 diffuser tags — same pytree structure, the
    hot-swap contract app.py:137-162) AND per-request ControlNet on/off
    (zero-hint ccs_zeros semantics via control_mask, pfd.py:475-478),
    through parallel/zoo_serve.py grouped mode (this chip's share of the
    8-way DP layout; the per-device-checkpoint sharded mode is validated
    on the virtual mesh by tests/test_zoo_serve.py)."""
    from pfd_tpu import annotators
    from pfd_tpu.parallel import mesh as mesh_lib
    from pfd_tpu.parallel.zoo_serve import ZooServer
    import numpy as np

    model, params, sampler = build(with_control=True)

    def perturb(a):
        return a * 1.0001 if jnp.issubdtype(a.dtype, jnp.floating) else a

    zoo = {"ckpt_a": params["diffuser"],
           "ckpt_b": jax.tree.map(perturb, params["diffuser"])}
    mesh = mesh_lib.make_mesh(jax.devices(), tp=1)
    ctl_enc = _env_int("BENCH_CTL_ENCODER_INTERVAL", 3)
    ctl_cfg = _env_int("BENCH_CTL_CFG_INTERVAL", 3)
    ctl_deep = _env_int("BENCH_CTL_DEEP_INTERVAL", 3)
    ctl_ph = _ctl_phases()
    if ctl_ph is not None:
        ctl_enc = ctl_cfg = ctl_deep = 1
    server = ZooServer(model, params, zoo, mesh=mesh, steps=STEPS,
                       self_attn_fn=_attn(), encoder_interval=ctl_enc,
                       cfg_interval=ctl_cfg, deep_interval=ctl_deep,
                       control_turbo=True, phases=ctl_ph)

    rng = np.random.default_rng(0)
    b = _env_int("BENCH_DP_BATCH", 8)
    refs = rng.random((b, SIZE, SIZE, 3), dtype=np.float32)
    hint = annotators.preprocess(rng.random((SIZE, SIZE, 3),
                                            dtype=np.float32),
                                 method="canny", size=(SIZE, SIZE))
    hints = np.tile(np.asarray(hint)[None], (b, 1, 1, 1))
    tags = ["ckpt_a" if i % 2 == 0 else "ckpt_b" for i in range(b)]
    on = [i % 4 < 2 for i in range(b)]   # half the requests use control

    out = server.generate(refs, tags, hints=hints, control_on=on,
                          h=SIZE, w=SIZE, seed=1)
    _force(out)
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = server.generate(refs, tags, hints=hints, control_on=on,
                              h=SIZE, w=SIZE, seed=2 + i)
    _force(out)
    dt = (time.perf_counter() - t0) / ITERS
    ips = b / dt
    suffix = ((f"_turbo{ctl_enc}" if ctl_enc > 1 else "")
              + (f"_cfg{ctl_cfg}" if ctl_cfg > 1 else "")
              + (f"_deep{ctl_deep}" if ctl_deep > 1 else "")
              + _ph_suffix(ctl_ph))
    emit({"metric": f"{SIZE}x{SIZE}_images_per_sec_per_chip_mixed_ckpt_ctl"
                    f"_batch{b}{suffix}",
          "value": round(ips, 4), "unit": "images/sec/chip",
          "vs_baseline": round(ips / 2.0, 4)})


def _wait_for_tpu(max_wait_s=_env_int("BENCH_WAIT_TPU_S", 1800)):
    """The axon tunnel flaps: backend init either raises UNAVAILABLE or
    hangs. Probe it in a subprocess (so a hang can't wedge this process)
    and retry for a bounded window before starting the bench proper.
    BENCH_WAIT_TPU_S=0 disables."""
    import subprocess
    import sys

    probe = ("import jax; jax.devices(); import jax.numpy as jnp; "
             "print(float(jnp.ones((8, 8)).sum()))")
    deadline = time.time() + max_wait_s
    first = True
    while True:
        try:
            budget = max(10.0, min(240.0, deadline - time.time()))
            r = subprocess.run([sys.executable, "-c", probe], timeout=budget,
                               capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False  # proceed; the real init will surface the error
        if first:
            print(json.dumps({"info": "TPU tunnel unavailable; retrying",
                              "max_wait_s": max_wait_s}), flush=True)
            first = False
        time.sleep(20)


def _claim_tpu_priority():
    """Signal cooperating background measurement queues (the /tmp drive
    scripts) to yield the single TPU: they pause — and preempt their
    in-flight task — while /tmp/tpu_yield exists. Removed at exit. The
    queues set BENCH_NO_YIELD=1 for their own bench invocations (else
    they would preempt themselves)."""
    import atexit
    if os.environ.get("BENCH_NO_YIELD"):
        return
    try:
        with open("/tmp/tpu_yield", "w") as f:
            f.write(str(os.getpid()))
        atexit.register(lambda: os.path.exists("/tmp/tpu_yield")
                        and os.remove("/tmp/tpu_yield"))
    except OSError:
        pass


def main():
    which = os.environ.get("BENCH_CONFIGS", "headline")
    _claim_tpu_priority()
    if _env_int("BENCH_WAIT_TPU_S", 600) > 0:
        _wait_for_tpu()
    shared = {}
    shared["plain"] = build(with_control=False)
    shared["tables"] = shared["plain"][2].make_tables(STEPS, 0.0)

    if which == "controlnet":
        bench_controlnet(shared)
        return
    bench_headline(shared)
    if which == "zoo_serve":
        bench_zoo_serve(shared)
        return
    if which == "latency":
        bench_latency(shared)
        return
    if which == "all":
        bench_zoo_swap(shared)
        bench_preprocess(shared)
        bench_dp_serve(shared)
        bench_controlnet(shared)
        bench_zoo_serve(shared)
        bench_latency(shared)
    emit(shared["headline"])  # headline LAST: the driver parses the final line


if __name__ == "__main__":
    main()
