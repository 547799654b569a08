"""TPU perf audit for the DDIM hot loop — op-level attribution + roofline.

Timing is the **fetch-forced slope method** (:func:`timeit`): the axon
remote backend defers compile AND execution until a value is actually
fetched — ``block_until_ready`` is effectively a no-op — so both in-graph
``lax.fori_loop`` timing and naive dispatch timing collapse to ~0. What
does work: build a feedback chain of N dispatches, force it with a scalar
``jnp.sum`` fetch, do the same for 2N, and take ``(t_2N - t_N) / N`` —
fixed costs (tunnel roundtrip, queue flush) cancel in the difference.
Validated: a 4096^3 bf16 matmul times at 0.714 ms = 96% of the v5e MXU
peak; the per-dispatch floor is ~0.115 ms (ops cheaper than ~0.3 ms are
below the method's resolution).

Hot path being attributed (reference pfd.py:314-365 + ddim.py:145-150):
one CFG-doubled UNet forward = batch 2N at latent (H/8, W/8), 50x per image.

Usage:  python -m pfd_tpu.tools.perf_audit  (TPU; ~10-20 min first compile)
Env:    AUDIT_BATCH (default 8 -> 16 CFG), AUDIT_SIZE (512), AUDIT_ITERS (20)
"""

from __future__ import annotations

import json
import os

from pfd_tpu.utils.compile_cache import enable_compile_cache
import time

import jax

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

V5E_PEAK_TFLOPS = 197.0   # bf16
V5E_HBM_GBPS = 819.0


def _fetch(x):
    """Force execution of everything `x` depends on; returns a host scalar."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _chain_fetch_time(jfn, carry, n):
    out = carry
    for _ in range(n):
        out = jfn(out)
    t0 = time.perf_counter()
    _fetch(out)
    return time.perf_counter() - t0


def timeit(fn, carry, iters, reps=3, params=None):
    """Mean seconds per fn application, fetch-forced slope method (see module
    docstring). `fn` must be shape/dtype-preserving (output feeds back).

    Pass big weight pytrees via `params` (fn becomes fn(params, x)) — a fn
    that *closes over* gigabyte-scale params embeds them as program
    constants, which reliably kills the axon remote compiler (broken pipe
    after ~1h); as a traced argument the same program compiles in minutes.
    """
    if params is not None:
        jraw = jax.jit(fn)
        jfn = lambda x: jraw(params, x)  # noqa: E731
    else:
        jfn = jax.jit(fn)
    _fetch(jfn(carry))  # compile via a real fetch
    vals = []
    for _ in range(reps):
        t1 = _chain_fetch_time(jfn, carry, iters)
        t2 = _chain_fetch_time(jfn, carry, 2 * iters)
        vals.append((t2 - t1) / iters)
    vals.sort()
    return max(vals[len(vals) // 2], 1e-9)


def report_row(name, sec, flops=None, bytes_moved=None):
    row = {"op": name, "ms": round(sec * 1e3, 3)}
    if flops:
        row["tflops_s"] = round(flops / sec / 1e12, 1)
        row["mfu_pct"] = round(100 * flops / sec / 1e12 / V5E_PEAK_TFLOPS, 1)
    if bytes_moved:
        row["gb_s"] = round(bytes_moved / sec / 1e9, 1)
        row["hbm_pct"] = round(100 * bytes_moved / sec / 1e9 / V5E_HBM_GBPS, 1)
    print(json.dumps(row), flush=True)
    return row


_BASELINE = None


def _fetch_baseline():
    """Median cost of one dispatch+fetch of a trivial program (tunnel floor)."""
    global _BASELINE
    if _BASELINE is None:
        f = jax.jit(lambda x: x + 1)
        tiny = jnp.zeros((8, 128), jnp.bfloat16)
        _fetch(f(tiny))
        ts = []
        for _ in range(7):
            t0 = time.perf_counter()
            _fetch(f(tiny))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        _BASELINE = ts[len(ts) // 2]
    return _BASELINE


def timeit_dispatch(fn, *args, iters=5):
    """Mean seconds per jitted call for fns whose output shape differs from
    the input (not chainable): each call is fetch-forced individually and the
    trivial dispatch+fetch floor is subtracted."""
    jfn = jax.jit(fn)
    _fetch(jfn(*args))
    base = _fetch_baseline()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _fetch(jfn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(ts[len(ts) // 2] - base, 1e-9)


def main():
    from pfd_tpu import config, registry
    from pfd_tpu.ops import nn
    from pfd_tpu.ops.flash_attention import self_attn_fn as flash
    from pfd_tpu.policy import BF16

    n = int(os.environ.get("AUDIT_BATCH", "8"))
    size = int(os.environ.get("AUDIT_SIZE", "512"))
    iters = int(os.environ.get("AUDIT_ITERS", "20"))
    sections = os.environ.get("AUDIT_SECTIONS", "ops,unet").split(",")
    b = 2 * n                      # CFG doubling
    hl = size // 8                 # latent side
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    rows = []

    if "ops" in sections:
        audit_ops(nn, flash, b, hl, key, dt, iters, rows)
    if "fused" in sections:
        audit_fused(nn, b, hl, key, dt, iters, rows)
    if "unet" in sections:
        audit_unet(config, registry, BF16, flash, n, b, hl, size, key, dt,
                   iters, rows)
    if "vae" in sections:
        audit_vae(config, registry, BF16, n, size, key, rows)
    if "upconv" in sections:
        audit_upconv(nn, b, hl, key, dt, iters, rows)
    if "actq" in sections:
        audit_actq(nn, b, hl, key, dt, iters, rows)


def audit_fused(nn, b, hl, key, dt, iters, rows):
    """Pallas fused GN+SiLU+conv3x3 vs the plain XLA chain (see
    ops/fused_conv.py — measured slower as of 2026-08; kept re-measurable)."""
    from pfd_tpu.ops import fused_conv as fc

    for side, ch in [(hl, 320), (hl // 2, 640), (hl // 4, 1280)]:
        x = jax.random.normal(key, (b, side, side, ch), dt)
        norm_p = {"scale": jnp.ones((ch,), dt), "bias": jnp.zeros((ch,), dt)}
        conv_p = {"kernel": jax.random.normal(key, (3, 3, ch, ch), dt) * 0.02,
                  "bias": jnp.zeros((ch,), dt)}
        f = 2 * b * side * side * 9 * ch * ch

        def plain(x):
            y = nn.silu(nn.group_norm(x, norm_p, eps=1e-5))
            return nn.conv2d(y, conv_p, padding=1) + x

        def fused(x):
            return fc.gn_silu_conv3x3(x, norm_p, conv_p, residual=x)

        name = f"{side}x{side}x{ch}"
        rows.append(report_row(f"gnsiluconv_plain_{name}",
                               timeit(plain, x, iters), f))
        rows.append(report_row(f"gnsiluconv_fused_{name}",
                               timeit(fused, x, iters), f))


def audit_unet(config, registry, BF16, flash, n, b, hl, size, key, dt,
               iters, rows):
    # ---- the full UNet forward (one denoise step's diffuser work) ----------
    cfg = config.model_cfg("pfd_seecoder")
    model = registry.get(cfg["type"])(**cfg["args"], policy=BF16)
    params = model.init(key)
    ctx = jax.random.normal(key, (b, 148, 768), dt)
    t = jnp.full((b,), 500, jnp.int32)
    x0 = jax.random.normal(key, (b, hl, hl, 4), dt)

    def make_fwd(attn):
        # params flow in as a traced ARGUMENT (closure-captured GB-scale
        # constants kill the remote compiler — see timeit docstring)
        return lambda p, x: model.apply_model(
            p, {"type": "image", "x": x}, t, {"type": "image", "c": ctx},
            self_attn_fn=attn)

    # eps has x's shape/dtype, so the forward chains through the slope timer
    iters_unet = max(iters // 4, 3)
    sec_full = timeit(make_fwd(flash), x0, iters_unet, params=params)
    rows.append(report_row(f"unet_fwd_b{b}_flash", sec_full))
    sec_xla_attn = timeit(make_fwd(None), x0, iters_unet, params=params)
    rows.append(report_row(f"unet_fwd_b{b}_xla_attn", sec_xla_attn))
    # attention core stubbed out (projections/FF stay): isolates sdpa cost
    sec_noattn = timeit(make_fwd(lambda q, k, v: v), x0, iters_unet,
                        params=params)
    rows.append(report_row(f"unet_fwd_b{b}_selfattn_stubbed", sec_noattn))

    # int8 serving mode (ops/quant.py): conv int8, everything else identical
    from pfd_tpu.ops import quant

    qparams = dict(params)
    qparams["diffuser"] = quant.quantize_params(params["diffuser"])
    sec_int8 = timeit(make_fwd(flash), x0, iters_unet, params=qparams)
    rows.append(report_row(f"unet_fwd_b{b}_flash_int8", sec_int8))

    # ---- once-per-image stages ----------------------------------------------
    img = jax.random.normal(key, (1, size, size, 3), dt)
    sec = timeit_dispatch(lambda p, i: model.ctx_encode(p, i, "image"),
                          params, img)
    rows.append(report_row("seecoder_encode_b1", sec))

    z = jax.random.normal(key, (n, hl, hl, 4), jnp.float32)
    sec = timeit_dispatch(lambda p, z: model.vae_decode(p, z, "image"),
                          params, z)
    rows.append(report_row(f"vae_decode_b{n}", sec))

    total_step = sec_full
    print(json.dumps({
        "summary": {
            "unet_fwd_ms": round(sec_full * 1e3, 2),
            "ddim50_unet_only_s_per_batch": round(50 * total_step, 2),
            "implied_img_per_s": round(n / (50 * total_step), 3),
        }
    }), flush=True)


def audit_vae(config, registry, BF16, n, size, key, rows):
    """Per-stage attribution of the production VAE decoder (AUDIT_SECTIONS=
    vae): where the decode time (round-2: 171 ms/b8 at 36% MFU) actually
    goes. Stages mirror autokl.AutoencoderKL.decoder_apply — the mid stack
    (conv_in + ResNet/attn/ResNet at latent res, 512 ch), each upsampling
    level, and the norm+SiLU+conv tail at full res."""
    from pfd_tpu.models import autokl as ak
    from pfd_tpu.ops import nn
    from pfd_tpu.ops import quant

    vcfg = config.model_cfg("pfd_seecoder")["args"]["vae_cfg_list"][0][1]
    vcfg["args"].setdefault("lossconfig", None)
    vae = registry.get(vcfg["type"])(**vcfg["args"], policy=BF16)
    params = vae.init(key)
    hl = size // 8
    z = jax.random.normal(key, (n, hl, hl, 4), jnp.float32)

    sec = timeit_dispatch(lambda p, zz: vae.decode(p, zz), params, z)
    rows.append(report_row(f"vae_decode_b{n}_bf16", sec))
    qparams = quant.quantize_params(params)
    sec = timeit_dispatch(lambda p, zz: vae.decode(p, zz), qparams, z)
    rows.append(report_row(f"vae_decode_b{n}_int8", sec))

    pol = vae.policy
    nlev = len(vae.ch_mult)

    def capture(ps, zz):
        """Replay decoder_apply, returning each stage's input activation."""
        p = ps["decoder"]
        zz = nn.conv2d(pol.cast(zz), ps["post_quant_conv"], padding=0)
        caps = {"mid": zz}
        h = nn.conv2d(zz, p["conv_in"], padding=1)
        h = ak._resnet_block(p["mid"]["block_1"], h, pol)
        h = ak._attn_block(p["mid"]["attn_1"], h, pol)
        h = ak._resnet_block(p["mid"]["block_2"], h, pol)
        for i in reversed(range(nlev)):
            caps[f"up{i}"] = h
            level = p["up"][str(i)]
            for j in range(vae.num_res_blocks + 1):
                h = ak._resnet_block(level["block"][str(j)], h, pol)
                if "attn" in level:
                    h = ak._attn_block(level["attn"][str(j)], h, pol)
            if "upsample" in level:
                h = ak._upsample(level["upsample"], h)
        caps["tail"] = h
        return caps

    caps = jax.jit(capture)(params, z)

    def mid_fn(ps, x):
        p = ps["decoder"]
        h = nn.conv2d(x, p["conv_in"], padding=1)
        h = ak._resnet_block(p["mid"]["block_1"], h, pol)
        h = ak._attn_block(p["mid"]["attn_1"], h, pol)
        return ak._resnet_block(p["mid"]["block_2"], h, pol)

    sec = timeit_dispatch(mid_fn, params, caps["mid"])
    rows.append(report_row(f"vae_dec_mid_b{n}", sec))

    def attn_fn(ps, x):
        return ak._attn_block(ps["decoder"]["mid"]["attn_1"], x, pol)

    h0 = jax.jit(lambda ps, x: ak._resnet_block(
        ps["decoder"]["mid"]["block_1"],
        nn.conv2d(x, ps["decoder"]["conv_in"], padding=1), pol))(
            params, caps["mid"])
    sec = timeit_dispatch(attn_fn, params, h0)
    rows.append(report_row(f"vae_dec_mid_attn_b{n}", sec))

    for i in reversed(range(nlev)):
        def level_fn(ps, x, i=i):
            level = ps["decoder"]["up"][str(i)]
            h = x
            for j in range(vae.num_res_blocks + 1):
                h = ak._resnet_block(level["block"][str(j)], h, pol)
                if "attn" in level:
                    h = ak._attn_block(level["attn"][str(j)], h, pol)
            if "upsample" in level:
                h = ak._upsample(level["upsample"], h)
            return h

        x = caps[f"up{i}"]
        sec = timeit_dispatch(level_fn, params, x)
        rows.append(report_row(
            f"vae_dec_up{i}_b{n}_{x.shape[1]}px{x.shape[3]}ch", sec))

    def tail_fn(ps, x):
        p = ps["decoder"]
        h = nn.group_norm(x, p["norm_out"], eps=ak._EPS,
                          norm_dtype=pol.norm_dtype)
        return nn.conv2d(nn.silu(h), p["conv_out"], padding=1)

    sec = timeit_dispatch(tail_fn, params, caps["tail"])
    rows.append(report_row(f"vae_dec_tail_b{n}", sec))


def audit_upconv(nn, b, hl, key, dt, iters, rows):
    """Fused phase-decomposed upsample-conv (ops/nn.upsample_conv2d) vs the
    naive nearest_upsample_2x + 3x3 conv, bf16 and int8, at the UNet
    Upsample shapes (pre-upsample side/ch at this latent size) and the VAE
    decoder level shapes. AUDIT_SECTIONS=upconv."""
    from pfd_tpu.ops import quant as _q

    # NOTE: upsampling convs are not shape-preserving, so the chained
    # slope `timeit` cannot be used (the chain would double the spatial
    # size every call) — each row is fetch-forced individually.
    for side, ch in [(hl // 2, 640), (hl // 4, 1280), (hl // 8, 1280),
                     (hl, 512), (hl * 2, 512), (hl * 4, 256)]:
        x = jax.random.normal(key, (b, side, side, ch), dt)
        k3 = jax.random.normal(key, (3, 3, ch, ch), dt) * 0.02
        p = {"kernel": k3, "bias": jnp.zeros((ch,), dt)}
        f_naive = 2 * b * (2 * side) ** 2 * 9 * ch * ch
        sec = timeit_dispatch(
            lambda p, x: nn.conv2d(nn.nearest_upsample_2x(x), p, padding=1),
            p, x, iters=iters)
        rows.append(report_row(f"upconv_naive_{side}x{side}x{ch}", sec,
                               f_naive))
        sec = timeit_dispatch(lambda p, x: nn.upsample_conv2d(x, p),
                              p, x, iters=iters)
        rows.append(report_row(f"upconv_fused_{side}x{side}x{ch}", sec,
                               f_naive))
        q8, s8 = _q.quantize_weight(k3)
        pq = {"kernel_q": q8, "kernel_scale": s8, "bias": p["bias"]}
        sec = timeit_dispatch(
            lambda p, x: nn.conv2d(nn.nearest_upsample_2x(x), p, padding=1),
            pq, x, iters=iters)
        rows.append(report_row(f"upconv_naive_int8_{side}x{side}x{ch}", sec,
                               f_naive))
        sec = timeit_dispatch(lambda p, x: nn.upsample_conv2d(x, p),
                              pq, x, iters=iters)
        rows.append(report_row(f"upconv_fused_int8_{side}x{side}x{ch}", sec,
                               f_naive))


def audit_actq(nn, b, hl, key, dt, iters, rows):
    """Dynamic activation-quant overhead (AUDIT_SECTIONS=actq): int8 conv
    cost at the level shapes under the exact abs-max reduce vs the strided
    subsample estimate (ops/quant.PFD_ACT_AMAX_STRIDE), vs the bf16 conv."""
    from pfd_tpu.ops import quant as _q

    for side, ch in [(hl, 320), (hl // 2, 640), (hl // 4, 1280)]:
        x = jax.random.normal(key, (b, side, side, ch), dt)
        k3 = jax.random.normal(key, (3, 3, ch, ch), dt) * 0.02
        f = 2 * b * side * side * 9 * ch * ch
        p = {"kernel": k3, "bias": jnp.zeros((ch,), dt)}
        sec = timeit(lambda x: nn.conv2d(x, p, padding=1), x, iters)
        rows.append(report_row(f"actq_conv_bf16_{side}x{side}x{ch}", sec, f))
        q8, s8 = _q.quantize_weight(k3)
        pq = {"kernel_q": q8, "kernel_scale": s8, "bias": p["bias"]}
        old = _q._AMAX_STRIDE
        try:
            for stride in (1, 4):
                _q._AMAX_STRIDE = stride
                sec = timeit(lambda x: nn.conv2d(x, pq, padding=1), x, iters)
                rows.append(report_row(
                    f"actq_conv_int8_s{stride}_{side}x{side}x{ch}", sec, f))
        finally:
            _q._AMAX_STRIDE = old


def audit_ops(nn, flash, b, hl, key, dt, iters, rows):
    # ---- convs at the level shapes (SD-1.5 plan at this latent size) -------
    # (side, channels, 3x3 cin==cout conv): ds1/ds2/ds4/ds8 levels
    for side, ch in [(hl, 320), (hl // 2, 640), (hl // 4, 1280), (hl // 8, 1280)]:
        x = jax.random.normal(key, (b, side, side, ch), dt)
        k3 = jax.random.normal(key, (3, 3, ch, ch), dt) * 0.02
        p = {"kernel": k3, "bias": jnp.zeros((ch,), dt)}
        f = 2 * b * side * side * 9 * ch * ch
        by = (2 * b * side * side * ch + 9 * ch * ch) * 2
        sec = timeit(lambda x: nn.conv2d(x, p, padding=1), x, iters)
        rows.append(report_row(f"conv3x3_{side}x{side}x{ch}", sec, f, by))

    # ---- GroupNorm+SiLU at the same shapes ---------------------------------
    for side, ch in [(hl, 320), (hl // 2, 640), (hl // 4, 1280), (hl // 8, 1280)]:
        x = jax.random.normal(key, (b, side, side, ch), dt)
        p = {"scale": jnp.ones((ch,), dt), "bias": jnp.zeros((ch,), dt)}
        by = 2 * b * side * side * ch * 2   # read + write bf16
        sec = timeit(lambda x: nn.silu(nn.group_norm(x, p, eps=1e-5)), x, iters)
        rows.append(report_row(f"gn_silu_{side}x{side}x{ch}", sec, None, by))

    # ---- whole ResBlock (GN+SiLU+conv x2 + emb add + skip) -------------------
    from pfd_tpu.models import blocks
    from pfd_tpu.policy import BF16 as _pol

    for side, ch in [(hl, 320), (hl // 2, 640), (hl // 4, 1280)]:
        p = blocks.init_res_block(jax.random.PRNGKey(1), ch, ch, 1280, dt)
        emb = jax.random.normal(key, (b, 1280), dt)
        x = jax.random.normal(key, (b, side, side, ch), dt)
        f = 2 * 2 * b * side * side * 9 * ch * ch
        sec = timeit(lambda x: blocks.res_block(p, x, emb, _pol), x, iters)
        rows.append(report_row(f"res_block_{side}x{side}x{ch}", sec, f))

    # ---- whole SpatialTransformer context block ------------------------------
    for side, ch, nh in [(hl, 320, 8), (hl // 2, 640, 8)]:
        p = blocks.init_spatial_transformer(jax.random.PRNGKey(2), ch, nh,
                                            ch // nh, 768, dt)
        ctxv = jax.random.normal(key, (b, 148, 768), dt)
        x = jax.random.normal(key, (b, side, side, ch), dt)
        sec = timeit(lambda x: blocks.spatial_transformer(
            p, x, ctxv, nh, _pol, self_attn_fn=flash), x, iters)
        rows.append(report_row(f"context_block_{side}x{side}x{ch}", sec))

    # ---- attention cores at level sequence lengths --------------------------
    for s, ch, nh in [(hl * hl, 320, 8), (hl * hl // 4, 640, 8),
                      (hl * hl // 16, 1280, 8)]:
        d = ch // nh
        q = jax.random.normal(key, (b, nh, s, d), dt)
        f = 4 * b * nh * s * s * d
        sec = timeit(lambda q: flash(q, q, q), q, iters)
        rows.append(report_row(f"self_attn_flash_s{s}_d{d}", sec, f))
        sec = timeit(lambda q: nn.dot_product_attention(q, q, q), q, iters)
        rows.append(report_row(f"self_attn_xla_s{s}_d{d}", sec, f))

    # cross-attention (KV = 148 tokens)
    s, ch, nh = hl * hl, 320, 8
    d = ch // nh
    q = jax.random.normal(key, (b, nh, s, d), dt)
    kv = jax.random.normal(key, (b, nh, 148, d), dt)
    f = 4 * b * nh * s * 148 * d
    sec = timeit(lambda q: nn.dot_product_attention(q, kv, kv), q, iters)
    rows.append(report_row(f"cross_attn_s{s}_kv148", sec, f))

    # ---- GEGLU FF at ds1 -----------------------------------------------------
    s, ch = hl * hl, 320
    x = jax.random.normal(key, (b, s, ch), dt)
    pp = {"proj": {"kernel": jax.random.normal(key, (ch, ch * 8), dt) * 0.02,
                   "bias": jnp.zeros((ch * 8,), dt)}}
    p2 = {"kernel": jax.random.normal(key, (ch * 4, ch), dt) * 0.02,
          "bias": jnp.zeros((ch,), dt)}
    f = 2 * b * s * ch * ch * 8 + 2 * b * s * ch * 4 * ch
    sec = timeit(lambda x: nn.linear(nn.geglu(x, pp["proj"]), p2), x, iters)
    rows.append(report_row(f"geglu_ff_s{s}_c{ch}", sec, f))


if __name__ == "__main__":
    main()
