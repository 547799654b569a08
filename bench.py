"""Headline benchmark: 512x512 images/sec/chip at DDIM-50 (BASELINE.json).

Runs the full serving hot path on the attached TPU chip: SeeCoder encode ->
50-step CFG-doubled DDIM scan -> VAE decode, bf16, batch-B, jitted as one
program per stage. Prints ONE JSON line with images/sec/chip vs the 2.0
baseline target.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def build():
    from pfd_tpu import config, registry
    from pfd_tpu.diffusion.ddim import DDIMSampler
    from pfd_tpu.policy import BF16

    cfg = config.model_cfg("pfd_seecoder")  # BASELINE config #1: no controlnet
    model = registry.get(cfg["type"])(**cfg["args"], policy=BF16)
    params = model.init(jax.random.PRNGKey(0))
    sampler = DDIMSampler(model)
    return model, params, sampler


def main():
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    use_flash = os.environ.get("BENCH_FLASH", "1") == "1"
    # >1 enables encoder-propagation turbo (output-changing; opt-in)
    enc_interval = int(os.environ.get("BENCH_ENCODER_INTERVAL", "1"))
    model, params, sampler = build()
    tables = sampler.make_tables(steps, 0.0)

    attn = None
    if use_flash:
        from pfd_tpu.ops.flash_attention import self_attn_fn
        attn = self_attn_fn

    def e2e(params, rng, ref_image):
        c = model.ctx_encode(params, ref_image, "image")
        c = jnp.tile(c, (batch, 1, 1))
        u = jnp.zeros_like(c)
        rng, init_rng = jax.random.split(rng)
        x = jax.random.normal(init_rng, (batch, size // 8, size // 8, 4),
                              jnp.float32)
        c_info = {"conditioning": c, "unconditional_conditioning": u,
                  "unconditional_guidance_scale": 2.0}
        x, _ = sampler.sample_fn(params, rng, x, c_info, tables,
                                 self_attn_fn=attn,
                                 encoder_interval=enc_interval)
        return model.vae_decode(params, x, "image")

    fn = jax.jit(e2e)
    ref_image = jnp.zeros((1, size, size, 3), jnp.bfloat16)

    # warmup/compile
    out = fn(params, jax.random.PRNGKey(1), ref_image)
    jax.block_until_ready(out)

    n_iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = fn(params, jax.random.PRNGKey(2 + i), ref_image)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * n_iters / dt
    print(json.dumps({
        "metric": f"{size}x{size}_images_per_sec_per_chip_ddim{steps}",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 2.0, 4),
    }))


if __name__ == "__main__":
    main()
