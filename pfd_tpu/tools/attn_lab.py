"""Flash-attention kernel lab — block-size / variant sweep on the TPU.

The ds1 self-attention (s=4096, d_head=40, CFG batch 16 -> b*h=128) is the
single largest line in the DDIM step budget (see docs/PARITY.md round-2
attribution): d=40 pads to the 128 MXU lanes, giving a padded-matmul floor
of ~5.6 ms per context block, with fp32 online-softmax VPU passes on top.
This lab times `ops.flash_attention` variants at the real UNet shapes so
kernel changes are judged on measured ms, not vibes.

Usage: python -m pfd_tpu.tools.attn_lab   (TPU, ~2 min)
Env:   LAB_BATCH (default 16 = CFG-doubled bench batch 8), LAB_ITERS (50)
"""

from __future__ import annotations

import json
import os

from pfd_tpu.utils.compile_cache import enable_compile_cache


import jax

enable_compile_cache()
import jax.numpy as jnp

from pfd_tpu.ops import flash_attention as fa

V5E_PEAK_TFLOPS = 197.0


from pfd_tpu.tools.perf_audit import timeit  # dispatch timing, overhead-corrected


def main():
    b = int(os.environ.get("LAB_BATCH", "16"))
    iters = int(os.environ.get("LAB_ITERS", "20"))
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    # (s, d, heads): ds1 and ds2 UNet levels @512^2
    for s, d, nh in [(4096, 40, 8), (1024, 80, 8)]:
        q = jax.random.normal(key, (b, nh, s, d), dt)
        f = 4 * b * nh * s * s * d
        f_pad = 4 * b * nh * s * s * 128
        for bq, bk in [(1024, 1024), (512, 512), (1024, 512), (512, 1024),
                       (2048, 512), (1024, 256), (2048, 1024)]:
            if bq > s or bk > s:
                continue
            for pipe in (False, True):
                try:
                    sec = timeit(lambda x: fa.flash_attention(
                        x, x, x, block_q=bq, block_k=bk, pipelined=pipe),
                        q, iters)
                    print(json.dumps({
                        "case": f"s{s}_d{d}_bq{bq}_bk{bk}"
                                + ("_pipe" if pipe else ""),
                        "ms": round(sec * 1e3, 3),
                        "mfu_pct": round(
                            100 * f / sec / 1e12 / V5E_PEAK_TFLOPS, 1),
                        "padded_mfu_pct": round(
                            100 * f_pad / sec / 1e12 / V5E_PEAK_TFLOPS, 1),
                    }), flush=True)
                except Exception as e:  # noqa: BLE001 - report and go on
                    print(json.dumps({
                        "case": f"s{s}_d{d}_bq{bq}_bk{bk}"
                                + ("_pipe" if pipe else ""),
                        "error": str(e)[:200]}), flush=True)


def pad_sweep():
    """pad_d=True (HBM-materialized 128-lane padding + fused-l ones-column)
    vs pad_d=False (Mosaic internal tile padding, separate VPU row-sum for
    the denominator) at the serving shapes, over the competitive block
    configs. Decides the production default (VERDICT r2 weak #1b)."""
    iters = int(os.environ.get("LAB_ITERS", "20"))
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    for b in (8, 16):  # CFG-doubled serving batches 4 (default) and 8
        for s, d, nh in [(4096, 40, 8), (1024, 80, 8)]:
            q = jax.random.normal(key, (b, nh, s, d), dt)
            f = 4 * b * nh * s * s * d
            for bq, bk in [(2048, 2048), (2048, 1024), (1024, 2048),
                           (1024, 1024)]:
                if bq > s or bk > s:
                    continue
                for pad in (True, False):
                    try:
                        sec = timeit(lambda x: fa.flash_attention(
                            x, x, x, block_q=bq, block_k=bk, pad_d=pad),
                            q, iters)
                        print(json.dumps({
                            "case": f"b{b}_s{s}_d{d}_bq{bq}_bk{bk}"
                                    + ("_padd" if pad else "_nopad"),
                            "ms": round(sec * 1e3, 3),
                            "mfu_pct": round(
                                100 * f / sec / 1e12 / V5E_PEAK_TFLOPS, 1),
                        }), flush=True)
                    except Exception as e:  # noqa: BLE001
                        print(json.dumps({
                            "case": f"b{b}_s{s}_d{d}_bq{bq}_bk{bk}"
                                    + ("_padd" if pad else "_nopad"),
                            "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    if os.environ.get("LAB_PAD_SWEEP") == "1":
        pad_sweep()
    else:
        main()
