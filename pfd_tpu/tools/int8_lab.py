"""int8 MXU probe — is an int8 serving path worth building on the v5e?

The v5e MXU does 394 TOPS int8 vs 197 TFLOPS bf16. Convs dominate the DDIM
step at 65-78%% bf16 MFU (docs/PARITY.md), so an int8 conv path could take
the conv budget nearly in half IF the toolchain actually emits int8 MXU ops.
This probe measures, at the ds1/ds4 UNet shapes:

  - XLA `lax.dot_general` int8xint8->int32 vs the bf16 equivalent
  - XLA `lax.conv_general_dilated` int8 (may be unsupported -> reported)
  - a Pallas nine-shifted-dot conv3x3 in int8 vs bf16 (the fused_conv
    slab/halo structure, stripped to the conv core)
  - a Pallas blocked int8 matmul (LAB_SECTIONS=pallas_mm) — measured a
    WASH vs XLA bf16 at the UNet FF shapes (0.305 ms at 8192x320x2560 vs
    bf16's 0.278-0.386): K=320 is too skinny for the int8 rate to show, so
    the serving path keeps linears bf16 (see ops/quant._should_quantize)

Usage: python -m pfd_tpu.tools.int8_lab   (TPU)
"""

from __future__ import annotations

import functools
import json
import os


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from pfd_tpu.tools.perf_audit import timeit  # dispatch timing, overhead-corrected


def row(name, sec, flops, peak_t):
    print(json.dumps({"case": name, "ms": round(sec * 1e3, 3),
                      "eff_pct": round(100 * flops / sec / 1e12 / peak_t, 1)}),
          flush=True)


def _matmuls(key, b_rows, k, n, iters):
    f = 2 * b_rows * k * n
    x8 = jax.random.randint(key, (b_rows, k), -127, 127, jnp.int8)
    w8 = jax.random.randint(key, (k, n), -127, 127, jnp.int8)

    def dot8(x):
        y = jax.lax.dot_general(x, w8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # fold back to the input shape so the timing chain can feed it back:
        # sign-flip rows by the parity of the row sum — depends on every
        # output column, cannot constant-fold or saturate
        s = jnp.sum(y, axis=1, keepdims=True)
        return jnp.where((s & 1) == 0, x, -x)

    try:
        sec = timeit(dot8, x8, iters)
        row(f"xla_dot_int8_{b_rows}x{k}x{n}", sec, f, 394.0)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": f"xla_dot_int8_{b_rows}x{k}x{n}",
                          "error": str(e)[:200]}), flush=True)

    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)

    def dotb(x):
        y = jax.lax.dot_general(x, wb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.sum(y, axis=1, keepdims=True)
        return jnp.where(s >= 0, x, -x)

    sec = timeit(dotb, xb, iters)
    row(f"xla_dot_bf16_{b_rows}x{k}x{n}", sec, f, 197.0)


def _xla_conv(key, b, side, cin, cout, iters):
    f = 2 * b * side * side * 9 * cin * cout
    x8 = jax.random.randint(key, (b, side, side, cin), -127, 127, jnp.int8)
    k8 = jax.random.randint(key, (3, 3, cin, cout), -127, 127, jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x8.shape, k8.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def conv8(x):
        y = jax.lax.conv_general_dilated(
            x, k8, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (y >> 8).astype(jnp.int8)

    try:
        sec = timeit(conv8, x8, iters)
        row(f"xla_conv_int8_{side}x{side}_{cin}to{cout}", sec, f, 394.0)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": f"xla_conv_int8_{side}x{side}",
                          "error": str(e)[:200]}), flush=True)

    xb = x8.astype(jnp.bfloat16)
    kb = k8.astype(jnp.bfloat16)

    def convb(x):
        y = jax.lax.conv_general_dilated(
            x, kb, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    sec = timeit(convb, xb, iters)
    row(f"xla_conv_bf16_{side}x{side}_{cin}to{cout}", sec, f, 197.0)


# --- Pallas conv3x3 core (nine shifted dots), int8 vs bf16 ------------------

def _conv_kernel(xp_hbm, w_ref, o_ref, slab, sem, *, ht, width, acc_t, out_t):
    bb = pl.program_id(0)
    h0 = pl.program_id(1) * ht
    cp = pltpu.make_async_copy(xp_hbm.at[bb, pl.ds(h0, ht + 2), :, :],
                               slab, sem.at[0])
    cp.start()
    cp.wait()
    acc = None
    for dy in range(3):
        for dx in range(3):
            lhs = slab[dy:dy + ht, dx:dx + width, :]
            d = jax.lax.dot_general(lhs, w_ref[dy, dx],
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=acc_t)
            acc = d if acc is None else acc + d
    o_ref[0] = acc.astype(out_t)


def _pallas_conv(x, kern, acc_t, out_t, ht):
    b, h, w, cin = x.shape
    cout = kern.shape[-1]
    w2 = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w2 - w - 1), (0, 0)))
    kfn = functools.partial(_conv_kernel, ht=ht, width=w, acc_t=acc_t,
                            out_t=out_t)
    return pl.pallas_call(
        kfn,
        grid=(b, h // ht),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((3, 3, cin, cout), lambda bb, hh: (0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, ht, w, cout), lambda bb, hh: (bb, hh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), out_t),
        scratch_shapes=[pltpu.VMEM((ht + 2, w2, cin), x.dtype),
                        pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=2 * b * h * w * cin * x.dtype.itemsize,
            transcendentals=0),
    )(xp, kern)


def _pallas_convs(key, b, side, cin, cout, iters, ht):
    f = 2 * b * side * side * 9 * cin * cout
    x8 = jax.random.randint(key, (b, side, side, cin), -127, 127, jnp.int8)
    k8 = jax.random.randint(key, (3, 3, cin, cout), -127, 127, jnp.int8)

    def conv8(x):
        y = _pallas_conv(x, k8, jnp.int32, jnp.int32, ht)
        return (y >> 8).astype(jnp.int8)

    try:
        sec = timeit(conv8, x8, iters)
        row(f"pallas_conv_int8_{side}x{side}_{cin}to{cout}", sec, f, 394.0)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": f"pallas_conv_int8_{side}x{side}",
                          "error": str(e)[:300]}), flush=True)

    xb = x8.astype(jnp.bfloat16)
    kb = k8.astype(jnp.bfloat16)

    def convb(x):
        return _pallas_conv(x, kb, jnp.float32, jnp.bfloat16, ht)

    try:
        sec = timeit(convb, xb, iters)
        row(f"pallas_conv_bf16_{side}x{side}_{cin}to{cout}", sec, f, 197.0)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": f"pallas_conv_bf16_{side}x{side}",
                          "error": str(e)[:300]}), flush=True)


# --- Pallas int8 blocked matmul (K fully resident per block pair) ----------

def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[0] = jax.lax.dot_general(
        x_ref[0], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def pallas_matmul_int8(x8, w8, *, bm=512, bn=512):
    m, k = x8.shape
    n = w8.shape[1]
    mp, np_ = -(-m // bm) * bm, -(-n // bn) * bn
    xp = jnp.pad(x8, ((0, mp - m), (0, 0)))
    wp = jnp.pad(w8, ((0, 0), (0, np_ - n)))
    out = pl.pallas_call(
        _mm_kernel,
        grid=(mp // bm, np_ // bn),
        in_specs=[pl.BlockSpec((1, bm, k), lambda i, j: (0, i, 0)),
                  pl.BlockSpec((1, k, bn), lambda i, j: (0, 0, j))],
        out_specs=pl.BlockSpec((1, bm, bn), lambda i, j: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((1, mp, np_), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k + k * np_ + mp * np_ * 4,
            transcendentals=0),
    )(xp[None], wp[None])
    return out[0, :m, :n]


def _pallas_matmuls(key, m, k, n, iters):
    f = 2 * m * k * n
    x8 = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
    w8 = jax.random.randint(key, (k, n), -127, 127, jnp.int8)

    def run(x):
        y = pallas_matmul_int8(x, w8)
        s = jnp.sum(y, axis=1, keepdims=True)
        return jnp.where((s & 1) == 0, x, -x)

    try:
        sec = timeit(run, x8, iters)
        row(f"pallas_mm_int8_{m}x{k}x{n}", sec, f, 394.0)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": f"pallas_mm_int8_{m}x{k}x{n}",
                          "error": str(e)[:300]}), flush=True)


def main():
    iters = int(os.environ.get("LAB_ITERS", "20"))
    b = int(os.environ.get("LAB_BATCH", "16"))
    key = jax.random.PRNGKey(0)
    sections = os.environ.get("LAB_SECTIONS", "dots,convs").split(",")
    if "dots" in sections:
        # GEGLU FF shape at ds1 and a big square matmul
        _matmuls(key, 4096 * b // 8, 320, 2560, iters)
        _matmuls(key, 4096, 1280, 1280, iters)
    if "pallas_mm" in sections:
        _pallas_matmuls(key, 4096 * b // 8, 320, 2560, iters)
        _pallas_matmuls(key, 4096 * b // 8, 1280, 320, iters)
        _pallas_matmuls(key, 4096, 1280, 1280, iters)
    if "convs" in sections:
        # conv at ds1 and ds4 level shapes
        _xla_conv(key, b, 64, 320, 320, iters)
        _xla_conv(key, b, 16, 1280, 1280, iters)
        _pallas_convs(key, b, 64, 320, 320, iters, ht=8)
        _pallas_convs(key, b, 16, 1280, 1280, iters, ht=8)


if __name__ == "__main__":
    main()
