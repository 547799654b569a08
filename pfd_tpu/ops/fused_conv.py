"""Fused GroupNorm+SiLU+conv3x3 Pallas kernel — the ResBlock hot path.

The reference ResBlock (openaimodel.py:162-274) is GN -> SiLU -> conv3x3
(+ emb add) -> GN -> SiLU -> conv3x3 (+ skip). XLA on TPU runs each stage as
its own HBM round trip and its conv emitter reaches ~65% MFU at the 320ch
level (measured, see docs/PARITY.md). This kernel folds the whole chain:

- GroupNorm reduces to a per-(batch, channel) affine ``x*a + c`` once its
  fp32 statistics are known; the stats are tiny XLA reductions
  (:func:`gn_affine`), and the time-embedding shift folds into the same
  affine algebraically (stats of ``h + e`` from per-channel sums of ``h``).
- The kernel computes ``conv3x3(silu(x*a + c)) [+ bias] [+ residual]`` in
  one HBM round trip: per (cout-tile, batch, h-tile) grid cell it DMAs a
  row slab with 1-row halos from HBM, applies the affine+SiLU on the slab
  in VMEM, and accumulates the 3x3 conv as nine shifted matmuls on the MXU
  in fp32.

Layout: NHWC, HWIO — channels on lanes, so the nine dots are standard
(rows, Cin) @ (Cin, Cout) matmuls with the contraction on the minor dim.
Stride-1, pad-1 convs only (ResBlock/out-layer shapes); resampling convs
stay on XLA.

Status: **correct but not wired into the UNet.** Measured on the v5e at the
ds1 ResBlock shape (b16, 64x64, 320->320, bf16): fused 1.221 ms (50.2% MFU)
vs the plain XLA GN->SiLU->conv->add chain at 1.046 ms (58.6% MFU) — XLA's
conv emitter + elementwise fusion already beats this kernel, because the
affine fold costs an extra fp32 stats pass over x and the nine shifted
matmuls lose the input-reuse tiling XLA's native conv lowering has. Kept
(with tests) as the measured negative result and as the slab/halo DMA
template; `python -m pfd_tpu.tools.perf_audit` (AUDIT_SECTIONS=fused)
re-measures it against the current compiler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from pfd_tpu.ops.nn import group_norm_affine as gn_affine  # shared with blocks


def _kernel(xp_hbm, w_ref, a_ref, c_ref, bias_ref, res_ref, o_ref,
            slab, sem, *, ht, height, width, has_res, out_dtype):
    bb = pl.program_id(1)
    h0 = pl.program_id(2) * ht

    # one aligned full-slab DMA from the zero-padded input: rows
    # [h0, h0+ht+2) of xp == image rows [h0-1, h0+ht+1) with zero borders
    cp = pltpu.make_async_copy(xp_hbm.at[bb, pl.ds(h0, ht + 2), :, :],
                               slab, sem.at[0])
    cp.start()
    cp.wait()

    # affine + SiLU in fp32 (matching ops.nn.group_norm -> silu; bf16
    # sigmoid also trips a Mosaic broadcast-verifier bug), then zero the
    # out-of-image borders: the raw pad is zero but silu(affine(0)) is not,
    # so validity comes from the global row/col index
    a = a_ref[0, 0].astype(jnp.float32)
    c = c_ref[0, 0].astype(jnp.float32)
    y = slab[:].astype(jnp.float32) * a + c
    y = y * jax.nn.sigmoid(y)
    shp = y.shape
    gr = h0 + jax.lax.broadcasted_iota(jnp.int32, shp, 0)
    gc = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
    valid = (gr >= 1) & (gr <= height) & (gc >= 1) & (gc <= width)
    slab[:] = jnp.where(valid, y, 0.0).astype(slab.dtype)

    # --- nine shifted matmuls, fp32 accumulation ---
    acc = None
    for dy in range(3):
        for dx in range(3):
            lhs = slab[dy:dy + ht, dx:dx + width, :]
            d = jax.lax.dot_general(
                lhs, w_ref[dy, dx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d

    acc = acc + bias_ref[0].astype(jnp.float32)
    if has_res:
        acc = acc + res_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(out_dtype)


def _pick_ht(h, w, cin, cout_t, itemsize=2, budget=6 * 1024 * 1024):
    """Largest power-of-two row tile whose slab+acc fit the VMEM budget."""
    ht = h
    while ht > 8:
        slab = (ht + 2) * (w + 2) * cin * itemsize
        acc = ht * w * cout_t * 4
        if slab + acc <= budget:
            break
        ht //= 2
    return ht


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_fused(x, kernel, a, c, bias, residual=None, *, interpret=False):
    """``conv3x3(silu(x*a + c), kernel) + bias [+ residual]`` — one kernel.

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Cout); a, c: (B, Cin) fp32 affine
    from :func:`gn_affine`; bias: (Cout,); residual: optional (B, H, W, Cout).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    # width padded to a multiple of 8 and channels to a multiple of 128 so
    # DMA slices stay tile-aligned; extra columns are garbage-masked in the
    # kernel (gc <= width), extra channels are exactly zero end-to-end
    # (affine 0*x+0 -> silu(0)=0, zero kernel rows contribute nothing)
    w2 = -(-(w + 2) // 8) * 8
    cin_p = -(-cin // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, w2 - w - 1), (0, cin_p - cin)))
    if cin_p != cin:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
        a = jnp.pad(a, ((0, 0), (0, cin_p - cin)))
        c = jnp.pad(c, ((0, 0), (0, cin_p - cin)))

    # cout tiling keeps the weight block under ~8MB; Mosaic requires the
    # tile to be the full cout or a multiple of 128
    budget = 8 * 1024 * 1024
    cout_t = cout
    if 9 * cin * cout * x.dtype.itemsize > budget:
        # candidate tiles: multiples of 128 that exactly divide cout,
        # largest fitting the budget first (a non-dividing tile would
        # silently truncate the grid to cout // cout_t tiles)
        divisors = [t for t in range(128, cout + 1, 128) if cout % t == 0]
        assert divisors, (
            f"cout={cout} has no 128-multiple divisor; pad cout before "
            "calling conv3x3_fused")
        cout_t = max(
            [t for t in divisors
             if 9 * cin * t * x.dtype.itemsize <= budget] or divisors[:1])
    assert cout % cout_t == 0, (cout, cout_t)
    ht = _pick_ht(h, w, cin, cout_t, x.dtype.itemsize)
    nh = h // ht
    ncout = cout // cout_t

    has_res = residual is not None
    kern = functools.partial(_kernel, ht=ht, height=h, width=w,
                             has_res=has_res, out_dtype=x.dtype)

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),                          # x (HBM)
        pl.BlockSpec((3, 3, cin_p, cout_t), lambda co, bb, hh: (0, 0, 0, co)),
        pl.BlockSpec((1, 1, cin_p), lambda co, bb, hh: (bb, 0, 0)),
        pl.BlockSpec((1, 1, cin_p), lambda co, bb, hh: (bb, 0, 0)),
        pl.BlockSpec((1, cout_t), lambda co, bb, hh: (0, co)),
    ]
    args = [xp, kernel.astype(x.dtype), a.reshape(b, 1, cin_p),
            c.reshape(b, 1, cin_p), bias.astype(jnp.float32).reshape(1, cout)]
    if has_res:
        in_specs.append(pl.BlockSpec((1, ht, w, cout_t),
                                     lambda co, bb, hh: (bb, hh, 0, co)))
        args.append(residual)
    else:
        # dummy ref so the kernel signature is stable
        in_specs.append(pl.BlockSpec((1, 1), lambda co, bb, hh: (0, 0)))
        args.append(jnp.zeros((1, 1), x.dtype))

    out = pl.pallas_call(
        kern,
        grid=(ncout, b, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ht, w, cout_t),
                               lambda co, bb, hh: (bb, hh, 0, co)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((ht + 2, w2, cin_p), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=b * h * w * (cin * ncout + cout) * x.dtype.itemsize
            + 9 * cin * cout * x.dtype.itemsize,
            transcendentals=b * h * w * cin,
        ),
        interpret=interpret,
    )(*args)
    return out


def fused_available(x):
    """The fused path wants TPU (interpret mode is for tests) and shapes the
    slab design can hold: stride-1 latents, H divisible into row tiles."""
    b, h, w, cin = x.shape
    return h >= 8 and w >= 8 and h % 8 == 0


def gn_silu_conv3x3(x, norm_p, conv_p, *, groups=32, eps=1e-5, shift=None,
                    residual=None, interpret=False):
    """GroupNorm(x + shift) -> SiLU -> conv3x3 (+residual), fused."""
    a, c = gn_affine(x, norm_p["scale"], norm_p["bias"], groups=groups,
                     eps=eps, shift=shift)
    return conv3x3_fused(x, conv_p["kernel"], a, c, conv_p["bias"],
                         residual=residual, interpret=interpret)
