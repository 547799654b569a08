"""VAE decoder stage lab (TPU): decode-only timing A/B for the candidate
levers (VERDICT r4 weak #7: decode = 171 ms/batch-8 at 36% MFU and growing
as DeepCache shrinks the UNet share).

Times ONE jitted vae_decode per variant with the value-fetch barrier
(decode is ~100+ ms — far above the dispatch-measurement floor that makes
per-op audits untrustworthy on this backend). Variants:

  int8        — the serving default (ops/quant.py spatial convs)
  bf16        — unquantized decoder (is int8 even winning here?)

The strided act-quant variant (the dynamic per-conv amax reduce reads the
FULL activation — 268 MB at 512^2x128 b8, a far bigger share than at UNet
shapes where the A/B was inconclusive) is a PROCESS-level knob
(PFD_ACT_AMAX_STRIDE is read at trace time): run this lab again with
PFD_ACT_AMAX_STRIDE=4 and compare the int8 rows across the two runs.
Output-changing — needs gating if promoted.

Usage: python -m pfd_tpu.tools.vae_lab   (env: VLAB_BATCH/SIZE/ITERS)
Reference decoder: autokl_modules.py:462-568.
"""

from __future__ import annotations

import json
import os

from pfd_tpu.utils.compile_cache import enable_compile_cache
import time

import numpy as np


def main():
    batch = int(os.environ.get("VLAB_BATCH", "8"))
    size = int(os.environ.get("VLAB_SIZE", "512"))
    iters = int(os.environ.get("VLAB_ITERS", "10"))

    import jax

    enable_compile_cache()
    import jax.numpy as jnp

    from pfd_tpu import config, registry
    from pfd_tpu.ops import quant
    from pfd_tpu.policy import BF16

    cfg = config.model_cfg("autokl_v2")
    cfg["args"].setdefault("lossconfig", None)
    vae = registry.get(cfg["type"])(**cfg["args"], policy=BF16)
    params = vae.init(jax.random.PRNGKey(0))
    qparams = quant.quantize_params(params)

    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, size // 8, size // 8, 4)).astype(np.float32))

    def timeit(fn, p):
        out = fn(p, z)
        float(jnp.sum(out.astype(jnp.float32)))  # compile + execute barrier
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(p, z)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1e3

    decode = jax.jit(lambda p, z: vae.decode(p, z))
    rows = {}
    rows["int8"] = timeit(decode, qparams)
    rows["bf16"] = timeit(decode, params)
    emit = dict(rows)
    # nominal decoder FLOPs for MFU context (~1.48 TF/img at 512^2)
    emit["batch"] = batch
    emit["size"] = size
    print(json.dumps({f"vae_decode_ms_{k}": round(v, 2)
                      if isinstance(v, float) else v
                      for k, v in emit.items()}), flush=True)


if __name__ == "__main__":
    main()
