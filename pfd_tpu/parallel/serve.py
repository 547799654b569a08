"""Data-parallel batched serving — BASELINE config #5: batch-N mixed
reference images, sharded over the 'data' axis of a v5e-8 mesh.

One jitted SPMD program per (h, w, batch, control?) bucket: SeeCoder encode,
the CFG-doubled DDIM scan and VAE decode all run batch-sharded; params are
replicated (they fit per-chip), so the only collectives are at the program
edges — pure DP, the BASELINE.json north-star layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pfd_tpu.diffusion.ddim import DDIMSampler
from pfd_tpu.parallel import mesh as mesh_lib


class DataParallelServer:
    """Batched mixed-reference serving over a mesh.

    Each request in the batch has its own reference image (its own SeeCoder
    tokens) and optionally its own control hint; checkpoints are shared.
    Per-request checkpoint mixing lives in
    :class:`pfd_tpu.parallel.zoo_serve.ZooServer` (stacked zoo pytrees —
    per-device weights under shard_map, or tag-grouped program reuse)."""

    def __init__(self, model, params, mesh=None, *, steps=50, eta=0.0,
                 self_attn_fn=None, encoder_interval=1, cfg_interval=1,
                 deep_interval=1, control_turbo=False,
                 cfg_extrapolate="const", phases=None):
        self.model = model
        self.mesh = mesh or mesh_lib.make_mesh()
        self.sampler = DDIMSampler(model)
        self.steps = steps
        self.eta = eta
        self.self_attn_fn = self_attn_fn
        self.encoder_interval = encoder_interval
        # CFG-delta reuse / DeepCache (diffusion/ddim.py sample_fn) —
        # output-changing turbos, SSIM-gated like encoder_interval
        self.cfg_interval = cfg_interval
        self.deep_interval = deep_interval
        # "linear": first-order delta extrapolation (ddim.py sample_fn)
        self.cfg_extrapolate = cfg_extrapolate
        # [(n, k), ...]: phased turbo schedule (ddim.py sample_fn phases
        # docstring); replaces the uniform interval knobs
        self.phases = phases
        # control requests sample exactly unless explicitly opted in
        # (GATE_SET=control SSIM rows, docs/PARITY.md) — same policy as
        # pipeline.py control_turbo
        self.control_turbo = control_turbo
        self._data = NamedSharding(self.mesh, P("data"))
        self._repl = NamedSharding(self.mesh, P())
        self.params = jax.device_put(params, self._repl)
        self._cache = {}

    def _fn(self, h, w, batch, has_control):
        key = (h, w, batch, has_control)
        if key not in self._cache:
            tables = self.sampler.make_tables(self.steps, self.eta)

            f = self.model.vae["image"].downsample_factor
            zc = self.model.vae["image"].embed_dim

            def fn(params, rng, refs, hints, scale):
                c = self.model.ctx_encode(params, refs, "image")
                u = jnp.zeros_like(c)
                rng, init_rng = jax.random.split(rng)
                x = jax.random.normal(init_rng, (batch, h // f, w // f, zc),
                                      jnp.float32)
                ci = {"conditioning": c, "unconditional_conditioning": u,
                      "unconditional_guidance_scale": scale}
                if has_control:
                    ci["control"] = hints
                # same guard as pipeline.py: control requests sample exactly
                # (cached encoder skips would hold stale control residuals)
                # unless control_turbo opts them into the gated intervals
                exact_ctl = has_control and not self.control_turbo
                interval = 1 if exact_ctl else self.encoder_interval
                cfg_iv = 1 if exact_ctl else self.cfg_interval
                deep_iv = 1 if exact_ctl else self.deep_interval
                ph = None if exact_ctl else self.phases
                x, _ = self.sampler.sample_fn(
                    params, rng, x, ci, tables,
                    self_attn_fn=self.self_attn_fn,
                    encoder_interval=interval, cfg_interval=cfg_iv,
                    deep_interval=deep_iv,
                    cfg_extrapolate=self.cfg_extrapolate, phases=ph)
                return self.model.vae_decode(params, x, "image")

            self._cache[key] = jax.jit(
                fn, in_shardings=(self._repl, self._repl, self._data,
                                  self._data if has_control else None, None),
                out_shardings=self._data)
        return self._cache[key]

    def generate(self, refs, hints=None, *, h=512, w=512, ugscale=2.0, seed=0):
        """refs: (B, H, W, 3) [0,1] reference images, B divisible by the data
        axis. hints: optional (B, h, w, 3) control hints."""
        b = refs.shape[0]
        dp = self.mesh.shape["data"]
        assert b % dp == 0, f"batch {b} must divide over data axis {dp}"
        refs = jax.device_put(jnp.asarray(refs, jnp.float32), self._data)
        if hints is not None:
            hints = jax.device_put(jnp.asarray(hints, jnp.float32), self._data)
        fn = self._fn(h, w, b, hints is not None)
        return fn(self.params, jax.random.PRNGKey(seed), refs, hints,
                  jnp.float32(ugscale))

    def warmup(self, buckets, batch, has_control=False):
        """AOT-compile a set of (h, w) buckets (the app's 64-multiple grid,
        app.py:197-207) so first requests don't pay compilation."""
        for h, w in buckets:
            self._fn(h, w, batch, has_control)
        return list(self._cache)
