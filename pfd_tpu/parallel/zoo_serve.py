"""Mixed-checkpoint batched serving — BASELINE config #5 as written:
batch-N requests that each name their own diffuser (and SeeCoder) checkpoint
and optionally carry a ControlNet hint, in ONE batched program.

Why this is possible: all 7 zoo diffusers share one pytree structure — the
hot-swap contract (reference app.py:137-162, the converted layout from
tools/model_conversion.py; `check_diffuser()` asserts it, pfd.py:297-304) —
so checkpoints stack on a leading "zoo" axis and per-request selection is an
index, not a module rebuild.

Two execution modes:

- **sharded** (batch == mesh 'data' size): per-request weights are
  host-gathered into a leading-axis stack sharded over 'data' — each device
  holds exactly ONE request and ITS checkpoint. The program runs under
  ``jax.shard_map`` with no cross-device collectives: pure DP with
  *per-device weights*, a layout plain SPMD weight replication cannot
  express (the reference routes this to separate server processes).
- **grouped** (anything else, incl. single-chip): requests are grouped by
  (diffuser, ctx) tag and each group runs the same jitted program with its
  group's params passed as arguments — swapping checkpoints between calls
  is free (the zoo_swap bench invariant: params are traced inputs, so no
  recompile).

Per-request control: a shared-structure hint batch (B, h, w, 3) plus a
(B,) 0/1 ``control_mask`` — mask 0 multiplies the 13 ControlNet residuals
to zero, reproducing the reference's no-hint semantics exactly (the dummy
ccs_zeros pops 0 into every merge site, pfd.py:475-478) while keeping one
program for mixed control/no-control batches.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pfd_tpu.diffusion.ddim import DDIMSampler
from pfd_tpu.parallel import mesh as mesh_lib


class ZooServer:
    """Batched serving with per-request checkpoint tags.

    base_params: full pytree for the composite model (vae/ctx/diffuser
    [+ctl]); the vae and ctl stay shared (the reference zoo shares them too,
    app.py:55-69 — one VAE, one ControlNet set per method).
    diffuser_zoo: {tag: params['diffuser']} — identical structures.
    ctx_zoo: optional {tag: params['ctx']} for per-request SeeCoder choice.
    """

    def __init__(self, model, base_params, diffuser_zoo, ctx_zoo=None,
                 mesh=None, *, steps=50, eta=0.0, self_attn_fn=None,
                 encoder_interval=1, cfg_interval=1, deep_interval=1,
                 control_turbo=False, cfg_extrapolate="const", phases=None):
        self.model = model
        self.mesh = mesh or mesh_lib.make_mesh()
        self.sampler = DDIMSampler(model)
        self.steps = steps
        self.eta = eta
        self.self_attn_fn = self_attn_fn
        self.encoder_interval = encoder_interval
        self.cfg_interval = cfg_interval
        self.deep_interval = deep_interval
        self.cfg_extrapolate = cfg_extrapolate
        self.phases = phases
        self.control_turbo = control_turbo
        self.diffuser_zoo = diffuser_zoo
        self.ctx_zoo = ctx_zoo or {}
        self.base_params = base_params
        self._repl = NamedSharding(self.mesh, P())
        self._data = NamedSharding(self.mesh, P("data"))
        self._cache = {}

    # ------------------------------------------------------------------
    def _intervals(self, batch_has_control):
        """Same guard as pipeline.py: control requests sample exactly unless
        control_turbo opts into the gated intervals. One SPMD program per
        batch => the guard applies batch-wide when any request has control."""
        exact = batch_has_control and not self.control_turbo
        if exact:
            return 1, 1, 1, None
        return (self.encoder_interval, self.cfg_interval, self.deep_interval,
                self.phases)

    def init_noise(self, rng, b, h, w):
        """Per-REQUEST init latents: request i draws from fold_in(rng, i),
        so the result is identical whichever execution mode (sharded /
        grouped / single-request) the batch takes — the basis of the
        mixed-vs-single equality test. (At eta=0, the serving default,
        this is the only RNG that reaches the output.)"""
        f = self.model.vae["image"].downsample_factor
        zc = self.model.vae["image"].embed_dim
        return jnp.stack([
            jax.random.normal(jax.random.fold_in(rng, i),
                              (h // f, w // f, zc), jnp.float32)
            for i in range(b)])

    def _sample_body(self, params, rng, x, refs, hints, mask, scale, *, h, w,
                     batch, has_control):
        """Shared e2e body: SeeCoder encode -> CFG DDIM scan -> VAE decode."""
        model = self.model
        c = model.ctx_encode(params, refs, "image")
        u = jnp.zeros_like(c)
        ci = {"conditioning": c, "unconditional_conditioning": u,
              "unconditional_guidance_scale": scale}
        if has_control:
            ci["control"] = hints
            if mask is not None:
                ci["control_mask"] = mask
        enc, cfg, deep, ph = self._intervals(has_control)
        tables = self.sampler.make_tables(self.steps, self.eta)
        x, _ = self.sampler.sample_fn(
            params, rng, x, ci, tables, self_attn_fn=self.self_attn_fn,
            encoder_interval=enc, cfg_interval=cfg, deep_interval=deep,
            cfg_extrapolate=self.cfg_extrapolate, phases=ph)
        return model.vae_decode(params, x, "image")

    # ------------------------------------------------------------------
    # sharded mode: one request + its checkpoint per device (shard_map)

    def _sharded_fn(self, h, w, batch, has_control, mixed_ctx):
        key = ("sharded", h, w, batch, has_control, mixed_ctx)
        if key not in self._cache:
            local_b = batch // self.mesh.shape["data"]

            def local(shared, stack_d, stack_c, rng, x, refs, hints, mask):
                # per-device checkpoint: the local shard of the zoo stack is
                # (local_b=1, ...); drop the leading axis to get this
                # device's weights
                p = dict(shared)
                p["diffuser"] = jax.tree.map(lambda a: a[0], stack_d)
                if mixed_ctx:
                    p["ctx"] = jax.tree.map(lambda a: a[0], stack_c)
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
                return self._sample_body(
                    p, rng, x, refs, hints, mask if has_control else None,
                    shared["_scale"], h=h, w=w,
                    batch=local_b, has_control=has_control)

            repl = P()
            data = P("data")
            fn = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(repl, data, data if mixed_ctx else repl, repl,
                          data, data, data if has_control else repl,
                          data if has_control else repl),
                out_specs=data,
                check_vma=False)
            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    # ------------------------------------------------------------------
    # grouped mode: one jitted program per (batch, has_control) bucket;
    # checkpoints are arguments, so per-group swap costs nothing

    def _group_fn(self, h, w, batch, has_control):
        key = ("group", h, w, batch, has_control)
        if key not in self._cache:
            def fn(params, rng, x, refs, hints, mask, scale):
                return self._sample_body(
                    params, rng, x, refs, hints,
                    mask if has_control else None,
                    scale, h=h, w=w, batch=batch, has_control=has_control)
            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    # ------------------------------------------------------------------
    def generate(self, refs, diffuser_tags, ctx_tags=None, hints=None,
                 control_on=None, *, h=512, w=512, ugscale=2.0, seed=0):
        """refs: (B, H, W, 3) reference images; diffuser_tags: length-B list
        of zoo tags; ctx_tags: optional length-B SeeCoder tags; hints:
        optional (B, h, w, 3) control hints; control_on: optional length-B
        bools (default: all-on when hints given). Returns (B, h, w, 3)."""
        refs = jnp.asarray(refs, jnp.float32)
        b = refs.shape[0]
        if len(diffuser_tags) != b:
            raise ValueError("one diffuser tag per request")
        ctx_tags = list(ctx_tags) if ctx_tags is not None else [None] * b
        has_control = hints is not None
        if control_on is None:
            control_on = [has_control] * b
        mask = np.asarray(control_on, np.float32)
        if has_control:
            hints = jnp.asarray(hints, jnp.float32)
        elif mask.any():
            raise ValueError("control_on set but no hints given")

        rng = jax.random.PRNGKey(seed)
        x_init = self.init_noise(rng, b, h, w)
        dp = self.mesh.shape["data"]
        if b == dp and self.mesh.devices.size == dp:
            return self._generate_sharded(refs, diffuser_tags, ctx_tags,
                                          hints, mask, has_control,
                                          h, w, ugscale, rng, x_init)
        return self._generate_grouped(refs, diffuser_tags, ctx_tags, hints,
                                      mask, has_control, h, w, ugscale, rng,
                                      x_init)

    def _generate_sharded(self, refs, diffuser_tags, ctx_tags, hints, mask,
                          has_control, h, w, ugscale, rng, x_init):
        mixed_ctx = any(t is not None for t in ctx_tags)
        stack_d = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[self.diffuser_zoo[t] for t in diffuser_tags])
        if mixed_ctx:
            stack_c = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[self.ctx_zoo[t] if t is not None else
                  self.base_params["ctx"] for t in ctx_tags])
        else:
            stack_c = jnp.zeros((refs.shape[0],), jnp.float32)  # placeholder
        shared = {k: v for k, v in self.base_params.items()
                  if k not in ("diffuser",)}
        if mixed_ctx:
            shared = {k: v for k, v in shared.items() if k != "ctx"}
        shared["_scale"] = jnp.float32(ugscale)
        b = refs.shape[0]
        fn = self._sharded_fn(h, w, b, has_control, mixed_ctx)
        stack_d = jax.device_put(stack_d, self._data)
        if mixed_ctx:
            stack_c = jax.device_put(stack_c, self._data)
        refs = jax.device_put(refs, self._data)
        hints_in = (jax.device_put(hints, self._data) if has_control
                    else jnp.zeros((), jnp.float32))
        mask_in = (jax.device_put(jnp.asarray(mask), self._data)
                   if has_control else jnp.zeros((), jnp.float32))
        shared = jax.device_put(shared, self._repl)
        x_init = jax.device_put(x_init, self._data)
        return fn(shared, stack_d, stack_c, rng, x_init, refs, hints_in,
                  mask_in)

    def _generate_grouped(self, refs, diffuser_tags, ctx_tags, hints, mask,
                          has_control, h, w, ugscale, rng, x_init):
        order = {}
        for i, (dt, ct) in enumerate(zip(diffuser_tags, ctx_tags)):
            order.setdefault((dt, ct), []).append(i)
        out = [None] * refs.shape[0]
        for gi, ((dt, ct), idx) in enumerate(sorted(order.items(),
                                                    key=lambda kv: str(kv[0]))):
            p = dict(self.base_params)
            p["diffuser"] = self.diffuser_zoo[dt]
            if ct is not None:
                p["ctx"] = self.ctx_zoo[ct]
            gidx = np.asarray(idx)
            g_has_ctl = bool(has_control and mask[gidx].any())
            fn = self._group_fn(h, w, len(idx), g_has_ctl)
            g_hints = (jnp.asarray(np.asarray(hints)[gidx]) if g_has_ctl
                       else None)
            g_mask = jnp.asarray(mask[gidx]) if g_has_ctl else None
            g_out = fn(p, jax.random.fold_in(rng, gi), x_init[gidx],
                       refs[gidx], g_hints, g_mask, jnp.float32(ugscale))
            for j, i in enumerate(idx):
                out[i] = g_out[j]
        return jnp.stack(out)
