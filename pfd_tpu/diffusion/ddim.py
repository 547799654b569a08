"""DDIM sampler — the whole denoise loop as a single XLA program.

Capability parity with the reference DDIMSampler (lib/model_zoo/ddim.py:10-299):
uniform timestep subset, eta-sigmas, CFG batch-doubling, img2img entry via
x0 forward-noising, temperature. TPU-first: the 50-step loop is a
``lax.scan`` so weights stay HBM-resident across all steps and XLA pipelines
the whole trajectory; RNG is an explicit key, split per step.

Quirk preserved deliberately (ddim.py:140-143): when no unconditional
conditioning is given, the reference multiplies eps by the guidance scale.
We replicate it only when ``unconditional_conditioning is None`` so released
checkpoints behave identically (live only at ugscale == 1.0 in the app).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu.diffusion import schedules as sched_lib


class DDIMSampler:
    """Thin stateful facade mirroring the reference API; the hot path is the
    pure function :meth:`sample_fn`, designed to be jitted by callers."""

    def __init__(self, model):
        self.model = model

    def make_tables(self, steps, eta=0.0):
        return sched_lib.make_ddim_tables(self.model.schedule, steps, eta=eta)

    def sample(self, params, rng, shape, x_info, c_info, steps=50, eta=0.0,
               temperature=1.0, x_type="image", c_type="image",
               self_attn_fn=None, encoder_interval=1, cfg_interval=1,
               deep_interval=1, cfg_extrapolate="const", phases=None,
               reuse_self_attn_fn=None):
        """Eager-friendly entry; mirrors reference sample() (ddim.py:58-79).

        x_info: optional dict with 'xt' (start latent) or
                ('x0', 'x0_forward_timesteps') for img2img (ddim.py:94-105).
        c_info: {'conditioning', 'unconditional_conditioning' (or None),
                 'unconditional_guidance_scale', optional 'control' hint}.
        Returns (final latent, {'pred_x0': last x0 estimate}).
        """
        x_info = dict(x_info or {})
        tables = self.make_tables(steps, eta)
        timesteps = tables.timesteps

        rng, init_rng = jax.random.split(rng)
        n_steps = len(timesteps)
        if x_info.get("xt") is not None:
            x = jnp.asarray(x_info["xt"])
        elif x_info.get("x0") is not None:
            k = int(x_info["x0_forward_timesteps"])
            x0 = jnp.asarray(x_info["x0"])
            ts = jnp.full((shape[0],), int(timesteps[k]), jnp.int32)
            noise = jax.random.normal(init_rng, x0.shape, x0.dtype)
            x = self.model.q_sample(x0, ts, noise)
            n_steps = k
        else:
            x = jax.random.normal(init_rng, shape, jnp.float32)

        return self.sample_fn(params, rng, x, c_info, tables, n_steps,
                              temperature=temperature, x_type=x_type,
                              c_type=c_type, self_attn_fn=self_attn_fn,
                              encoder_interval=encoder_interval,
                              cfg_interval=cfg_interval,
                              deep_interval=deep_interval,
                              cfg_extrapolate=cfg_extrapolate,
                              phases=phases,
                              reuse_self_attn_fn=reuse_self_attn_fn)

    def sample_multicontext(self, params, rng, shape, x_info, c_info_list,
                            steps=50, eta=0.0, temperature=1.0,
                            x_type="image", mixing_type="attention",
                            self_attn_fn=None):
        """Multi-context sampling (reference ddim.py:174-299): several context
        streams mixed per context block; one shared guidance scale
        (asserted, ddim.py:257-262)."""
        tables = self.make_tables(steps, eta)
        scales = {ci["unconditional_guidance_scale"] for ci in c_info_list}
        assert len(scales) == 1, \
            "a different guidance scale between contexts is not allowed"
        scale = scales.pop()
        use_cfg = scale != 1.0

        rng, init_rng = jax.random.split(rng)
        x_info = dict(x_info or {})
        if x_info.get("xt") is not None:
            x = jnp.asarray(x_info["xt"])
        else:
            x = jax.random.normal(init_rng, shape, jnp.float32)

        n_steps = len(tables.timesteps)
        idxs = np.arange(n_steps)[::-1]
        per_step_np = np.stack([
            tables.timesteps[idxs].astype(np.float32), tables.alphas[idxs],
            tables.alphas_prev[idxs], tables.sqrt_one_minus_alphas[idxs],
            tables.sigmas[idxs]], axis=1)
        per_step = jnp.asarray(per_step_np, jnp.float32)
        b = shape[0]

        def eps_fn(xt, ts, key):
            if use_cfg:
                ci_list = [dict(type=ci["type"], ratio=ci["ratio"],
                                c=jnp.concatenate([ci["unconditional_conditioning"],
                                                   ci["conditioning"]]))
                           for ci in c_info_list]
                x_in = jnp.concatenate([xt, xt])
                t_in = jnp.concatenate([ts, ts])
            else:
                ci_list = [dict(type=ci["type"], ratio=ci["ratio"],
                                c=ci["conditioning"]) for ci in c_info_list]
                x_in, t_in = xt, ts
            e = self.model.apply_model_multicontext(
                params, {"type": x_type, "x": x_in}, t_in, ci_list,
                mixing_type=mixing_type, rng=key,
                self_attn_fn=self_attn_fn).astype(jnp.float32)
            if not use_cfg:
                return e
            e_uc, e_c = jnp.split(e, 2)
            return e_uc + scale * (e_c - e_uc)

        def step(carry, row):
            xt, key = carry
            key, mix_key, nkey = jax.random.split(key, 3)
            ts = jnp.full((b,), row[0].astype(jnp.int32), jnp.int32)
            e_t = eps_fn(xt, ts, mix_key)
            xf = xt.astype(jnp.float32)
            a_t, a_prev, s1m, sigma = row[1], row[2], row[3], row[4]
            pred_x0 = (xf - s1m * e_t) / jnp.sqrt(a_t)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) * e_t
            noise = sigma * jax.random.normal(nkey, xf.shape, jnp.float32) * temperature
            x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
            return (x_prev.astype(xt.dtype), key), pred_x0

        (x_final, _), pred_x0s = jax.lax.scan(step, (x, rng), per_step)
        return x_final, {"pred_x0": pred_x0s[-1]}

    def sample_fn(self, params, rng, x, c_info, tables, n_steps=None, *,
                  temperature=1.0, noise_dropout=0.0, x_type="image",
                  c_type="image", self_attn_fn=None, encoder_interval=1,
                  cfg_interval=1, deep_interval=1, cfg_extrapolate="const",
                  phases=None, reuse_self_attn_fn=None):
        """Pure scan over DDIM steps (jit-able; static: tables, n_steps, shapes).

        encoder_interval > 1 enables encoder propagation (Faster Diffusion,
        arXiv:2312.09608): the UNet encoder (+ ControlNet) runs only every
        k-th step and its features are reused in between — an opt-in,
        output-changing speedup (~20-30%% at k=2-3).

        cfg_interval > 1 enables CFG-delta reuse: the unconditional half of
        the CFG-doubled batch runs only every k-th step; in between, the
        model is evaluated on the conditional half alone (batch n, not 2n)
        and the guidance delta (e_c - e_uc) carried from the last full step
        is extrapolated as e_t = e_c + (scale-1)*delta. At scale == 1 this
        is exactly the plain sampler (the delta term vanishes), which the
        unit test exploits. cfg_extrapolate="linear" upgrades the carried
        delta to a first-order extrapolation — at reuse step j the delta is
        delta + j/k * (delta - delta_prev) with delta_prev from the
        previous group's key step (zero slope for the first group) — same
        cost, better tracking of the guidance drift across a group (the
        delta term still vanishes at scale 1, so exactness is preserved).
        Opt-in and output-changing for scale != 1 —
        SSIM-gated like encoder propagation. Composes with
        encoder_interval when the two intervals are EQUAL (key steps
        coincide: the cached encoder skips are sliced to the conditional
        half on reuse steps); other combinations are rejected.

        deep_interval > 1 enables DeepCache (arXiv:2312.00858): the deep
        decoder branch (everything below the highest-resolution level) is
        cached on key steps; reuse steps run only the shallow suffix. It
        rides the cfg-reuse group scan, so it requires CFG and
        cfg_interval == deep_interval. With encoder_interval == 1 the
        shallow ENCODER re-runs fresh each reuse step (the current latent
        still enters the model — DeepCache proper); with
        encoder_interval == deep_interval the cached shallow skips are
        reused too (maximal turbo). Output-changing, SSIM-gated.

        phases=[(n1, k1), (n2, k2), ...] enables a PHASED turbo schedule:
        the first n1 sampled steps (the high-noise end, where guidance
        bends the trajectory most) run the maximal turbo composition
        (encoder cache + CFG-delta reuse + DeepCache) at interval k1, the
        next n2 at k2, and so on; k == 1 phases run the exact sampler.
        sum(n_i) must equal n_steps. Each k > 1 phase is its own group
        scan, so a phase boundary is always a group boundary: caches and
        deltas never cross it, and a phase split that subdivides a uniform
        schedule at a group boundary (e.g. [(4,2),(4,2)] vs k=2 over 8
        steps) is bit-identical to the uniform run under
        cfg_extrapolate="const" (unit-tested). Under "linear" the slope
        carry resets at each phase boundary (the first group of a phase
        extrapolates with zero slope), because slopes measured at one
        interval don't rescale to another. Requires CFG; the uniform
        interval arguments must stay 1 when phases is given. Motivation
        (arXiv:2312.00858 §4.2 observes non-uniform caching beats uniform
        at equal cost): denser key steps early buy quality where reuse
        error is largest, letting the tail run sparser for the same total
        key-step budget.

        reuse_self_attn_fn, if given, replaces self_attn_fn for the model
        calls on REUSE steps only (key steps keep the exact attention) —
        the hook for KV-pooled reuse attention (ops/kvpool.py). Requires
        the cfg-reuse group scan (cfg_interval > 1 or phases); opt-in and
        output-changing, SSIM-gated like the other turbos."""
        model = self.model
        cond = c_info["conditioning"]
        uncond = c_info.get("unconditional_conditioning")
        scale = c_info.get("unconditional_guidance_scale", 1.0)
        control = c_info.get("control")

        # Hoist the ControlNet hint pyramid out of the denoise loop: the
        # 8-conv embedding depends only on the hint image, so compute it once
        # per request and CFG-tile the latent-res embedding instead of
        # re-running the pyramid 2x per step (the reference recomputes it
        # every forward, controlnet.py:302-324). Output-identical.
        control_embed = None
        if control is not None and hasattr(model, "ctl"):
            control_embed = model.ctl.hint_embed(params["ctl"], control)
            control = None
        # per-request control gating for mixed batches: (B,) 0/1 — mask 0
        # reproduces the reference's no-hint semantics exactly (ccs_zeros
        # pops 0, pfd.py:475-478) while keeping one SPMD program
        control_mask = c_info.get("control_mask")
        if control is None and control_embed is None:
            control_mask = None

        total = len(tables.timesteps)
        if n_steps is None:
            n_steps = total
        # reversed time: index runs total-1 .. total-n_steps... actually the
        # reference runs indices n_steps-1 .. 0 over timesteps[:n_steps].
        idxs = np.arange(n_steps)[::-1]
        per_step_np = np.stack([
            tables.timesteps[idxs].astype(np.float32),
            tables.alphas[idxs],
            tables.alphas_prev[idxs],
            tables.sqrt_one_minus_alphas[idxs],
            tables.sigmas[idxs],
        ], axis=1)
        per_step = jnp.asarray(per_step_np, jnp.float32)

        b = x.shape[0]
        use_cfg = uncond is not None

        def make_inputs(xt, ts):
            """CFG-doubled (x_in, t_in, c_info_in) or plain."""
            if not use_cfg:
                ci = {"type": c_type, "c": cond}
                if control_embed is not None:
                    ci["control_embed"] = control_embed
                elif control is not None:
                    ci["control"] = control
                if control_mask is not None:
                    ci["control_mask"] = control_mask
                return xt, ts, ci
            x_in = jnp.concatenate([xt, xt], axis=0)
            t_in = jnp.concatenate([ts, ts], axis=0)
            ci = {"type": c_type, "c": jnp.concatenate([uncond, cond], axis=0)}
            if control_embed is not None:
                ci["control_embed"] = jnp.concatenate(
                    [control_embed, control_embed], axis=0)
            elif control is not None:
                ci["control"] = jnp.concatenate([control, control], axis=0)
            if control_mask is not None:
                ci["control_mask"] = jnp.concatenate(
                    [control_mask, control_mask], axis=0)
            return x_in, t_in, ci

        def eps_fn(xt, ts):
            x_in, t_in, ci = make_inputs(xt, ts)
            e_t = model.apply_model(params, {"type": x_type, "x": x_in}, t_in,
                                    ci, self_attn_fn=self_attn_fn)
            return guide(e_t)

        def guide(e):
            e = e.astype(jnp.float32)
            if not use_cfg:
                return e * scale  # reference quirk ddim.py:140-143
            e_uc, e_c = jnp.split(e, 2, axis=0)
            return e_uc + scale * (e_c - e_uc)

        def eps_cached(xt, ts, cache, is_key):
            x_in, t_in, ci = make_inputs(xt, ts)

            def full(_):
                return model.apply_model_encoder(
                    params, {"type": x_type, "x": x_in}, t_in, ci,
                    self_attn_fn=self_attn_fn)

            cache = jax.lax.cond(is_key, full, lambda c: c, cache)
            e = model.apply_model_decoder(params, cache[0], cache[1], t_in, ci,
                                          x_type=x_type,
                                          self_attn_fn=self_attn_fn)
            return guide(e), cache

        # eta == 0 makes every sigma exactly 0 (a static numpy fact at trace
        # time): skip generating the dead full-latent normal inside the scan.
        # The key SPLITS are kept so the rng stream/threading is identical.
        no_eta_noise = bool(np.all(per_step_np[:, 4] == 0.0))

        def ddim_update(xt, key, row, e_t):
            a_t, a_prev, sqrt_1m_a, sigma = row[1], row[2], row[3], row[4]
            xf = xt.astype(jnp.float32)
            pred_x0 = (xf - sqrt_1m_a * e_t) / jnp.sqrt(a_t)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) * e_t
            key, nkey = jax.random.split(key)
            if no_eta_noise:
                noise = 0.0
            else:
                noise = (sigma * jax.random.normal(nkey, xf.shape, jnp.float32)
                         * temperature)
                if noise_dropout > 0.0:
                    # reference applies dropout to the eta-noise (ddim.py:167-168)
                    key, dkey = jax.random.split(key)
                    keep = jax.random.bernoulli(dkey, 1.0 - noise_dropout,
                                                noise.shape)
                    noise = jnp.where(keep, noise / (1.0 - noise_dropout), 0.0)
            x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
            return x_prev.astype(xt.dtype), key, pred_x0

        if phases is not None:
            # ValueError (not assert): reachable from user input
            # (serve.py --phases / BENCH_PHASES), must survive python -O
            if not use_cfg:
                raise ValueError(
                    "phases require CFG (the turbo composition)")
            if not (encoder_interval == 1 and cfg_interval == 1
                    and deep_interval == 1):
                raise ValueError(
                    "phases replaces the uniform interval arguments; leave "
                    "encoder/cfg/deep_interval at 1")
            ns = [int(n) for n, _ in phases]
            ks = [int(k) for _, k in phases]
            if not (all(n >= 1 for n in ns) and all(k >= 1 for k in ks)):
                raise ValueError(f"phase lengths/intervals must be >= 1: "
                                 f"{phases}")
            if sum(ns) != n_steps:
                raise ValueError(f"phases cover {sum(ns)} steps, schedule "
                                 f"has {n_steps}")
            x_cur, key_cur, last_px0 = x, rng, None
            off = 0
            for n_p, k_p in zip(ns, ks):
                rows_np = per_step_np[off:off + n_p]
                off += n_p
                if k_p == 1:
                    def exact_step(carry, row):
                        xt, key = carry
                        ts = jnp.full((b,), row[0].astype(jnp.int32),
                                      jnp.int32)
                        e_t = eps_fn(xt, ts)
                        x_prev, key, px0 = ddim_update(xt, key, row, e_t)
                        return (x_prev, key), px0
                    (x_cur, key_cur), px0s = jax.lax.scan(
                        exact_step, (x_cur, key_cur),
                        jnp.asarray(rows_np, jnp.float32))
                    last_px0 = px0s[-1]
                else:
                    x_cur, key_cur, last_px0 = self._sample_fn_cfg_reuse(
                        params, key_cur, x_cur, rows_np, n_p, make_inputs,
                        ddim_update, cond=cond, scale=scale, control=control,
                        control_embed=control_embed, x_type=x_type,
                        c_type=c_type, self_attn_fn=self_attn_fn,
                        cfg_interval=k_p, use_enc_cache=True, use_deep=True,
                        extrapolate=cfg_extrapolate, with_key=True,
                        control_mask=control_mask,
                        reuse_self_attn_fn=reuse_self_attn_fn)
            return x_cur, {"pred_x0": last_px0}

        if deep_interval > 1:
            # ValueError (not assert): these knobs are user-reachable
            # (serve.py / BENCH_* env), must survive python -O
            if not (use_cfg and cfg_interval == deep_interval):
                raise ValueError(
                    "deep_interval rides the cfg-reuse group scan: it "
                    "requires CFG and cfg_interval == deep_interval")
            if not ((control is None and control_embed is None)
                    or encoder_interval == deep_interval):
                raise ValueError(
                    "DeepCache with ControlNet requires the encoder cache "
                    "(encoder_interval == deep_interval): fresh shallow "
                    "skips would need the full ControlNet forward")

        if reuse_self_attn_fn is not None and not (cfg_interval > 1
                                                   and use_cfg):
            raise ValueError(
                "reuse_self_attn_fn applies to cfg-reuse steps: it requires "
                "CFG and cfg_interval > 1 (or a phased schedule)")

        if cfg_interval > 1 and use_cfg:
            if encoder_interval not in (1, cfg_interval):
                raise ValueError(
                    "cfg_interval composes with encoder_interval only when "
                    "the intervals are equal (key steps must coincide)")
            return self._sample_fn_cfg_reuse(
                params, rng, x, per_step_np, n_steps, make_inputs, ddim_update,
                cond=cond, scale=scale, control=control,
                control_embed=control_embed, x_type=x_type, c_type=c_type,
                self_attn_fn=self_attn_fn, cfg_interval=cfg_interval,
                use_enc_cache=encoder_interval > 1,
                use_deep=deep_interval > 1,
                extrapolate=cfg_extrapolate, control_mask=control_mask,
                reuse_self_attn_fn=reuse_self_attn_fn)

        if encoder_interval <= 1:
            def step(carry, inp):
                xt, key = carry
                row, = inp
                ts = jnp.full((b,), row[0].astype(jnp.int32), jnp.int32)
                e_t = eps_fn(xt, ts)
                x_prev, key, pred_x0 = ddim_update(xt, key, row, e_t)
                return (x_prev, key), pred_x0

            (x_final, _), pred_x0s = jax.lax.scan(step, (x, rng), (per_step,))
            return x_final, {"pred_x0": pred_x0s[-1]}

        # --- encoder propagation path ---
        x_in0, t_in0, ci0 = make_inputs(
            x, jnp.full((b,), int(per_step_np[0, 0]), jnp.int32))
        cache0 = jax.tree.map(
            jnp.zeros_like,
            jax.eval_shape(lambda: model.apply_model_encoder(
                params, {"type": x_type, "x": x_in0}, t_in0, ci0,
                self_attn_fn=self_attn_fn)))
        idxs_arr = jnp.arange(n_steps)

        def step(carry, inp):
            xt, key, cache = carry
            row, i = inp
            ts = jnp.full((b,), row[0].astype(jnp.int32), jnp.int32)
            is_key = (i % encoder_interval) == 0
            e_t, cache = eps_cached(xt, ts, cache, is_key)
            x_prev, key, pred_x0 = ddim_update(xt, key, row, e_t)
            return (x_prev, key, cache), pred_x0

        (x_final, _, _), pred_x0s = jax.lax.scan(
            step, (x, rng, cache0), (per_step, idxs_arr))
        return x_final, {"pred_x0": pred_x0s[-1]}

    def _sample_fn_cfg_reuse(self, params, rng, x, per_step_np, n_steps,
                             make_inputs, ddim_update, *, cond, scale,
                             control, control_embed, x_type, c_type,
                             self_attn_fn, cfg_interval, use_enc_cache,
                             use_deep=False, extrapolate="const",
                             with_key=False, control_mask=None,
                             reuse_self_attn_fn=None):
        """CFG-delta-reuse scan (see sample_fn docstring). The step loop is a
        scan over GROUPS of cfg_interval steps — group step 0 runs the full
        CFG-doubled model (refreshing the guidance delta, the encoder cache
        when composed with encoder propagation, and the DeepCache deep-branch
        feature when composed with deep_interval); the remaining k-1 steps
        run the conditional half only — decoder-only under the encoder
        cache, shallow-suffix-only under DeepCache. Grouping sidesteps
        lax.cond's same-shape constraint (the model batch differs between
        full and reuse steps). Caches flow only WITHIN a group's Python
        unroll, so they never enter the scan carry."""
        model = self.model
        b = x.shape[0]
        k = cfg_interval
        n_sh = model.deep_split_skips(x_type) if use_deep else None

        def cond_inputs(xt, ts):
            ci = {"type": c_type, "c": cond}
            if control_embed is not None:
                ci["control_embed"] = control_embed
            elif control is not None:
                ci["control"] = control
            if control_mask is not None:
                ci["control_mask"] = control_mask
            return xt, ts, ci

        def full_step(xt, key, row):
            ts = jnp.full((b,), row[0].astype(jnp.int32), jnp.int32)
            x_in, t_in, ci = make_inputs(xt, ts)
            deep = None
            if use_deep:
                h_mid, hs = model.apply_model_encoder(
                    params, {"type": x_type, "x": x_in}, t_in, ci,
                    self_attn_fn=self_attn_fn)
                h_deep = model.apply_model_decoder_deep(
                    params, h_mid, hs[n_sh:], t_in, ci, x_type=x_type,
                    self_attn_fn=self_attn_fn)
                e = model.apply_model_decoder_shallow(
                    params, h_deep, hs[:n_sh], t_in, ci, x_type=x_type,
                    self_attn_fn=self_attn_fn)
                deep = h_deep[b:]  # cond half only — all a reuse step needs
                cache = (h_mid, hs) if use_enc_cache else None
            elif use_enc_cache:
                cache = model.apply_model_encoder(
                    params, {"type": x_type, "x": x_in}, t_in, ci,
                    self_attn_fn=self_attn_fn)
                e = model.apply_model_decoder(
                    params, cache[0], cache[1], t_in, ci, x_type=x_type,
                    self_attn_fn=self_attn_fn)
            else:
                cache = None
                e = model.apply_model(params, {"type": x_type, "x": x_in},
                                      t_in, ci, self_attn_fn=self_attn_fn)
            e_uc, e_c = jnp.split(e.astype(jnp.float32), 2, axis=0)
            delta = e_c - e_uc
            x_prev, key, px0 = ddim_update(xt, key, row, e_uc + scale * delta)
            return x_prev, key, px0, delta, cache, deep

        # reuse steps may run a cheaper self-attention (KV pooling,
        # ops/kvpool.py) — key steps above always use the exact fn
        r_attn = reuse_self_attn_fn if reuse_self_attn_fn is not None \
            else self_attn_fn

        def reuse_step(xt, key, row, delta, cache, deep):
            ts = jnp.full((b,), row[0].astype(jnp.int32), jnp.int32)
            x_in, t_in, ci = cond_inputs(xt, ts)
            if use_deep:
                if use_enc_cache:
                    hs_sh = jax.tree.map(lambda a: a[b:],
                                         tuple(cache[1][:n_sh]))
                else:
                    hs_sh = model.apply_model_encoder_shallow(
                        params, {"type": x_type, "x": x_in}, t_in, ci,
                        self_attn_fn=r_attn)
                e_c = model.apply_model_decoder_shallow(
                    params, deep, hs_sh, t_in, ci, x_type=x_type,
                    self_attn_fn=r_attn)
            elif use_enc_cache:
                ch, chs = jax.tree.map(lambda a: a[b:], cache)  # cond half
                e_c = model.apply_model_decoder(
                    params, ch, chs, t_in, ci, x_type=x_type,
                    self_attn_fn=r_attn)
            else:
                e_c = model.apply_model(params, {"type": x_type, "x": x_in},
                                        t_in, ci, self_attn_fn=r_attn)
            e_t = e_c.astype(jnp.float32) + (scale - 1.0) * delta
            return ddim_update(xt, key, row, e_t)

        # "linear": first-order delta extrapolation — slope from the
        # previous group's key-step delta, zeroed (valid=0) for the first
        # group. Carrying (delta_prev, valid) in the scan costs one latent-
        # sized fp32 buffer; the const path's carry stays untouched.
        if extrapolate not in ("const", "linear"):
            raise ValueError(f"cfg_extrapolate must be 'const' or 'linear', "
                             f"got {extrapolate!r}")
        linear = extrapolate == "linear"

        def group(carry, rows):
            if linear:
                xt, key, dprev, valid = carry
            else:
                xt, key = carry
            xt, key, px0, delta, cache, deep = full_step(xt, key, rows[0])
            slope = (delta - dprev) * (valid / k) if linear else None
            for j in range(1, k):
                d_j = delta + slope * j if linear else delta
                xt, key, px0 = reuse_step(xt, key, rows[j], d_j, cache, deep)
            if linear:
                return (xt, key, delta, jnp.ones((), jnp.float32)), px0
            return (xt, key), px0

        # The n_steps % k remainder runs as a TRAILING partial group (one
        # full CFG step + r-1 reuse steps, unrolled) so the full-step
        # schedule stays exactly i % k == 0 — the same key-step schedule as
        # plain encoder propagation, which the scale-1 equivalence (and the
        # composed cache reuse) depends on. A lead-in remainder would shift
        # every group's key step off that schedule.
        r = n_steps % k
        n_grouped = n_steps - r
        x_cur, key_cur, last_px0 = x, rng, None
        dprev = jnp.zeros(x.shape, jnp.float32) if linear else None
        valid = jnp.zeros((), jnp.float32) if linear else None
        if n_grouped:
            rows_grouped = jnp.asarray(
                per_step_np[:n_grouped].reshape(n_grouped // k, k, 5),
                jnp.float32)
            carry0 = (x_cur, key_cur, dprev, valid) if linear \
                else (x_cur, key_cur)
            carry, px0s = jax.lax.scan(group, carry0, rows_grouped)
            if linear:
                x_cur, key_cur, dprev, valid = carry
            else:
                x_cur, key_cur = carry
            last_px0 = px0s[-1]
        if r:
            row = jnp.asarray(per_step_np[n_grouped], jnp.float32)
            x_cur, key_cur, last_px0, delta, cache, deep = full_step(
                x_cur, key_cur, row)
            slope = (delta - dprev) * (valid / k) if linear else None
            for j in range(1, r):
                row = jnp.asarray(per_step_np[n_grouped + j], jnp.float32)
                d_j = delta + slope * j if linear else delta
                x_cur, key_cur, last_px0 = reuse_step(
                    x_cur, key_cur, row, d_j, cache, deep)
        if with_key:
            # phased-schedule internal entry: thread the rng key so the
            # next phase continues the same stream
            return x_cur, key_cur, last_px0
        return x_cur, {"pred_x0": last_px0}
