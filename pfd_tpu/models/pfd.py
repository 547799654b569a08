"""PromptFreeDiffusion — the composite model (vae + ctx + diffuser [+ ctl]).

Capability parity with the reference `pfd` / `pfd_with_control`
(lib/model_zoo/pfd.py:28-528): modality-keyed sub-model dicts, the DDPM
schedule buffers, q_sample / p_losses training math, vae encode/decode with
latent scaling, ctx_encode dispatch, and the interleaved data/context block
walk with optional ControlNet residuals.

TPU-first differences: sub-models are pure functions over a params pytree
{'vae': {modality: ...}, 'ctx': {...}, 'diffuser': {...}, 'ctl': ...};
apply_model is ordinary traced control flow; RNG is explicit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu import registry
from pfd_tpu.diffusion import schedules as sched_lib
from pfd_tpu.policy import Policy, FP32


def _extract(table, t, ndim):
    """Gather per-timestep scalars and broadcast to x's rank
    (reference diffusion_utils.py:79-82)."""
    out = jnp.asarray(table, jnp.float32)[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


@registry.register("pfd")
class PromptFreeDiffusion:
    def __init__(self,
                 vae_cfg_list,
                 ctx_cfg_list,
                 diffuser_cfg_list,
                 latent_scale_factor=None,
                 beta_linear_start=1e-4,
                 beta_linear_end=2e-2,
                 timesteps=1000,
                 use_ema=False,
                 global_layer_ptr=None,
                 parameterization="eps",
                 loss_type="l2",
                 l_simple_weight=1.0,
                 l_elbo_weight=0.0,
                 v_posterior=0.0,
                 policy: Policy = FP32,
                 **kwargs):
        self.policy = policy
        self.vae = {name: self._build(cfg) for name, cfg in vae_cfg_list}
        self.ctx = {name: self._build(cfg) for name, cfg in ctx_cfg_list}
        self.diffuser = {name: self._build(cfg) for name, cfg in diffuser_cfg_list}
        self.latent_scale_factor = latent_scale_factor or {}
        self.global_layer_ptr = global_layer_ptr
        self.parameterization = parameterization
        self.loss_type = loss_type
        self.l_simple_weight = l_simple_weight
        self.l_elbo_weight = l_elbo_weight
        self.use_ema = use_ema
        self.schedule = sched_lib.make_diffusion_schedule(
            "linear", timesteps, linear_start=beta_linear_start,
            linear_end=beta_linear_end, v_posterior=v_posterior,
            parameterization=parameterization)

    def _build(self, cfg):
        model = registry.get(cfg["type"])(**cfg.get("args", {}), policy=getattr(self, "policy", FP32))
        return model

    @property
    def num_timesteps(self):
        return self.schedule.num_timesteps

    # ---- init ----------------------------------------------------------

    def init(self, key):
        groups = {"vae": self.vae, "ctx": self.ctx, "diffuser": self.diffuser}
        params = {}
        for gname, group in groups.items():
            keys = jax.random.split(key, len(group) + 1)
            key = keys[0]
            params[gname] = {name: m.init(k)
                             for (name, m), k in zip(group.items(), keys[1:])}
        return params

    # ---- vae / ctx -------------------------------------------------------

    def vae_encode(self, params, x, which="image", rng=None, sample=True):
        """x in [0,1] -> scaled latent (pfd.py:266-273)."""
        z = self.vae[which].encode(params["vae"][which], x, rng=rng, sample=sample)
        scale = self.latent_scale_factor.get(which)
        if scale is not None:
            z = z * scale
        return z

    def vae_decode(self, params, z, which="image"):
        scale = self.latent_scale_factor.get(which)
        if scale is not None:
            z = z / scale
        return self.vae[which].decode(params["vae"][which], z)

    def ctx_encode(self, params, x, which="image", **kwargs):
        """SeeCoder (or any registered ctx encoder) -> (B, 148, 768) tokens;
        `vae_*` passthrough as in pfd.py:284-295."""
        if which.startswith("vae_"):
            return self.vae[which[4:]].encode(params["vae"][which[4:]], x, **kwargs)
        return self.ctx[which].encode(params["ctx"][which], x, **kwargs)

    # ---- diffusion math --------------------------------------------------

    def q_sample(self, x0, t, noise):
        """Forward noising (pfd.py:204-207)."""
        s = self.schedule
        a = _extract(s.sqrt_alphas_cumprod, t, x0.ndim).astype(x0.dtype)
        b = _extract(s.sqrt_one_minus_alphas_cumprod, t, x0.ndim).astype(x0.dtype)
        return a * x0 + b * noise

    def predict_start_from_noise(self, xt, t, noise):
        s = self.schedule
        return (_extract(s.sqrt_recip_alphas_cumprod, t, xt.ndim).astype(xt.dtype) * xt
                - _extract(s.sqrt_recipm1_alphas_cumprod, t, xt.ndim).astype(xt.dtype) * noise)

    # ---- the interleaved walk ---------------------------------------------

    def apply_model(self, params, x_info, timesteps, c_info, *, self_attn_fn=None):
        """x_info: {'type': modality, 'x': latent NHWC}
        c_info: {'type': modality, 'c': context tokens}
        Pulls data blocks from diffuser[x_type] and context blocks from
        diffuser[c_type] (pfd.py:326-329) — the checkpoint-zoo mechanism."""
        x_type, x = x_info["type"], x_info["x"]
        c_type, c = c_info["type"], c_info["c"]
        glayer = x_type if self.global_layer_ptr is None else self.global_layer_ptr
        unet = self.diffuser[x_type]
        return unet.apply(
            params["diffuser"][x_type], x, timesteps, c,
            data_params=params["diffuser"][x_type]["data_blocks"],
            context_params=params["diffuser"][c_type]["context_blocks"],
            emb=self.diffuser[glayer].time_embedding(params["diffuser"][glayer], timesteps),
            self_attn_fn=self_attn_fn,
        )

    def _merged_diffuser_params(self, params, x_type, c_type):
        """data blocks from diffuser[x_type], context from diffuser[c_type]
        (pfd.py:326-329), as one param dict for the split encoder/decoder."""
        glayer = x_type if self.global_layer_ptr is None else self.global_layer_ptr
        return {
            "time_embed": params["diffuser"][glayer]["time_embed"],
            "data_blocks": params["diffuser"][x_type]["data_blocks"],
            "context_blocks": params["diffuser"][c_type]["context_blocks"],
        }

    def apply_model_encoder(self, params, x_info, timesteps, c_info, *,
                            self_attn_fn=None):
        """Encoder half (+ ControlNet residuals folded into the skips) for
        encoder-propagation sampling."""
        x_type, c_type = x_info["type"], c_info["type"]
        residuals = None
        embed = c_info.get("control_embed")
        hint = embed if embed is not None else c_info.get("control")
        if hint is not None and hasattr(self, "ctl"):
            residuals = self.ctl.apply(params["ctl"], x_info["x"], hint,
                                       timesteps, c_info["c"],
                                       self_attn_fn=self_attn_fn,
                                       hint_is_embedding=embed is not None)
            residuals = _mask_residuals(residuals, c_info)
        merged = self._merged_diffuser_params(params, x_type, c_type)
        return self.diffuser[x_type].apply_encoder(
            merged, x_info["x"], timesteps, c_info["c"],
            control_residuals=residuals, self_attn_fn=self_attn_fn)

    def apply_model_decoder(self, params, h, hs, timesteps, c_info, *,
                            x_type="image", self_attn_fn=None):
        merged = self._merged_diffuser_params(params, x_type, c_info["type"])
        return self.diffuser[x_type].apply_decoder(
            merged, h, hs, timesteps, c_info["c"], self_attn_fn=self_attn_fn)

    # ---- DeepCache split (arXiv:2312.00858; no reference counterpart — the
    # reference runs the full UNet every step, lib/model_zoo/ddim.py:145-150).

    def deep_split_skips(self, x_type="image"):
        """Number of shallow skips at the diffuser's DeepCache branch point."""
        diffuser = self.diffuser[x_type]
        split_fn = getattr(diffuser, "decoder_split", None)
        split = split_fn() if split_fn is not None else None
        if split is None:
            # clear error instead of a trace-time AttributeError when a
            # classic-layout diffuser (e.g. openai_unet_sd) is driven with
            # deep_interval>1 / phases
            raise ValueError(
                "DeepCache (deep_interval>1 / phased schedules) requires "
                "the 2d_next UNet layout with a multi-level block plan; "
                f"{type(diffuser).__name__} does not support decoder_split")
        return split[2]

    def apply_model_encoder_shallow(self, params, x_info, timesteps, c_info, *,
                                    self_attn_fn=None):
        """Fresh shallow skips for a DeepCache reuse step. ControlNet hints are
        rejected: the shallow residuals would need the FULL ControlNet forward,
        defeating the cache — control requests compose DeepCache with the
        encoder cache instead (residual-folded skips reused wholesale)."""
        assert c_info.get("control") is None and \
            c_info.get("control_embed") is None, \
            "DeepCache fresh-shallow-encoder path does not support ControlNet"
        x_type = x_info["type"]
        merged = self._merged_diffuser_params(params, x_type, c_info["type"])
        return self.diffuser[x_type].apply_encoder_shallow(
            merged, x_info["x"], timesteps, c_info["c"],
            self_attn_fn=self_attn_fn)

    def apply_model_decoder_deep(self, params, h, hs_deep, timesteps, c_info,
                                 *, x_type="image", self_attn_fn=None):
        merged = self._merged_diffuser_params(params, x_type, c_info["type"])
        return self.diffuser[x_type].apply_decoder_deep(
            merged, h, hs_deep, timesteps, c_info["c"],
            self_attn_fn=self_attn_fn)

    def apply_model_decoder_shallow(self, params, h, hs_shallow, timesteps,
                                    c_info, *, x_type="image",
                                    self_attn_fn=None):
        merged = self._merged_diffuser_params(params, x_type, c_info["type"])
        return self.diffuser[x_type].apply_decoder_shallow(
            merged, h, hs_shallow, timesteps, c_info["c"],
            self_attn_fn=self_attn_fn)

    def check_diffuser(self) -> bool:
        """All diffusers must share one layer-order program (pfd.py:297-304)
        — the invariant that makes checkpoint hot-swap recompile-free."""
        plans = [d.plan.ops for d in self.diffuser.values() if hasattr(d, "plan")]
        return all(p == plans[0] for p in plans) if plans else True

    @staticmethod
    def print_debug_checksum(params):
        """Σ|θ| of the first leaf per top-level group (pfd.py:449-455) —
        manual weight-identity spot checks."""
        out = {}
        for group, tree in params.items():
            leaves = jax.tree.leaves(tree)
            if leaves:
                out[group] = float(jnp.abs(leaves[0].astype(jnp.float32)).sum())
        print("debug checksum:", out)
        return out

    # ---- multicontext -------------------------------------------------------

    def apply_model_multicontext(self, params, x_info, timesteps, c_info_list,
                                 mixing_type="attention", *, rng=None,
                                 self_attn_fn=None):
        """Multiple context streams mixed per context block
        (pfd.py:367-439). c_info_list: [{'type', 'c', 'ratio'}].

        'attention': ratio-weighted sum of each context pathway's block output.
        'layer': per-block stochastic pathway choice — the reference draws
        with np.random at forward time (pfd.py:381-385); here the draw uses an
        explicit rng key and selects among precomputed branches (lax.switch
        over a static module set), keeping the function pure/jittable."""
        from pfd_tpu.models import blocks as blk
        from pfd_tpu.models.unet import apply_data_block

        x_type, x = x_info["type"], x_info["x"]
        unet = self.diffuser[x_type]
        pol = unet.policy
        plan = unet.plan

        ratios = np.array([ci["ratio"] for ci in c_info_list], np.float32)
        ratios = ratios / ratios.sum()
        ctx_params = [params["diffuser"][ci["type"]]["context_blocks"]
                      for ci in c_info_list]
        contexts = [pol.cast(ci["c"]) for ci in c_info_list]

        glayer = x_type if self.global_layer_ptr is None else self.global_layer_ptr
        emb = self.diffuser[glayer].time_embedding(params["diffuser"][glayer],
                                                   timesteps)
        emb = pol.cast(emb)
        dp = params["diffuser"][x_type]["data_blocks"]

        if mixing_type == "layer":
            assert rng is not None, "'layer' mixing draws pathways from rng"
        n_ctx_blocks = len(plan.context_specs)
        if rng is not None:
            choices = jax.random.choice(rng, len(c_info_list),
                                        (n_ctx_blocks,), p=jnp.asarray(ratios))

        def run_ctx(i, h):
            spec = plan.context_specs[i]
            outs = [blk.spatial_transformer(cp[str(i)]["0"], h, c, spec.n_heads,
                                            pol, self_attn_fn=self_attn_fn)
                    for cp, c in zip(ctx_params, contexts)]
            if mixing_type == "attention":
                mixed = outs[0] * ratios[0]
                for o, r in zip(outs[1:], ratios[1:]):
                    mixed = mixed + o * r
                return mixed
            if mixing_type == "layer":
                return jax.lax.switch(choices[i], [lambda o=o: o for o in outs])
            raise ValueError(mixing_type)

        hs, h = [], pol.cast(x)
        for op in plan.i_ops + plan.m_ops:
            if op[0] == "d":
                h = apply_data_block(dp[str(op[1])], plan.data_specs[op[1]],
                                     h, emb, pol)
            elif op[0] == "c":
                h = run_ctx(op[1], h)
            elif op[0] == "save":
                hs.append(h)
        for op in plan.o_ops:
            if op[0] == "load":
                h = jnp.concatenate([h, hs.pop()], axis=-1)
            elif op[0] == "d":
                h = apply_data_block(dp[str(op[1])], plan.data_specs[op[1]],
                                     h, emb, pol)
            elif op[0] == "c":
                h = run_ctx(op[1], h)
        return h

    # ---- training loss -----------------------------------------------------

    def get_loss(self, pred, target, mean=True):
        if self.loss_type == "l1":
            loss = jnp.abs(target - pred)
        elif self.loss_type == "l2":
            loss = (target - pred) ** 2
        else:
            raise NotImplementedError(self.loss_type)
        return loss.mean() if mean else loss

    def p_losses(self, params, x0, t, cond, noise, *, x_type="image",
                 c_type="image", self_attn_fn=None):
        """eps-parameterized training loss with VLB weighting (pfd.py:229-264)."""
        x_noisy = self.q_sample(x0, t, noise)
        model_out = self.apply_model(
            params, {"type": x_type, "x": x_noisy}, t,
            {"type": c_type, "c": cond}, self_attn_fn=self_attn_fn)

        target = noise if self.parameterization == "eps" else x0
        loss_simple = self.get_loss(model_out.astype(jnp.float32),
                                    target.astype(jnp.float32), mean=False)
        loss_simple = loss_simple.mean(axis=tuple(range(1, loss_simple.ndim)))
        loss = loss_simple.mean() * self.l_simple_weight
        lvlb = jnp.asarray(self.schedule.lvlb_weights, jnp.float32)[t] * loss_simple
        loss = loss + self.l_elbo_weight * lvlb.mean()
        return loss, {"loss_simple": loss_simple.mean(), "loss_vlb": lvlb.mean()}



def _mask_residuals(residuals, c_info):
    """Per-request control gating: multiply the 13 residuals by a (B,) 0/1
    mask. mask==0 reproduces the reference's no-hint semantics exactly (the
    dummy ccs_zeros pops 0 into every merge site, pfd.py:475-478) while
    keeping a single SPMD program for mixed control/no-control batches;
    fractional values implement the reference's stored-but-unapplied
    control_scales (pfd.py:463) per request."""
    mask = c_info.get("control_mask")
    if residuals is None or mask is None:
        return residuals
    m = jnp.reshape(mask, (-1, 1, 1, 1))
    return [r * m.astype(r.dtype) for r in residuals]


@registry.register("pfd_with_control")
class PromptFreeDiffusionWithControl(PromptFreeDiffusion):
    def __init__(self, *args, ctl_cfg=None, **kwargs):
        super().__init__(*args, **kwargs)
        assert ctl_cfg is not None
        self.ctl = self._build(ctl_cfg)
        self.control_scales = [1.0] * self.ctl.num_residuals  # stored, not applied
        # (parity: reference stores control_scales but never applies them,
        #  pfd.py:463 vs 515-519)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        params = super().init(k1)
        params["ctl"] = self.ctl.init(k2)
        return params

    def apply_model(self, params, x_info, timesteps, c_info, *, self_attn_fn=None):
        x_type, x = x_info["type"], x_info["x"]
        c_type, c = c_info["type"], c_info["c"]
        embed = c_info.get("control_embed")
        hint = embed if embed is not None else c_info.get("control")

        residuals = None
        if hint is not None:
            residuals = self.ctl.apply(params["ctl"], x, hint, timesteps, c,
                                       self_attn_fn=self_attn_fn,
                                       hint_is_embedding=embed is not None)
            residuals = _mask_residuals(residuals, c_info)

        glayer = x_type if self.global_layer_ptr is None else self.global_layer_ptr
        unet = self.diffuser[x_type]
        return unet.apply(
            params["diffuser"][x_type], x, timesteps, c,
            control_residuals=residuals,
            data_params=params["diffuser"][x_type]["data_blocks"],
            context_params=params["diffuser"][c_type]["context_blocks"],
            emb=self.diffuser[glayer].time_embedding(params["diffuser"][glayer], timesteps),
            self_attn_fn=self_attn_fn,
        )
