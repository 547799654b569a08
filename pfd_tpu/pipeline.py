"""Serving facade — the `prompt_free_diffusion` app API, TPU-native.

Mirrors the reference facade (app.py:98-275): checkpoint-tag hot-swap
(`action_load_ctx/diffuser/ctl`), `action_autoset_hw` (64-multiples,
512-1536 clamp), and `action_inference(im, imctl, ctl_method, do_preprocess,
h, w, ugscale, seed, tags...)`.

TPU-first: sampling + VAE decode compile into a single jitted program per
(h, w, batch, control?) bucket, cached; a checkpoint swap is a pytree swap
(all zoo diffusers share one structure — no recompile, pfd.py:297-304's
check_diffuser invariant by construction). RNG is an explicit JAX key derived
from the seed (torch RNG streams are not reproducible here by design).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pfd_tpu import config, registry, zoo
from pfd_tpu.diffusion.ddim import DDIMSampler
from pfd_tpu.io import loader
from pfd_tpu.policy import Policy, FP32, BF16


def _to_array(im):
    """PIL image or array -> float32 (H, W, 3) in [0,1]."""
    if hasattr(im, "convert"):
        im = np.asarray(im.convert("RGB"), np.float32) / 255.0
    im = np.asarray(im, np.float32)
    if im.ndim == 2:
        im = np.stack([im] * 3, -1)
    if im.max() > 1.5:
        im = im / 255.0
    return im


class PromptFreeDiffusionPipeline:
    def __init__(self, *, policy: Policy | None = None, fp16=True,
                 tag_ctx="SeeCoder", tag_diffuser="Deliberate-v2.0",
                 tag_ctl="canny", pretrained_root=None, seed=0,
                 with_control=True, self_attn_fn=None, config_override=None,
                 encoder_interval=1, quantized=False, tome_ratio=0.0,
                 cfg_interval=1, deep_interval=1, control_turbo=False,
                 cfg_extrapolate="const", phases=None, kv_pool=0,
                 kv_min_s=4096):
        self.policy = policy or (BF16 if fp16 else FP32)
        self.root = pretrained_root
        self.with_control = with_control
        self.self_attn_fn = self_attn_fn
        self.config_override = config_override  # dict: tests / custom builds
        self.encoder_interval = encoder_interval  # >1: turbo (output-changing)
        # >1: CFG-delta reuse (diffusion/ddim.py sample_fn docstring) —
        # output-changing turbo, SSIM-gated like encoder_interval
        self.cfg_interval = cfg_interval
        # "linear": first-order guidance-delta extrapolation on reuse steps
        # (ddim.py sample_fn docstring) — same cost, better drift tracking
        self.cfg_extrapolate = cfg_extrapolate
        # >1: DeepCache (ddim.py deep_interval) — reuse steps run only the
        # highest-resolution UNet level; requires cfg_interval == deep_interval
        self.deep_interval = deep_interval
        # >1: KV-pooled self-attention on turbo REUSE steps (ops/kvpool.py)
        # — key steps keep exact attention; requires cfg_interval > 1 or
        # phases. Output-changing, SSIM-gated (`_kv2` gate rows). kv_min_s:
        # sequences shorter than this pass through unpooled (ds2/ds4
        # attention is cheap; tiny test configs lower it).
        self.kv_pool = kv_pool
        self.kv_min_s = kv_min_s
        # [(n, k), ...]: phased turbo schedule (ddim.py sample_fn phases
        # docstring) — dense key steps early, sparse late; replaces the
        # uniform interval knobs (they must stay 1), sum(n) == ddim_steps
        self.phases = phases
        # ControlNet requests sample exactly by default even when the plain-
        # path turbos are on (stale control residuals on reuse steps are a
        # separate approximation). control_turbo=True opts control requests
        # into the same intervals — gated by their own GATE_SET=control rows
        # (tools/e2e_gate.py, docs/PARITY.md).
        self.control_turbo = control_turbo
        # >0: merge that fraction of ds1 self-attention tokens (ops/tome.py)
        # — output-changing turbo, SSIM-gated like encoder_interval/int8
        self.tome_ratio = tome_ratio
        # int8 serving mode (ops/quant.py): diffuser + ControlNet + VAE
        # spatial convs run int8 on the 394-TOPS MXU path; the once-per-image
        # SeeCoder stays bf16. SSIM-gated in tests/test_quant_e2e.py.
        self.quantized = quantized
        self.ddim_steps = 50
        self.ddim_eta = 0.0
        self.n_sample_image = 1
        self.image_latent_dim = 4

        self.tag_ctx = None
        self.tag_diffuser = None
        self.tag_ctl = None

        self._build_net(pa=(tag_ctx == "SeeCoder-PA"))
        self.params = self.net.init(jax.random.PRNGKey(seed))
        if self.quantized:
            from pfd_tpu.ops import quant
            self.params["diffuser"] = quant.quantize_params(self.params["diffuser"])
            self.params["vae"] = quant.quantize_params(self.params["vae"])
            if "ctl" in self.params:
                self.params["ctl"] = quant.quantize_params(self.params["ctl"])
        self.sampler = DDIMSampler(self.net)
        self._jit_cache = {}

        self.action_load_ctx(tag_ctx)
        self.action_load_diffuser(tag_diffuser)
        self.action_load_ctl(tag_ctl)

    # ---- construction ------------------------------------------------------

    def _build_net(self, pa=False):
        if self.config_override is not None:
            import copy

            cfg = copy.deepcopy(self.config_override)
        else:
            name = ("pfd_seecoder_with_controlnet" if self.with_control
                    else "pfd_seecoder")
            cfg = config.model_cfg(name)
            if pa:
                cfg["args"]["ctx_cfg_list"] = [
                    ["image", config.model_cfg("seecoder_pa")]]
        self.net = registry.get(cfg["type"])(**cfg["args"], policy=self.policy)

    # ---- checkpoint hot-swap (app.py:137-195 semantics) ----------------------

    def _cast(self, tree):
        dt = self.policy.param_dtype
        return jax.tree.map(
            lambda a: jnp.asarray(a, dt) if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a),
            tree)

    def action_load_ctx(self, tag):
        """Swap the SeeCoder. PA checkpoints carry a pe_layer; the net is
        rebuilt when PA-ness changes (the reference instead monkey-patches a
        PPE_MLP into the live module, app.py:164-181)."""
        pa = tag == "SeeCoder-PA"
        had_pa = self.net.ctx["image"].qtransformer.with_fea2d_pos
        if pa != had_pa:
            self._build_net(pa=pa)
            self.sampler = DDIMSampler(self.net)
            self._jit_cache.clear()
            # re-init whenever PA-ness changes (either direction): the old
            # ctx pytree's shape no longer matches the rebuilt module, and a
            # missing checkpoint file below must not leave it inconsistent
            self.params["ctx"]["image"] = self.net.ctx["image"].init(
                jax.random.PRNGKey(0))
        path = zoo.resolve(zoo.CTXENCODER_PATH.get(tag), self.root)
        if path is not None and _exists(path):
            sd = loader.load_sd_file(path)
            self.params["ctx"] = self._cast(loader.ctx_sd_to_params(sd))
        self.tag_ctx = tag
        return tag

    def action_load_diffuser(self, tag):
        path = zoo.resolve(zoo.DIFFUSER_PATH.get(tag), self.root)
        if path is not None and _exists(path):
            sd = loader.load_sd_file(path)
            p = self._cast(loader.diffuser_sd_to_params(sd))
            if self.quantized:
                from pfd_tpu.ops import quant
                p = quant.quantize_params(p)
            self.params["diffuser"] = p
        self.tag_diffuser = tag
        return tag

    def action_load_ctl(self, tag):
        annotator, rel = zoo.CONTROLNET_PATH.get(tag, ("none", None))
        path = zoo.resolve(rel, self.root)
        if path is not None and _exists(path):
            sd = loader.load_sd_file(path)
            p = self._cast(loader.ctl_sd_to_params(sd))
            if self.quantized:
                from pfd_tpu.ops import quant
                p = quant.quantize_params(p)
            self.params["ctl"] = p
        self.tag_ctl = tag
        return tag

    def load_vae(self, path):
        sd = loader.load_sd_file(path)
        p = self._cast(loader.vae_sd_to_params(sd))
        if self.quantized:
            from pfd_tpu.ops import quant
            p = quant.quantize_params(p)
        self.params["vae"]["image"] = p

    # ---- shape policy (app.py:197-207) --------------------------------------

    @staticmethod
    def action_autoset_hw(imctl=None):
        if imctl is None:
            return 512, 512
        a = _to_array(imctl)
        h, w = a.shape[:2]
        h = min(max(h // 64 * 64, 512), 1536)
        w = min(max(w // 64 * 64, 512), 1536)
        return h, w

    @staticmethod
    def action_autoset_method(tag):
        return zoo.CONTROLNET_PATH[tag][0]

    # ---- jitted hot path -----------------------------------------------------

    def _sample_decode_fn(self, h, w, batch, has_control, steps, eta):
        key = (h, w, batch, has_control, steps, eta)
        if key not in self._jit_cache:
            tables = self.sampler.make_tables(steps, eta)

            f = self.net.vae["image"].downsample_factor
            zc = self.net.vae["image"].embed_dim

            attn = self.self_attn_fn
            if self.tome_ratio > 0:
                from pfd_tpu.ops import nn as _nn
                from pfd_tpu.ops import tome

                inner = attn or (lambda q, k, v: _nn.dot_product_attention(
                    q, k, v, softmax_dtype=self.policy.softmax_dtype))
                attn = tome.make_tome_attn(inner, (h // f, w // f),
                                           ratio=self.tome_ratio)

            def fn(params, rng, c, u, scale, cc):
                rng, init_rng = jax.random.split(rng)
                x = jax.random.normal(init_rng, (batch, h // f, w // f, zc),
                                      jnp.float32)
                c_info = {"conditioning": c, "unconditional_conditioning": u,
                          "unconditional_guidance_scale": scale}
                if has_control:
                    c_info["control"] = cc
                # ControlNet requests sample exactly unless control_turbo
                # explicitly opts in: under encoder propagation the cached
                # encoder skips hold stale control residuals on non-key
                # steps — an approximation with its own GATE_SET=control
                # SSIM rows (docs/PARITY.md).
                exact_ctl = has_control and not self.control_turbo
                interval = 1 if exact_ctl else self.encoder_interval
                cfg_iv = 1 if exact_ctl else self.cfg_interval
                deep_iv = 1 if exact_ctl else self.deep_interval
                ph = None if exact_ctl else self.phases
                r_attn = None
                if self.kv_pool > 1 and not exact_ctl:
                    from pfd_tpu.ops import nn as _nn
                    from pfd_tpu.ops.kvpool import make_kvpool_attn
                    inner = attn or (
                        lambda q, k, v: _nn.dot_product_attention(
                            q, k, v,
                            softmax_dtype=self.policy.softmax_dtype))
                    r_attn = make_kvpool_attn(inner, (h // f, w // f),
                                              pool=self.kv_pool,
                                              min_s=self.kv_min_s)
                x, _ = self.sampler.sample_fn(
                    params, rng, x, c_info, tables,
                    self_attn_fn=attn,
                    encoder_interval=interval, cfg_interval=cfg_iv,
                    deep_interval=deep_iv,
                    cfg_extrapolate=self.cfg_extrapolate, phases=ph,
                    reuse_self_attn_fn=r_attn)
                return self.net.vae_decode(params, x, "image")

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    @functools.cached_property
    def _ctx_encode_jit(self):
        return jax.jit(lambda params, x: self.net.ctx_encode(params, x, "image"))

    def warmup(self, sizes=((512, 512),), batch=1, with_control=True,
               steps=None):
        """AOT-compile (h, w) buckets from the app's 64-multiple grid
        (app.py:197-207) so first requests don't pay compilation."""
        steps = steps or self.ddim_steps
        for h, w in sizes:
            self._sample_decode_fn(h, w, batch, with_control, steps,
                                   self.ddim_eta)
        return sorted(self._jit_cache)

    def negative_context(self, c, anime_ug_path=None):
        """Unconditional context: zeros, except the anime SeeCoder which uses
        the anime_ug negative embedding zero-padded to the token count
        (app.py:236-241). When no path is given, ``assets/anime_ug.pth`` is
        auto-resolved under pretrained_root, matching the reference default."""
        if self.tag_ctx != "SeeCoder-Anime":
            return jnp.zeros_like(c)
        if anime_ug_path is None:
            cand = zoo.resolve(zoo.ANIME_UG_PATH, self.root)
            if _exists(cand):
                anime_ug_path = cand
        if anime_ug_path is None:
            return jnp.zeros_like(c)
        ug = loader.load_tensor_file(anime_ug_path) if isinstance(anime_ug_path, str) \
            else anime_ug_path
        ug = np.asarray(ug)[None]
        pad = c.shape[1] - ug.shape[1]
        ug = np.concatenate([ug, np.zeros((1, pad, ug.shape[2]), ug.dtype)], 1)
        return jnp.asarray(jnp.tile(jnp.asarray(ug), (c.shape[0], 1, 1)), c.dtype)

    # ---- inference (app.py:212-275) ------------------------------------------

    def action_inference(self, im, imctl=None, ctl_method="canny",
                         do_preprocess=True, h=512, w=512, ugscale=2.0,
                         seed=0, tag_ctx=None, tag_diffuser=None, tag_ctl=None,
                         steps=None, anime_ug_path=None):
        if tag_ctx and tag_ctx != self.tag_ctx:
            self.action_load_ctx(tag_ctx)
        if tag_diffuser and tag_diffuser != self.tag_diffuser:
            self.action_load_diffuser(tag_diffuser)
        if tag_ctl and tag_ctl != self.tag_ctl:
            self.action_load_ctl(tag_ctl)

        steps = steps or self.ddim_steps
        n = self.n_sample_image
        h, w = h // 64 * 64, w // 64 * 64

        craw = jnp.asarray(_to_array(im))[None]
        c = self._ctx_encode_jit(self.params, craw)
        c = jnp.tile(c, (n, 1, 1))
        u = self.negative_context(c, anime_ug_path)

        cc = None
        if self.tag_ctl != "none" and imctl is not None:
            a = _to_array(imctl)
            from pfd_tpu import annotators
            if a.shape[:2] != (h, w):
                a = annotators.resize_image(a, (h, w), method="bicubic")
            if do_preprocess:
                a = annotators.preprocess(a, method=ctl_method, size=(h, w),
                                          params=self.params)
            cc = jnp.asarray(a)[None]
            cc = jnp.tile(cc, (n, 1, 1, 1))

        rng = jax.random.PRNGKey(seed if seed >= 0 else -seed + 100)
        fn = self._sample_decode_fn(h, w, n, cc is not None, steps, self.ddim_eta)
        imgs = fn(self.params, rng, c, u, jnp.float32(ugscale), cc)
        out = [np.asarray(img) for img in imgs]
        if cc is not None:
            out = out + [np.asarray(x) for x in cc]
        return out


def _exists(path):
    import os
    return path is not None and os.path.exists(path)
