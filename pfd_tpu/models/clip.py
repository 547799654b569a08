"""CLIP / OpenCLIP context encoders — the legacy conditioning path.

Capability parity with reference lib/model_zoo/clip.py: SeeCoder slots into
the same registry surface these encoders define (the "reusability story",
SURVEY §2.8). Implemented over HuggingFace *Flax* CLIP models so the compute
path is JAX end-to-end; the reference's monkey-patched embedding variants
(masked tokens, position-agnostic) become ordinary functional re-embeddings
here — Flax modules are pure functions, so no forward-patching is needed.

Weights load from a local path or HF id via ``version=`` (this build has no
network egress; point ``version`` at a downloaded checkout).

OpenCLIP (SD-2.x text) variants are registered but require converted OpenCLIP
weights; their customized-tokenizer machinery (clip.py:494-664) is scheduled
for a later round.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pfd_tpu import registry


def _lazy_flax_clip(version, kind):
    from transformers import (CLIPTokenizer, FlaxCLIPModel, FlaxCLIPTextModel)

    tok = CLIPTokenizer.from_pretrained(version)
    if kind == "text_only":
        model = FlaxCLIPTextModel.from_pretrained(version)
    else:
        model = FlaxCLIPModel.from_pretrained(version)
    return tok, model


@registry.register("clip_text_context_encoder_sdv1")
class CLIPTextContextEncoderSDv1:
    """SD-v1 CLIP text conditioning: last_hidden_state tokens
    (reference clip.py:23-55)."""

    def __init__(self, version="openai/clip-vit-large-patch14", max_length=77,
                 policy=None, **kw):
        self.version = version
        self.max_length = max_length
        self._tok = self._model = None

    def _load(self):
        if self._model is None:
            self._tok, self._model = _lazy_flax_clip(self.version, "text_only")

    def init(self, key):
        self._load()
        return self._model.params

    def encode(self, params, text):
        self._load()
        tokens = self._tok(text, truncation=True, max_length=self.max_length,
                           padding="max_length", return_tensors="np")["input_ids"]
        out = self._model(input_ids=tokens, params=params)
        return out.last_hidden_state


@registry.register("clip_text_context_encoder")
class CLIPTextContextEncoder:
    """Projected + pooled-norm-scaled text tokens (reference clip.py:114-146)."""

    def __init__(self, version="openai/clip-vit-large-patch14", max_length=77,
                 policy=None, **kw):
        self.version = version
        self.max_length = max_length
        self._tok = self._model = None

    def _load(self):
        if self._model is None:
            self._tok, self._model = _lazy_flax_clip(self.version, "full")

    def init(self, key):
        self._load()
        return self._model.params

    def encode(self, params, text):
        self._load()
        tokens = self._tok(text, truncation=True, max_length=self.max_length,
                           padding="max_length", return_tensors="np")["input_ids"]
        m = self._model.module.bind({"params": params})
        out = m.text_model(input_ids=jnp.asarray(tokens))
        proj = params["text_projection"]["kernel"]
        z = out.last_hidden_state @ proj
        z_pooled = out.pooler_output @ proj
        norm = jnp.linalg.norm(z_pooled[:, None, :], axis=-1, keepdims=True)
        return z / norm


@registry.register("clip_image_context_encoder")
class CLIPImageContextEncoder:
    """CLIP image tokens, post-LN + visual projection, cls-pooled norm scaling;
    optional mask weighting (reference clip.py:150-257).

    The reference implements masking by monkey-patching the torch embedding
    forward (clip.py:206-227); here the same math is a pure function."""

    def __init__(self, version="openai/clip-vit-large-patch14", policy=None, **kw):
        self.version = version
        self._tok = self._model = None

    def _load(self):
        if self._model is None:
            self._tok, self._model = _lazy_flax_clip(self.version, "full")

    def init(self, key):
        self._load()
        return self._model.params

    @staticmethod
    def _preprocess(images):
        """(B, H, W, 3) [0,1] -> CLIP pixel_values (B, 3, 224, 224)."""
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        x = jax.image.resize(jnp.asarray(images, jnp.float32),
                             (images.shape[0], 224, 224, 3), "bicubic")
        x = (x - mean) / std
        return x.transpose(0, 3, 1, 2)

    def _encode_pixels(self, params, pixels, vtoken_mask=None):
        m = self._model.module.bind({"params": params})
        out = m.vision_model(pixel_values=pixels)
        z = out.last_hidden_state
        # note: FlaxCLIPVisionTransformer applies post_layernorm only to the
        # pooled output; reference applies it to all tokens (clip.py:180)
        ln = params["vision_model"]["post_layernorm"]
        mu = z.mean(-1, keepdims=True)
        var = jnp.var(z, axis=-1, keepdims=True)
        z = (z - mu) * jax.lax.rsqrt(var + 1e-5) * ln["scale"] + ln["bias"]
        z = z @ params["visual_projection"]["kernel"]
        z_pooled = z[:, 0:1]
        z = z / jnp.linalg.norm(z_pooled, axis=-1, keepdims=True)
        if vtoken_mask is not None:
            z = z * vtoken_mask
        return z

    def encode(self, params, images, masks=None):
        self._load()
        pixels = self._preprocess(np.asarray(images))
        if masks is None:
            return self._encode_pixels(params, pixels)
        # mask weighting (clip.py:188-233): average mask per vision token
        masks = jnp.clip(jnp.asarray(masks, jnp.float32), 0, 1)  # (B,H,W,1)
        images = np.asarray(images) * np.asarray(masks)
        pixels = self._preprocess(images)
        m224 = jax.image.resize(masks, (masks.shape[0], 224, 224, 1), "bilinear")
        patch = params["vision_model"]["embeddings"]["patch_embedding"]["kernel"]
        ph, pw = patch.shape[0], patch.shape[1]
        pooled = jax.lax.reduce_window(m224[..., 0], 0.0, jax.lax.add,
                                       (1, ph, pw), (1, ph, pw), "VALID")
        vtoken = pooled.reshape(masks.shape[0], -1, 1) / (ph * pw)
        gscale = m224.mean(axis=(1, 2, 3)).reshape(-1, 1, 1)
        vtoken_mask = jnp.concatenate([gscale, vtoken], axis=1)
        return self._encode_pixels(params, pixels, vtoken_mask)


@registry.register("clip_image_context_encoder_position_agnostic")
class CLIPImageContextEncoderPA(CLIPImageContextEncoder):
    """Position-agnostic variant: grid position embeddings replaced by their
    mean (reference clip.py:259-286). Implemented by editing the embedding
    table functionally instead of patching the module."""

    def init(self, key):
        params = super().init(key)
        emb = params["vision_model"]["embeddings"]["position_embedding"]["embedding"]
        pa = jnp.concatenate(
            [emb[0:1], jnp.tile(emb[1:].mean(0, keepdims=True), (emb.shape[0] - 1, 1))],
            axis=0)
        params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy ok
        params["vision_model"]["embeddings"]["position_embedding"]["embedding"] = pa
        return params
