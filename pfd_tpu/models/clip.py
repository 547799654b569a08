"""CLIP / OpenCLIP context encoders — the legacy conditioning path.

Capability parity with reference lib/model_zoo/clip.py: SeeCoder slots into
the same registry surface these encoders define (the "reusability story",
SURVEY §2.8). Implemented over HuggingFace *Flax* CLIP models so the compute
path is JAX end-to-end; the reference's monkey-patched embedding variants
(masked tokens, position-agnostic) become ordinary functional re-embeddings
here — Flax modules are pure functions, so no forward-patching is needed.

Weights load from a local path or HF id via ``version=`` (this build has no
network egress; point ``version`` at a downloaded checkout).

OpenCLIP (SD-2.x text) variants are registered below, including the full
customized-tokenizer machinery (reference clip.py:494-664: v1 token-embedding
injection, v2 per-token replacement, v3 multi-vector tokens, and the SD1CE
customized-embedding encoder). Their weights likewise load from a local
checkout via ``version=``.
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
    (reference clip.py:23-55). Compute runs through the functional tower
    (``hf_clip_text_forward``), so weights are testable from a converted torch
    state dict (io/convert.clip_text_sd_to_params) without any HF checkout —
    only tokenization needs one."""

    def __init__(self, version="openai/clip-vit-large-patch14", max_length=77,
                 heads=12, act="quick_gelu", policy=None, **kw):
        self.version = version
        self.max_length = max_length
        self.heads = heads
        self.act = act
        self._tok = self._model = None

    def _load(self):
        if self._model is None:
            self._tok, self._model = _lazy_flax_clip(self.version, "text_only")

    def init(self, key):
        self._load()
        return self._model.params

    def encode_tokens(self, params, input_ids):
        """(B, S) int token ids -> (B, S, C) context tokens."""
        return hf_clip_text_forward(params, jnp.asarray(input_ids),
                                    act=self.act, heads=self.heads)

    def encode(self, params, text):
        self._load()
        tokens = self._tok(text, truncation=True, max_length=self.max_length,
                           padding="max_length", return_tensors="np")["input_ids"]
        return self.encode_tokens(params, tokens)


@registry.register("clip_text_context_encoder")
class CLIPTextContextEncoder:
    """Projected + pooled-norm-scaled text tokens (reference clip.py:114-146)."""

    def __init__(self, version="openai/clip-vit-large-patch14", max_length=77,
                 heads=12, act="quick_gelu", policy=None, **kw):
        self.version = version
        self.max_length = max_length
        self.heads = heads
        self.act = act
        self._tok = self._model = None

    def _load(self):
        if self._model is None:
            self._tok, self._model = _lazy_flax_clip(self.version, "full")

    def init(self, key):
        self._load()
        return self._model.params

    def encode_tokens(self, params, input_ids):
        input_ids = jnp.asarray(input_ids)
        hidden = hf_clip_text_forward(params, input_ids,
                                      act=self.act, heads=self.heads)
        # pooled output = final-LN hidden at the eot token (highest token id),
        # matching HF CLIPTextModel.pooler_output semantics
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = hidden[jnp.arange(hidden.shape[0]), eot]
        proj = params["text_projection"]["kernel"]
        z = hidden @ proj
        z_pooled = pooled @ proj
        norm = jnp.linalg.norm(z_pooled[:, None, :], axis=-1, keepdims=True)
        return z / norm

    def encode(self, params, text):
        self._load()
        tokens = self._tok(text, truncation=True, max_length=self.max_length,
                           padding="max_length", return_tensors="np")["input_ids"]
        return self.encode_tokens(params, tokens)


def hf_clip_vision_forward(vm, pixels, *, heads, act="quick_gelu",
                           vtoken_mask=None, position_agnostic=False,
                           eps=1e-5):
    """HF CLIP vision tower forward from a (converted) param tree — the
    self-contained compute path for the image context encoders, mirroring
    ``hf_clip_text_forward``. ``pixels``: (B, H, W, 3), already resized and
    CLIP-normalized. Returns last_hidden_state (B, 1 + grid^2, C) WITHOUT
    post_layernorm (HF semantics; the reference applies ln_post to all
    tokens itself, clip.py:180).

    ``vtoken_mask`` multiplies the embeddings before the encoder — the
    functional equivalent of the reference's monkey-patched
    customized_embedding_forward (clip.py:209-227). ``position_agnostic``
    replaces grid position embeddings by their mean (clip.py:264-279)."""
    from pfd_tpu.ops import nn as pnn

    emb = vm["embeddings"]
    x = pnn.conv2d(pixels, emb["patch_embedding"],
                   stride=emb["patch_embedding"]["kernel"].shape[0], padding=0)
    b, gh, gw, c = x.shape
    x = x.reshape(b, gh * gw, c)
    cls = jnp.broadcast_to(emb["class_embedding"].reshape(1, 1, c), (b, 1, c))
    x = jnp.concatenate([cls, x], axis=1)
    pos = emb["position_embedding"]["embedding"][:x.shape[1]]
    if position_agnostic:
        pos = jnp.concatenate(
            [pos[0:1], jnp.tile(pos[1:].mean(0, keepdims=True),
                                (pos.shape[0] - 1, 1))], axis=0)
    x = x + pos
    if vtoken_mask is not None:
        x = x * vtoken_mask.astype(x.dtype)
    x = pnn.layer_norm(x, vm["pre_layrnorm"], eps=eps)  # HF's spelling

    def mha(p, h):
        q = pnn.split_heads(pnn.linear(h, p["q_proj"]), heads)
        k = pnn.split_heads(pnn.linear(h, p["k_proj"]), heads)
        v = pnn.split_heads(pnn.linear(h, p["v_proj"]), heads)
        o = pnn.dot_product_attention(q, k, v, scale=q.shape[-1] ** -0.5)
        return pnn.linear(pnn.merge_heads(o), p["out_proj"])

    for i in range(len(vm["encoder"]["layers"])):
        p = vm["encoder"]["layers"][str(i)]
        h = pnn.layer_norm(x, p["layer_norm1"], eps=eps)
        x = x + mha(p["self_attn"], h)
        h = pnn.layer_norm(x, p["layer_norm2"], eps=eps)
        h = pnn.linear(h, p["mlp"]["fc1"])
        h = (h * jax.nn.sigmoid(1.702 * h)) if act == "quick_gelu" \
            else jax.nn.gelu(h, approximate=False)
        x = x + pnn.linear(h, p["mlp"]["fc2"])
    return x


def init_clip_vision(key, *, hidden=1024, layers=24, heads=16, patch=14,
                     image_size=224, intermediate=4096, projection_dim=768,
                     dtype=jnp.float32):
    """Random-init HF-layout CLIP vision tree (ViT-L/14 defaults) — tests and
    offline use; production loads converted checkpoints (io/convert)."""
    from pfd_tpu.ops import nn as pnn

    keys = iter(jax.random.split(key, 6 * layers + 8))
    grid = image_size // patch
    lyrs = {}
    for i in range(layers):
        lyrs[str(i)] = {
            "layer_norm1": pnn.init_norm(hidden, dtype),
            "self_attn": {n: pnn.init_linear(next(keys), hidden, hidden, dtype)
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm2": pnn.init_norm(hidden, dtype),
            "mlp": {"fc1": pnn.init_linear(next(keys), hidden, intermediate, dtype),
                    "fc2": pnn.init_linear(next(keys), intermediate, hidden, dtype)},
        }
    vm = {
        "embeddings": {
            "class_embedding": jax.random.normal(next(keys), (hidden,), dtype) * 0.02,
            "patch_embedding": {"kernel": jax.random.normal(
                next(keys), (patch, patch, 3, hidden), dtype) * 0.02},
            "position_embedding": {"embedding": jax.random.normal(
                next(keys), (grid * grid + 1, hidden), dtype) * 0.01},
        },
        "pre_layrnorm": pnn.init_norm(hidden, dtype),
        "encoder": {"layers": lyrs},
        "post_layernorm": pnn.init_norm(hidden, dtype),
    }
    return {"vision_model": vm,
            "visual_projection": {"kernel": jax.random.normal(
                next(keys), (hidden, projection_dim), dtype) * 0.02}}


@registry.register("clip_image_context_encoder")
class CLIPImageContextEncoder:
    """CLIP image tokens, post-LN + visual projection, cls-pooled norm scaling;
    optional mask weighting (reference clip.py:150-257).

    Fully self-contained: the tower forward is ``hf_clip_vision_forward``
    over a converted param tree (io/convert.clip_text_sd_to_params handles
    vision keys too), so no HF checkout or network is needed — the same
    treatment the text side got in round 2. The reference implements masking
    by monkey-patching the torch embedding forward (clip.py:206-227); here
    the same math is two pure multiplies (embedding-level and output-level,
    both applied, as in the reference)."""

    position_agnostic = False

    def __init__(self, version="openai/clip-vit-large-patch14", heads=16,
                 act="quick_gelu", image_size=224, policy=None, **kw):
        self.version = version
        self.heads = heads
        self.act = act
        self.image_size = image_size

    def init(self, key):
        return init_clip_vision(key)

    def _preprocess(self, images):
        """(B, H, W, 3) [0,1] -> CLIP-normalized (B, 224, 224, 3)."""
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        n = self.image_size
        x = jax.image.resize(jnp.asarray(images, jnp.float32),
                             (images.shape[0], n, n, 3), "bicubic")
        return (x - mean) / std

    def _encode_pixels(self, params, pixels, vtoken_mask=None):
        z = hf_clip_vision_forward(params["vision_model"], pixels,
                                   heads=self.heads, act=self.act,
                                   vtoken_mask=vtoken_mask,
                                   position_agnostic=self.position_agnostic
                                   and vtoken_mask is None)
        from pfd_tpu.ops import nn as pnn

        # reference applies post_layernorm to ALL tokens (clip.py:180)
        z = pnn.layer_norm(z, params["vision_model"]["post_layernorm"])
        z = z @ params["visual_projection"]["kernel"]
        z_pooled = z[:, 0:1]
        z = z / jnp.linalg.norm(z_pooled, axis=-1, keepdims=True)
        if vtoken_mask is not None:
            z = z * vtoken_mask
        return z

    def encode(self, params, images, masks=None):
        images = np.asarray(images)
        if masks is None:
            return self._encode_pixels(params, self._preprocess(images))
        # mask weighting (clip.py:187-230): mask the pixels, weight the
        # embeddings AND the output tokens by the per-token mask average
        masks = jnp.clip(jnp.asarray(masks, jnp.float32), 0, 1)  # (B,H,W,1)
        if bool(jnp.all(masks == 1.0)):
            return self._encode_pixels(params, self._preprocess(images))
        pixels = self._preprocess(images * np.asarray(masks))
        n = self.image_size
        m224 = jax.image.resize(masks, (masks.shape[0], n, n, 1), "bilinear")
        patch = params["vision_model"]["embeddings"]["patch_embedding"]["kernel"]
        ph, pw = patch.shape[0], patch.shape[1]
        pooled = jax.lax.reduce_window(m224[..., 0], 0.0, jax.lax.add,
                                       (1, ph, pw), (1, ph, pw), "VALID")
        vtoken = pooled.reshape(masks.shape[0], -1, 1) / (ph * pw)
        gscale = m224.mean(axis=(1, 2, 3)).reshape(-1, 1, 1)
        vtoken_mask = jnp.concatenate([gscale, vtoken], axis=1)
        return self._encode_pixels(params, pixels, vtoken_mask)


def hf_clip_text_forward(params, input_ids=None, inputs_embeds=None,
                         act="quick_gelu", heads=12):
    """HF CLIP text tower forward from a FlaxCLIPTextModel param tree —
    needed where the embedding layer must be customized (the reference
    monkey-patches embeddings.forward, clip.py:717-733; here the tower is a
    plain function so injection is just building inputs_embeds)."""
    from pfd_tpu.ops import nn as pnn

    tm = params["text_model"]
    if inputs_embeds is None:
        inputs_embeds = tm["embeddings"]["token_embedding"]["embedding"][input_ids]
    n_ctx = inputs_embeds.shape[1]
    pos = tm["embeddings"]["position_embedding"]["embedding"][:n_ctx]
    x = inputs_embeds + pos
    causal = jnp.triu(jnp.full((n_ctx, n_ctx), -jnp.inf), k=1)[None, None]

    def mha(p, h):
        q = pnn.split_heads(pnn.linear(h, p["q_proj"]), heads)
        k = pnn.split_heads(pnn.linear(h, p["k_proj"]), heads)
        v = pnn.split_heads(pnn.linear(h, p["v_proj"]), heads)
        scale = (q.shape[-1]) ** -0.5
        from pfd_tpu.ops.nn import dot_product_attention, merge_heads

        o = dot_product_attention(q, k, v, scale=scale, bias=causal)
        return pnn.linear(merge_heads(o), p["out_proj"])

    nlayers = len(tm["encoder"]["layers"])
    for i in range(nlayers):
        p = tm["encoder"]["layers"][str(i)]
        h = pnn.layer_norm(x, p["layer_norm1"])
        x = x + mha(p["self_attn"], h)
        h = pnn.layer_norm(x, p["layer_norm2"])
        h = pnn.linear(h, p["mlp"]["fc1"])
        h = (h * jax.nn.sigmoid(1.702 * h)) if act == "quick_gelu" \
            else jax.nn.gelu(h, approximate=False)
        x = x + pnn.linear(h, p["mlp"]["fc2"])
    return pnn.layer_norm(x, tm["final_layer_norm"])


@registry.register("clip_text_sdv1_customized_embedding")
class CLIPTextSD1CE:
    """SD-v1 CLIP text encoder with customized embeddings: a `<new_token>`
    marker in the prompt expands into a run of learned token embeddings
    injected at the embedding layer (reference clip.py:665-788;
    'token_embedding' mode — the only one the reference implements)."""

    special_token = "<new_token>"

    def __init__(self, replace_info="token_embedding|4",
                 version="openai/clip-vit-large-patch14", max_length=77,
                 policy=None, **kw):
        rtype, rpara = replace_info.split("|")
        assert rtype == "token_embedding", \
            "only token_embedding replacement is implemented (as in the reference)"
        self.ce_num = int(rpara)
        self.version = version
        self.max_length = max_length
        self._tok = self._model = None

    def _load(self):
        if self._model is None:
            self._tok, self._model = _lazy_flax_clip(self.version, "text_only")

    def init(self, key, ce_dim=768):
        self._load()
        params = dict(self._model.params)
        params["cembedding"] = {"weight": jax.random.normal(
            key, (self.ce_num, ce_dim)) * 0.02}
        return params

    def tokenize(self, text):
        """Expand the marker into ce_num placeholder slots (clip.py:747-788)."""
        self._load()
        if isinstance(text, str):
            text = [text]
        bos = "<|startoftext|>"
        text = [t.replace(self.special_token, bos) for t in text]
        enc = self._tok(text, truncation=True, max_length=self.max_length,
                        padding="max_length", return_tensors="np")["input_ids"]
        bosid, eosid = enc[0, 0], enc[0, -1]
        out, mask = [], []
        for row in enc:
            new, m = [], []
            for ii, t in enumerate(row):
                if t == bosid and ii != 0:
                    new.extend(range(self.ce_num))
                    m.extend([1] * self.ce_num)
                else:
                    new.append(int(t))
                    m.append(0)
            new, m = new[:self.max_length], m[:self.max_length]
            new[-1] = int(eosid)
            out.append(new)
            mask.append(m)
        return np.asarray(out, np.int32), np.asarray(mask, np.int32)

    def encode(self, params, text):
        tokens, mask = self.tokenize(text)
        tokens_j = jnp.asarray(tokens)
        m = jnp.asarray(mask)
        tok_table = params["text_model"]["embeddings"]["token_embedding"]["embedding"]
        base = tok_table[tokens_j] * (1 - m[:, :, None])
        custom = params["cembedding"]["weight"][tokens_j * m] * m[:, :, None]
        return hf_clip_text_forward(params, inputs_embeds=base + custom)


# ---------------------------------------------------------------------------
# OpenCLIP text encoders (SD-2.x conditioning path)
# ---------------------------------------------------------------------------

def _openclip_text_transformer(params, tokens, *, heads, layers_to_run):
    """OpenCLIP text tower forward (reference clip.py:327-346): causal-masked
    pre-norm transformer over BPE tokens. Params mirror open_clip state-dict
    names so released checkpoints convert mechanically."""
    from pfd_tpu.ops import nn as pnn

    tok_emb = params["token_embedding"]["weight"]
    x = tok_emb[tokens] + params["positional_embedding"]
    n_ctx = x.shape[1]
    causal = jnp.triu(jnp.full((n_ctx, n_ctx), -jnp.inf), k=1)[None, None]

    for i in range(layers_to_run):
        p = params["transformer"]["resblocks"][str(i)]
        h = pnn.layer_norm(x, p["ln_1"])
        h = pnn.torch_mha(h, h, p["attn"], heads, bias=causal)
        x = x + h
        h = pnn.layer_norm(x, p["ln_2"])
        h = pnn.linear(h, p["mlp"]["c_fc"])
        h = h * jax.nn.sigmoid(1.702 * h)  # open_clip QuickGELU
        x = x + pnn.linear(h, p["mlp"]["c_proj"])
    return x


def _openclip_tokenize(texts, max_length=77):
    """BPE-tokenize with the CLIP vocab (open_clip.tokenize equivalent via the
    HF CLIPTokenizer — same BPE merges; needs a local tokenizer checkout)."""
    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained("openai/clip-vit-large-patch14")
    enc = tok(list(texts), truncation=True, max_length=max_length,
              padding="max_length", return_tensors="np")
    return enc["input_ids"]


@registry.register("openclip_text_context_encoder_sdv2")
class OpenCLIPTextEncoderSDv2:
    """SD-2.x text conditioning: ln_final of the last/penultimate layer
    (reference clip.py:288-348)."""

    def __init__(self, arch="ViT-H-14", version=None, max_length=77,
                 layer="last", num_layers=24, width=1024, heads=16,
                 policy=None, **kw):
        assert layer in ("last", "penultimate")
        self.max_length = max_length
        self.num_layers = num_layers
        self.width = width
        self.heads = heads
        self.layer_idx = 0 if layer == "last" else 1

    def encode(self, params, text_or_tokens):
        tokens = (_openclip_tokenize(text_or_tokens, self.max_length)
                  if isinstance(text_or_tokens[0], str) else
                  np.asarray(text_or_tokens))
        x = _openclip_text_transformer(
            params, jnp.asarray(tokens), heads=self.heads,
            layers_to_run=self.num_layers - self.layer_idx)
        from pfd_tpu.ops import nn as pnn

        return pnn.layer_norm(x, params["ln_final"])


@registry.register("openclip_text_context_encoder")
class OpenCLIPTextEncoder(OpenCLIPTextEncoderSDv2):
    """Projected + eot-pooled-norm-scaled variant (reference clip.py:350-398)."""

    def encode(self, params, text_or_tokens):
        tokens = (_openclip_tokenize(text_or_tokens, self.max_length)
                  if isinstance(text_or_tokens[0], str) else
                  np.asarray(text_or_tokens))
        tokens = np.asarray(tokens)
        x = _openclip_text_transformer(params, jnp.asarray(tokens),
                                       heads=self.heads,
                                       layers_to_run=self.num_layers)
        from pfd_tpu.ops import nn as pnn

        x = pnn.layer_norm(x, params["ln_final"])
        proj = params["text_projection"]
        eot = tokens.argmax(axis=-1)
        x_pool = x[jnp.arange(x.shape[0]), eot] @ proj
        x = x @ proj
        return x / jnp.linalg.norm(x_pool, axis=1, keepdims=True)[:, None, :]


def _split_custom_tokens(all_tokens, num_regular, texpand=1):
    """Split mixed token ids into (regular, custom, mask) triples, expanding
    each custom id into `texpand` consecutive slots (clip.py:511-519, 642-660)."""
    regular, custom, mask = [], [], []
    for tokens in all_tokens:
        r, c, m = [], [], []
        for ti in tokens:
            if ti < num_regular:
                r.append(ti); c.append(0); m.append(0)
            else:
                for ii in range(texpand):
                    r.append(0)
                    c.append((ti - num_regular) * texpand + ii)
                    m.append(1)
        regular.append(r); custom.append(c); mask.append(m)
    return regular, custom, mask


def _pad_rows(rows, length, pad=0, eot=None):
    out = np.full((len(rows), length), pad, np.int32)
    for i, r in enumerate(rows):
        r = list(r)[:length]
        if eot is not None and len(r) == length:
            r[-1] = eot
        out[i, :len(r)] = r
    return out


class _CustomizedTokenizerMixin:
    """Shared tokenize for the customized-token variants: HF CLIPTokenizer
    with added special tokens stands in for open_clip.SimpleTokenizer
    (same BPE; added ids start at the regular vocab size)."""

    def _tokenizer(self):
        if getattr(self, "_tok", None) is None:
            from transformers import CLIPTokenizer

            self._tok = CLIPTokenizer.from_pretrained(
                getattr(self, "tokenizer_version",
                        "openai/clip-vit-large-patch14"))
            self.num_regular_tokens = len(self._tok)
            self._tok.add_tokens(list(self.customized_tokens))
        return self._tok

    def tokenize(self, texts, texpand=1):
        if isinstance(texts, str):
            texts = [texts]
        tok = self._tokenizer()
        all_tokens = [tok(t)["input_ids"] for t in texts]
        r, c, m = _split_custom_tokens(all_tokens, self.num_regular_tokens,
                                       texpand)
        eot = tok.eos_token_id
        return (_pad_rows(r, self.max_length, eot=eot),
                _pad_rows(c, self.max_length),
                _pad_rows(m, self.max_length))


@registry.register("openclip_text_context_encoder_sdv2_customized_tokenizer_v1")
class OpenCLIPCustomTokenizerV1(OpenCLIPTextEncoderSDv2, _CustomizedTokenizerMixin):
    """Custom tokens replace the transformer OUTPUT at their positions with
    learned embeddings (clip.py:494-543)."""

    def __init__(self, customized_tokens, *args, **kw):
        super().__init__(*args, **kw)
        self.customized_tokens = ([customized_tokens]
                                  if isinstance(customized_tokens, str)
                                  else list(customized_tokens))

    def init_custom(self, key, embedding_dim):
        return {"customized_token_embedding": {"weight": jax.random.normal(
            key, (len(self.customized_tokens), embedding_dim)) * 0.02}}

    def encode(self, params, text):
        reg, cus, mask = self.tokenize(text)
        z0 = super().encode(params, reg)
        z1 = params["customized_token_embedding"]["weight"][jnp.asarray(cus)]
        m = jnp.asarray(mask, z0.dtype)[:, :, None]
        return z0 * (1 - m) + z1 * m


@registry.register("openclip_text_context_encoder_sdv2_customized_tokenizer_v2")
class OpenCLIPCustomTokenizerV2(OpenCLIPTextEncoderSDv2, _CustomizedTokenizerMixin):
    """Custom tokens inject learned embeddings at the transformer INPUT
    (clip.py:544-601)."""

    texpand = 1

    def __init__(self, customized_tokens, *args, **kw):
        super().__init__(*args, **kw)
        self.customized_tokens = ([customized_tokens]
                                  if isinstance(customized_tokens, str)
                                  else list(customized_tokens))

    def init_custom(self, key, embedding_dim):
        n = len(self.customized_tokens) * self.texpand
        return {"customized_token_embedding": {"weight": jax.random.normal(
            key, (n, embedding_dim)) * 0.02}}

    def encode(self, params, text):
        from pfd_tpu.ops import nn as pnn

        reg, cus, mask = self.tokenize(text, self.texpand)
        tok_emb = params["token_embedding"]["weight"]
        x0 = tok_emb[jnp.asarray(reg)]
        x1 = params["customized_token_embedding"]["weight"][jnp.asarray(cus)]
        m = jnp.asarray(mask, x0.dtype)[:, :, None]
        x = x0 * (1 - m) + x1 * m
        x = x + params["positional_embedding"][:x.shape[1]]
        n_ctx = x.shape[1]
        causal = jnp.triu(jnp.full((n_ctx, n_ctx), -jnp.inf), k=1)[None, None]
        for i in range(self.num_layers - self.layer_idx):
            p = params["transformer"]["resblocks"][str(i)]
            h = pnn.layer_norm(x, p["ln_1"])
            h = pnn.torch_mha(h, h, p["attn"], self.heads, bias=causal)
            x = x + h
            h = pnn.layer_norm(x, p["ln_2"])
            h = pnn.linear(h, p["mlp"]["c_fc"])
            h = h * jax.nn.sigmoid(1.702 * h)
            x = x + pnn.linear(h, p["mlp"]["c_proj"])
        return pnn.layer_norm(x, params["ln_final"])


@registry.register("openclip_text_context_encoder_sdv2_customized_tokenizer_v3")
class OpenCLIPCustomTokenizerV3(OpenCLIPCustomTokenizerV2):
    """V2 with each custom token expanded to `texpand` learned slots and
    optional LoRA on the tower (clip.py:609-660; the reference's LoRA import
    is a missing module there — pfd_tpu.training.lora is the working one)."""

    def __init__(self, customized_tokens, texpand=4, lora_rank=None,
                 lora_bias_trainable=True, *args, **kw):
        super().__init__(customized_tokens, *args, **kw)
        self.texpand = texpand
        self.lora_rank = lora_rank

    def init_lora(self, key, params):
        from pfd_tpu.training import lora

        assert self.lora_rank is not None
        match = lambda names: ("resblocks" in names
                               and names[-2] in ("out_proj", "c_fc", "c_proj",
                                                 "in_proj"))
        return lora.init_for_kernels(key, params, match, self.lora_rank)

    def encode(self, params, text, adapters=None):
        if adapters is not None:
            from pfd_tpu.training import lora

            params = lora.merge(params, adapters)
        return super().encode(params, text)


@registry.register("openclip_image_context_encoder")
class OpenCLIPImageEmbedder:
    """OpenCLIP visual tower (reference clip.py:400-492,
    FrozenOpenCLIPImageEmbedder over ViT-H/14): conv1 patches + class token +
    positional embedding, ln_pre, pre-norm transformer, ln_post over ALL
    tokens, optional projection, then normalization by the cls-token norm.
    Self-contained functional forward (open_clip is absent here AND for the
    reference — behavior-level tests, like the OpenCLIP text encoders).

    Reference quirk preserved: `_encode_wmask` pools the INVERTED mask
    (conv2d(1 - masks), clip.py:478) into the token weighting and zeroes the
    cls token — replicated as-is (dead in the live config; ledgered in
    docs/PARITY.md)."""

    def __init__(self, arch="ViT-H-14", version=None, width=1280, layers=32,
                 heads=16, patch=14, image_size=224, embed_dim=1024,
                 act="gelu", policy=None, **kw):
        self.width = width
        self.layers = layers
        self.heads = heads
        self.patch = patch
        self.image_size = image_size
        self.embed_dim = embed_dim
        self.act = act  # laion ViT-H-14 uses exact GELU (not QuickGELU)

    def init(self, key):
        return init_openclip_visual(
            key, width=self.width, layers=self.layers, patch=self.patch,
            image_size=self.image_size, embed_dim=self.embed_dim)

    def _preprocess(self, images):
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        n = self.image_size
        x = jax.image.resize(jnp.asarray(images, jnp.float32),
                             (images.shape[0], n, n, 3), "bicubic")
        return (x - mean) / std

    def _tower(self, params, pixels):
        from pfd_tpu.ops import nn as pnn

        x = pnn.conv2d(pixels, {"kernel": params["conv1"]["kernel"]},
                       stride=self.patch, padding=0)
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
        cls = jnp.broadcast_to(params["class_embedding"].reshape(1, 1, c),
                               (b, 1, c))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["positional_embedding"][:x.shape[1]]
        x = pnn.layer_norm(x, params["ln_pre"])
        for i in range(self.layers):
            p = params["transformer"]["resblocks"][str(i)]
            h = pnn.layer_norm(x, p["ln_1"])
            x = x + pnn.torch_mha(h, h, p["attn"], self.heads)
            h = pnn.layer_norm(x, p["ln_2"])
            h = pnn.linear(h, p["mlp"]["c_fc"])
            h = (h * jax.nn.sigmoid(1.702 * h)) if self.act == "quick_gelu" \
                else jax.nn.gelu(h, approximate=False)
            x = x + pnn.linear(h, p["mlp"]["c_proj"])
        x = pnn.layer_norm(x, params["ln_post"])
        if params.get("proj") is not None:
            x = x @ params["proj"]
        x_pool = x[:, 0, :]
        return x / jnp.linalg.norm(x_pool, axis=1, keepdims=True)[:, None, :]

    def _encode(self, params, images):
        return self._tower(params, self._preprocess(np.asarray(images)))

    def _encode_wmask(self, params, images, masks):
        z = self._encode(params, images)
        masks = jnp.clip(jnp.asarray(masks, jnp.float32), 0, 1)  # (B,H,W,1)
        n = self.image_size
        m = jax.image.resize(masks, (masks.shape[0], n, n, 1), "bilinear")
        ph = pw = self.patch
        # reference clip.py:478 pools the INVERTED mask — kept verbatim
        pooled = jax.lax.reduce_window((1.0 - m)[..., 0], 0.0, jax.lax.add,
                                       (1, ph, pw), (1, ph, pw), "VALID")
        vtoken = pooled.reshape(masks.shape[0], -1, 1) / (ph * pw)
        z = z.at[:, 1:, :].multiply(vtoken.astype(z.dtype))
        return z.at[:, 0, :].set(0.0)

    def encode(self, params, images, masks=None):
        if masks is None:
            return self._encode(params, images)
        return self._encode_wmask(params, images, masks)


def init_openclip_visual(key, *, width=1280, layers=32, patch=14,
                         image_size=224, embed_dim=1024, dtype=jnp.float32):
    """Random-init OpenCLIP visual tower (open_clip state-dict names)."""
    from pfd_tpu.ops import nn as pnn

    keys = iter(jax.random.split(key, 4 * layers + 8))
    grid = image_size // patch
    blocks = {}
    for i in range(layers):
        blocks[str(i)] = {
            "ln_1": pnn.init_norm(width, dtype),
            "attn": {"in_proj": {"kernel": pnn.init_linear(
                         next(keys), width, 3 * width, dtype)["kernel"],
                     "bias": jnp.zeros((3 * width,), dtype)},
                     "out_proj": pnn.init_linear(next(keys), width, width, dtype)},
            "ln_2": pnn.init_norm(width, dtype),
            "mlp": {"c_fc": pnn.init_linear(next(keys), width, 4 * width, dtype),
                    "c_proj": pnn.init_linear(next(keys), 4 * width, width, dtype)},
        }
    return {
        "conv1": {"kernel": jax.random.normal(
            next(keys), (patch, patch, 3, width), dtype) * 0.02},
        "class_embedding": jax.random.normal(next(keys), (width,), dtype) * 0.02,
        "positional_embedding": jax.random.normal(
            next(keys), (grid * grid + 1, width), dtype) * 0.01,
        "ln_pre": pnn.init_norm(width, dtype),
        "transformer": {"resblocks": blocks},
        "ln_post": pnn.init_norm(width, dtype),
        "proj": jax.random.normal(next(keys), (width, embed_dim), dtype) * 0.02,
    }


def init_openclip_text(key, num_layers=24, width=1024, heads=16, vocab=49408,
                       n_ctx=77, embed_dim=1024, dtype=jnp.float32):
    """Random-init OpenCLIP text tower (tests; production loads checkpoints)."""
    from pfd_tpu.ops import nn as pnn

    keys = iter(jax.random.split(key, 4 * num_layers + 8))
    blocks = {}
    for i in range(num_layers):
        blocks[str(i)] = {
            "ln_1": pnn.init_norm(width, dtype),
            "attn": {"in_proj": {"kernel": pnn.init_linear(next(keys), width, 3 * width, dtype)["kernel"],
                                 "bias": jnp.zeros((3 * width,), dtype)},
                     "out_proj": pnn.init_linear(next(keys), width, width, dtype)},
            "ln_2": pnn.init_norm(width, dtype),
            "mlp": {"c_fc": pnn.init_linear(next(keys), width, 4 * width, dtype),
                    "c_proj": pnn.init_linear(next(keys), 4 * width, width, dtype)},
        }
    return {
        "token_embedding": {"weight": jax.random.normal(next(keys), (vocab, width), dtype) * 0.02},
        "positional_embedding": jax.random.normal(next(keys), (n_ctx, width), dtype) * 0.01,
        "transformer": {"resblocks": blocks},
        "ln_final": pnn.init_norm(width, dtype),
        "text_projection": jax.random.normal(next(keys), (width, embed_dim), dtype) * 0.02,
    }


@registry.register("clip_image_context_encoder_position_agnostic")
class CLIPImageContextEncoderPA(CLIPImageContextEncoder):
    """Position-agnostic variant: grid position embeddings replaced by their
    mean at encode time (reference clip.py:259-286, a permanent monkey-patch
    there; a forward-time flag here). Reference quirk preserved: its masked
    path temporarily re-patches the embedding forward with the NON-PA masked
    version (clip.py:222-227 overrides the PA patch), so masks disable PA."""

    position_agnostic = True
