"""Weight-verified CLIP text parity (reference clip.py:23-55, 114-146).

The published HF checkpoints are not available here (no egress), so the
torch reference towers are instantiated from small configs with shared
RANDOM weights, converted via io/convert.clip_text_sd_to_params, and the
pfd_tpu encoders must reproduce their outputs tensor-for-tensor — the same
methodology as every other module's parity test.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from pfd_tpu import registry
from pfd_tpu.io.convert import clip_text_sd_to_params
from tests import ref_utils

transformers = pytest.importorskip("transformers")

VOCAB = 99
HIDDEN = 64
HEADS = 4
LAYERS = 2
SEQ = 16


def _text_config():
    return transformers.CLIPTextConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, intermediate_size=128,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        max_position_embeddings=77, hidden_act="quick_gelu",
        eos_token_id=VOCAB - 1, bos_token_id=0, pad_token_id=1,
        projection_dim=32)


def _tokens(rng, b=3):
    """Random ids with the eos (= max) token placed once per row, so torch's
    pooler (eos position) and our argmax pooling agree."""
    ids = rng.integers(2, VOCAB - 1, (b, SEQ))
    ids[:, -3] = VOCAB - 1
    return ids.astype(np.int64)


def test_clip_text_sdv1_last_hidden_parity():
    torch.manual_seed(0)
    ref = transformers.CLIPTextModel(_text_config()).eval()
    ref_utils.randomize_params(ref, seed=1)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = clip_text_sd_to_params(sd)

    enc = registry.get("clip_text_context_encoder_sdv1")(heads=HEADS)
    ids = _tokens(np.random.default_rng(0))
    with torch.no_grad():
        want = ref(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    got = np.asarray(enc.encode_tokens(params, ids))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clip_text_projected_parity():
    """The VD-next projected variant: z / ||proj(pooled)|| (clip.py:139-146)."""
    torch.manual_seed(0)
    cfg = transformers.CLIPConfig(
        text_config=_text_config().to_dict(),
        vision_config=transformers.CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, image_size=32, patch_size=16,
            projection_dim=32).to_dict(),
        projection_dim=32)
    ref = transformers.CLIPModel(cfg).eval()
    ref_utils.randomize_params(ref, seed=2)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if k.startswith("text_model.") or k.startswith("text_projection.")}
    params = clip_text_sd_to_params(sd)

    enc = registry.get("clip_text_context_encoder")(heads=HEADS)
    ids = _tokens(np.random.default_rng(1))
    with torch.no_grad():
        out = ref.text_model(input_ids=torch.from_numpy(ids))
        z = ref.text_projection(out.last_hidden_state)
        z_pooled = ref.text_projection(out.pooler_output)
        want = (z / torch.norm(z_pooled.unsqueeze(1), dim=-1, keepdim=True)).numpy()
    got = np.asarray(enc.encode_tokens(params, ids))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# CLIP image towers (reference clip.py:150-286) — same methodology: small
# torch configs, shared random weights, converted via the same walk.
# ---------------------------------------------------------------------------

VHID = 48
VHEADS = 4
VPATCH = 8
VIMG = 32  # 4x4 grid + cls = 17 tokens


def _vision_config():
    return transformers.CLIPVisionConfig(
        hidden_size=VHID, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=VHEADS, image_size=VIMG, patch_size=VPATCH,
        hidden_act="quick_gelu", projection_dim=40)


def _clip_config():
    return transformers.CLIPConfig(
        text_config=_text_config().to_dict(),
        vision_config=_vision_config().to_dict(), projection_dim=40)


def _pixels(rng, b=2):
    return rng.standard_normal((b, VIMG, VIMG, 3)).astype(np.float32)


def test_clip_vision_tower_parity():
    """hf_clip_vision_forward vs torch CLIPVisionModel.last_hidden_state
    (HF returns it WITHOUT post_layernorm — reference clip.py:179-180
    applies ln_post to all tokens itself, tested below)."""
    from pfd_tpu.models.clip import hf_clip_vision_forward

    torch.manual_seed(0)
    ref = transformers.CLIPVisionModel(_vision_config()).eval()
    ref_utils.randomize_params(ref, seed=3)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = clip_text_sd_to_params(sd)

    px = _pixels(np.random.default_rng(2))
    with torch.no_grad():
        want = ref(pixel_values=torch.from_numpy(
            px.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    got = np.asarray(hf_clip_vision_forward(
        params["vision_model"], jnp.asarray(px), heads=VHEADS))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _torch_image_encode(ref, pixels_nchw, vtoken_mask=None, pa=False):
    """The reference CLIPImageContextEncoder._encode /_encode_wmask math
    (clip.py:171-230) on a small torch CLIPModel, including the
    monkey-patched embedding forward for masked/PA variants."""
    import types

    vm = ref.vision_model
    if vtoken_mask is not None or pa:
        vt = None if vtoken_mask is None else torch.from_numpy(
            np.asarray(vtoken_mask, np.float32))

        def patched(self, pixel_values, **kw):
            patch_embeds = self.patch_embedding(pixel_values)
            patch_embeds = patch_embeds.flatten(2).transpose(1, 2)
            class_embeds = self.class_embedding.expand(
                pixel_values.shape[0], 1, -1)
            embeddings = torch.cat([class_embeds, patch_embeds], dim=1)
            pemb = self.position_embedding(self.position_ids)
            if pa:  # clip.py:269-274 (256 hardcoded there; grid-sized here)
                pemb = torch.cat([
                    pemb[:, 0:1],
                    pemb[:, 1:].mean(dim=1, keepdim=True).repeat(
                        1, pemb.shape[1] - 1, 1)], dim=1)
            embeddings = embeddings + pemb
            if vt is not None:  # clip.py:215-216
                embeddings = embeddings * vt.to(embeddings.dtype)
            return embeddings

        old = vm.embeddings.forward
        vm.embeddings.forward = types.MethodType(patched, vm.embeddings)
    try:
        with torch.no_grad():
            out = vm(pixel_values=pixels_nchw)
            z = out.last_hidden_state
            z = vm.post_layernorm(z)
            z = ref.visual_projection(z)
            z_pooled = z[:, 0:1]
            z = z / torch.norm(z_pooled, dim=-1, keepdim=True)
            if vtoken_mask is not None:
                z = z * torch.from_numpy(
                    np.asarray(vtoken_mask, np.float32)).to(z.dtype)
    finally:
        if vtoken_mask is not None or pa:
            vm.embeddings.forward = old
    return z.numpy()


def _image_setup():
    torch.manual_seed(0)
    ref = transformers.CLIPModel(_clip_config()).eval()
    ref_utils.randomize_params(ref, seed=4)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()
          if k.startswith("vision_model.") or k.startswith("visual_projection.")}
    params = clip_text_sd_to_params(sd)
    from pfd_tpu import registry as reg
    enc = reg.get("clip_image_context_encoder")(heads=VHEADS, image_size=VIMG)
    return ref, params, enc


def test_clip_image_encoder_parity():
    ref, params, enc = _image_setup()
    px = _pixels(np.random.default_rng(3))
    want = _torch_image_encode(ref, torch.from_numpy(px.transpose(0, 3, 1, 2)))
    got = np.asarray(enc._encode_pixels(params, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clip_image_encoder_masked_parity():
    """Masked-token weighting: embedding-level AND output-level multiplies
    (clip.py:187-230), with the per-token mask average + global scale."""
    ref, params, enc = _image_setup()
    rng = np.random.default_rng(4)
    px = _pixels(rng)
    masks = (rng.random((2, VIMG, VIMG, 1)) > 0.4).astype(np.float32)

    # torch side: reference _encode_wmask recipe
    mt = torch.from_numpy(masks.transpose(0, 3, 1, 2))
    gscale = mt.mean(axis=[1, 2, 3], keepdim=True).flatten(2)
    kern = torch.ones(1, 1, VPATCH, VPATCH)
    vtok = torch.nn.functional.conv2d(mt, kern, stride=VPATCH)
    vtok = vtok.flatten(2).transpose(1, 2) / (VPATCH * VPATCH)
    vtoken_mask = torch.cat([gscale, vtok], axis=1).numpy()
    # enc.encode CLIP-normalizes internally; mirror it on the torch side
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    masked_px = (px * masks - mean) / std
    want = _torch_image_encode(
        ref, torch.from_numpy(masked_px.transpose(0, 3, 1, 2)), vtoken_mask)

    got = np.asarray(enc.encode(params, px, masks=masks))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # all-ones mask short-circuits to the plain path (clip.py:195-196)
    ones = np.ones_like(masks)
    plain = np.asarray(enc.encode(params, px))
    np.testing.assert_allclose(np.asarray(enc.encode(params, px, masks=ones)),
                               plain, rtol=1e-5, atol=1e-5)


def test_clip_image_encoder_pa_parity():
    """Position-agnostic variant (clip.py:259-286; the reference hardcodes
    repeat(1, 256, 1) for its 224/14 grid — grid-sized here)."""
    ref, params, _ = _image_setup()
    from pfd_tpu import registry as reg
    enc = reg.get("clip_image_context_encoder_position_agnostic")(
        heads=VHEADS, image_size=VIMG)
    px = _pixels(np.random.default_rng(5))
    want = _torch_image_encode(ref, torch.from_numpy(px.transpose(0, 3, 1, 2)),
                               pa=True)
    got = np.asarray(enc._encode_pixels(params, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
