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
