"""End-to-end parity: full pfd pipeline vs the reference composite model.

The BASELINE gate rehearsal (SSIM >= 0.95 vs reference outputs): identical
converted weights, identical injected start noise, eta=0, full path
reference image -> SeeCoder -> CFG DDIM -> VAE decode. Uses reduced-size
models (full-depth structure, narrower widths) so the torch side runs on CPU
in minutes; the full-size SSIM gate runs with released checkpoints.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu import registry
from pfd_tpu.diffusion.ddim import DDIMSampler
from pfd_tpu.io.convert import torch_sd_to_pytree
from pfd_tpu.training.evaluator import ssim
from tests import ref_utils

UNET = {"type": "openai_unet_2d_next",
        "args": dict(in_channels=4, out_channels=4, model_channels=32,
                     attention_resolutions=[1, 2], num_res_blocks=[1, 1],
                     channel_mult=[1, 2], num_heads=4, context_dim=128)}
VAE = {"type": "autoencoderkl",
       "args": {"embed_dim": 4, "lossconfig": None,
                "ddconfig": {"double_z": True, "z_channels": 4,
                             "resolution": 64, "in_channels": 3, "out_ch": 3,
                             "ch": 32, "ch_mult": [1, 2, 4], "num_res_blocks": 1,
                             "attn_resolutions": [], "dropout": 0.0}}}
SEECODER = {
    "type": "seecoder",
    "args": {
        "imencoder_cfg": {"type": "swin", "args": dict(
            embed_dim=24, depths=[1, 1, 2, 1], num_heads=[2, 2, 4, 4],
            window_size=4, ape=False, drop_path_rate=0.0, patch_norm=True)},
        "imdecoder_cfg": {"type": "seecoder_decoder", "args": dict(
            inchannels={"res3": 48, "res4": 96, "res5": 192},
            trans_input_tags=["res3", "res4", "res5"], trans_num_layers=2,
            trans_dim=128, trans_dropout=0.0, trans_nheads=4,
            trans_feedforward_dim=64)},
        "qtransformer_cfg": {"type": "seecoder_query_transformer", "args": dict(
            in_channels=128, hidden_dim=128, num_queries=[4, 12], nheads=4,
            num_layers=3, feedforward_dim=64, pre_norm=False,
            num_feature_levels=3, enforce_input_project=False,
            with_fea2d_pos=False)},
    },
}


class AttrDict(dict):
    """easydict-style recursive attr access for the reference get_model."""

    def __init__(self, d=()):
        super().__init__()
        for k, v in dict(d).items():
            self[k] = AttrDict(v) if isinstance(v, dict) else v

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        return self[k]


@pytest.mark.slow
def test_e2e_pipeline_ssim():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.pfd import PromptFreeDiffusion as RefPFD
    from lib.model_zoo.ddim import DDIMSampler as RefDDIM

    RefDDIM.register_buffer = lambda self, name, attr: setattr(self, name, attr)

    ref_utils.seed_all(0)
    ref_net = RefPFD(
        vae_cfg_list=[["image", AttrDict(VAE)]],
        ctx_cfg_list=[["image", AttrDict(SEECODER)]],
        diffuser_cfg_list=[["image", AttrDict(UNET)]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012,
        timesteps=1000, use_ema=False).eval()
    ref_utils.randomize_params(ref_net, scale=0.04, seed=42)
    ref_net.device = "cpu"

    model = registry.get("pfd")(
        vae_cfg_list=[["image", VAE]],
        ctx_cfg_list=[["image", SEECODER]],
        diffuser_cfg_list=[["image", UNET]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref_net))

    # shared inputs: reference image + injected start noise
    rng = np.random.default_rng(5)
    ref_img = rng.random((1, 64, 64, 3), dtype=np.float32)
    x_start = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)

    # ---- torch reference path (app.py:212-275 semantics)
    with torch.no_grad():
        c_ref = ref_net.ctx_encode(torch.from_numpy(ref_img.transpose(0, 3, 1, 2)),
                                   which="image")
        u_ref = torch.zeros_like(c_ref)
        sampler_ref = RefDDIM(ref_net)
        if not hasattr(torch.Tensor, "astype"):
            torch.Tensor.astype = lambda self, d: self.to(d)
        x_ref, _ = sampler_ref.sample(
            steps=5, shape=(1, 4, 16, 16),
            x_info={"type": "image", "xt": torch.from_numpy(x_start)},
            c_info={"type": "image", "conditioning": c_ref,
                    "unconditional_conditioning": u_ref,
                    "unconditional_guidance_scale": 2.0},
            eta=0.0, verbose=False)
        img_ref = ref_net.vae_decode(x_ref, which="image")
    img_ref = ref_utils.t2n(img_ref).transpose(0, 2, 3, 1)

    # ---- pfd_tpu path
    c = model.ctx_encode(params, jnp.asarray(ref_img), "image")
    np.testing.assert_allclose(np.asarray(c), ref_utils.t2n(c_ref),
                               rtol=2e-2, atol=2e-3)
    sampler = DDIMSampler(model)
    x, _ = sampler.sample(
        params, jax.random.PRNGKey(0), (1, 4, 16, 16),
        x_info={"xt": jnp.asarray(x_start.transpose(0, 2, 3, 1))},
        c_info={"conditioning": c, "unconditional_conditioning": jnp.zeros_like(c),
                "unconditional_guidance_scale": 2.0},
        steps=5, eta=0.0)
    img = np.asarray(model.vae_decode(params, x, "image"))

    s = ssim(img[0], img_ref[0], data_range=1.0)
    print(f"e2e SSIM: {s:.5f}")
    assert s >= 0.95, f"e2e SSIM {s:.4f} below the 0.95 gate"
    np.testing.assert_allclose(img, img_ref, rtol=0.1, atol=0.02)
