"""Full-size 50-step end-to-end trajectory parity — the actual operating point.

Upgrades the reduced-size rehearsal in test_e2e_parity.py to the app's real
serving configuration (reference app.py:133: ddim_steps=50, 512x512 output):
SD-1.5 UNet (320ch full block plan), Swin-Large SeeCoder, f=8 AutoKL VAE,
shared random weights, injected start noise, CFG scale 2.0, eta 0 — SSIM-gated
at DDIM-50 against the reference's own torch modules run on CPU fp32.

Very slow (~100 full-size CFG UNet forwards per side on CPU); slow-marked.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu import config, registry
from pfd_tpu.diffusion.ddim import DDIMSampler
from pfd_tpu.io.convert import torch_sd_to_pytree
from pfd_tpu.training.evaluator import ssim
from tests import ref_utils


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
def test_e2e_fullsize_ddim50_ssim():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.pfd import PromptFreeDiffusion as RefPFD
    from lib.model_zoo.ddim import DDIMSampler as RefDDIM

    # reference quirk fixes needed to run its own code on CPU (PARITY.md #6, #7)
    RefDDIM.register_buffer = lambda self, name, attr: setattr(self, name, attr)
    if not hasattr(torch.Tensor, "astype"):
        torch.Tensor.astype = lambda self, d: self.to(d)

    cfg = config.model_cfg("pfd_seecoder")["args"]
    vae_cfg = cfg["vae_cfg_list"][0][1]
    vae_cfg["args"].setdefault("lossconfig", None)
    ctx_cfg = cfg["ctx_cfg_list"][0][1]
    unet_cfg = cfg["diffuser_cfg_list"][0][1]
    # drop_path must be inert for parity; eval() handles torch, mirror in cfg
    ctx_cfg["args"]["imencoder_cfg"]["args"]["drop_path_rate"] = 0.0

    ref_utils.seed_all(0)
    ref_net = RefPFD(
        vae_cfg_list=[["image", AttrDict(vae_cfg)]],
        ctx_cfg_list=[["image", AttrDict(ctx_cfg)]],
        diffuser_cfg_list=[["image", AttrDict(unet_cfg)]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012,
        timesteps=1000, use_ema=False).eval()
    ref_utils.randomize_params(ref_net, scale=0.04, seed=42)
    ref_net.device = "cpu"

    model = registry.get("pfd")(
        vae_cfg_list=[["image", vae_cfg]],
        ctx_cfg_list=[["image", ctx_cfg]],
        diffuser_cfg_list=[["image", unet_cfg]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref_net))

    rng = np.random.default_rng(5)
    ref_img = rng.random((1, 512, 512, 3), dtype=np.float32)
    x_start = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)

    # ---- torch reference path (app.py:212-275 semantics, DDIM-50)
    with torch.no_grad():
        c_ref = ref_net.ctx_encode(
            torch.from_numpy(ref_img.transpose(0, 3, 1, 2)), which="image")
        u_ref = torch.zeros_like(c_ref)
        x_ref, _ = RefDDIM(ref_net).sample(
            steps=50, shape=(1, 4, 64, 64),
            x_info={"type": "image", "xt": torch.from_numpy(x_start)},
            c_info={"type": "image", "conditioning": c_ref,
                    "unconditional_conditioning": u_ref,
                    "unconditional_guidance_scale": 2.0},
            eta=0.0, verbose=False)
        img_ref = ref_net.vae_decode(x_ref, which="image")
    img_ref = ref_utils.t2n(img_ref).transpose(0, 2, 3, 1)

    # Cache the expensive torch-side outputs (hours on one CPU core) so the
    # TPU serving-config gates (tools/e2e_gate.py) can compare bf16 / int8 /
    # encoder-propagation variants directly against torch-fp32 without
    # re-running the reference. The weights themselves are regenerated
    # deterministically (seed_all(0) + randomize_params(seed=42)).
    cache_dir = os.environ.get("PFD_REF_CACHE")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(os.path.join(cache_dir, "e2e_fullsize_ref.npz"),
                 img_ref=img_ref, x_ref=ref_utils.t2n(x_ref),
                 c_ref=ref_utils.t2n(c_ref))

    # ---- pfd_tpu path, identical weights/noise
    c = model.ctx_encode(params, jnp.asarray(ref_img), "image")
    np.testing.assert_allclose(np.asarray(c), ref_utils.t2n(c_ref),
                               rtol=2e-2, atol=2e-3)
    x, _ = DDIMSampler(model).sample(
        params, jax.random.PRNGKey(0), (1, 4, 64, 64),
        x_info={"xt": jnp.asarray(x_start.transpose(0, 2, 3, 1))},
        c_info={"conditioning": c,
                "unconditional_conditioning": jnp.zeros_like(c),
                "unconditional_guidance_scale": 2.0},
        steps=50, eta=0.0)
    lat_ref = ref_utils.t2n(x_ref).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(x), lat_ref, rtol=5e-2, atol=5e-3)
    img = np.asarray(model.vae_decode(params, x, "image"))

    s = ssim(img[0], img_ref[0], data_range=1.0)
    print(f"full-size DDIM-50 e2e SSIM: {s:.5f}")
    assert s >= 0.95, f"e2e SSIM {s:.4f} below the 0.95 gate"
