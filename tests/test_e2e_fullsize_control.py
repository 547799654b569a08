"""Full-size 50-step ControlNet end-to-end trajectory parity.

Extends tests/test_e2e_fullsize.py to BASELINE config #3 (ControlNet branch
on): SD-1.5 UNet + Swin-Large SeeCoder + full-width ControlNet
(320ch, reference configs/model/controlnet.yaml), shared random weights,
injected start noise and hint image, CFG 2.0, DDIM-50 @512^2 — SSIM-gated
against the reference's own torch modules (pfd.py:457-528 pop-order
semantics through lib/model_zoo/ddim.py).

The hint is injected directly (a shared random [0,1] image), bypassing the
annotators: this pins the ControlNet *sampling* path, which is what the
control turbo gates (tools/e2e_gate.py control variants) need; annotator
parity is tested separately (tests/test_annotators.py).

Also caches the torch-side outputs (PFD_REF_CACHE) so the TPU serving-config
gates can score control turbo modes (cfg_interval / encoder propagation)
directly against torch-fp32 without re-running the reference (~2.5 h on one
CPU core).

Very slow; slow-marked.
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
from tests.test_e2e_fullsize import AttrDict


def build_reference_control_net():
    """Construct the full-size torch reference net WITH ControlNet, exactly
    reproducibly (seed_all(0) construction order + randomize_params(42)) so
    tools/e2e_gate.py can regenerate the same weights without this test."""
    ref_utils.load_reference()
    from lib.model_zoo.pfd import PromptFreeDiffusion as RefPFD
    from lib.model_zoo.pfd import PromptFreeDiffusion_with_control as RefPFDC
    from lib.model_zoo.controlnet import ControlNet as RefCN

    cfg = config.model_cfg("pfd_seecoder")["args"]
    vae_cfg = dict(cfg["vae_cfg_list"][0][1])
    vae_cfg["args"].setdefault("lossconfig", None)
    ctx_cfg = cfg["ctx_cfg_list"][0][1]
    unet_cfg = cfg["diffuser_cfg_list"][0][1]
    ctx_cfg["args"]["imencoder_cfg"]["args"]["drop_path_rate"] = 0.0
    ctl_args = config.model_cfg("controlnet")["args"]

    ref_utils.seed_all(0)
    ref_net = RefPFD(
        vae_cfg_list=[["image", AttrDict(vae_cfg)]],
        ctx_cfg_list=[["image", AttrDict(ctx_cfg)]],
        diffuser_cfg_list=[["image", AttrDict(unet_cfg)]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012,
        timesteps=1000, use_ema=False).eval()
    # attach a full-width ControlNet without going through the reference's
    # get_model (its registry needs a configs/ tree); class-swap to the
    # control subclass so apply_model takes the 13-residual walk
    ref_ctl = RefCN(
        image_size=None, in_channels=ctl_args["in_channels"],
        hint_channels=ctl_args["hint_channels"],
        model_channels=ctl_args["model_channels"],
        attention_resolutions=ctl_args["attention_resolutions"],
        num_res_blocks=ctl_args["num_res_blocks"],
        channel_mult=ctl_args["channel_mult"],
        num_heads=ctl_args["num_heads"], use_spatial_transformer=True,
        transformer_depth=1, context_dim=ctl_args["context_dim"],
        use_checkpoint=False, legacy=False).eval()
    ref_net.__class__ = RefPFDC
    ref_net.ctl = ref_ctl
    ref_net.control_scales = [1.0] * 13
    # one randomize over the WHOLE net (incl. ctl zero convs / hint conv —
    # fresh-init zero-init outputs make the comparison vacuous otherwise)
    ref_utils.randomize_params(ref_net, scale=0.04, seed=42)
    ref_net.device = "cpu"
    return (vae_cfg, ctx_cfg, unet_cfg, ctl_args), ref_net


@pytest.mark.slow
def test_e2e_fullsize_control_ddim50_ssim():
    import torch
    ref_utils.load_reference()  # must precede any `lib.` import
    from lib.model_zoo.ddim import DDIMSampler as RefDDIM

    # reference quirk fixes needed to run its own code on CPU (PARITY.md #6, #7)
    RefDDIM.register_buffer = lambda self, name, attr: setattr(self, name, attr)
    if not hasattr(torch.Tensor, "astype"):
        torch.Tensor.astype = lambda self, d: self.to(d)

    (vae_cfg, ctx_cfg, unet_cfg, ctl_args), ref_net = \
        build_reference_control_net()

    model = registry.get("pfd_with_control")(
        vae_cfg_list=[["image", vae_cfg]],
        ctx_cfg_list=[["image", ctx_cfg]],
        diffuser_cfg_list=[["image", unet_cfg]],
        ctl_cfg={"type": "controlnet", "args": ctl_args},
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref_net))

    rng = np.random.default_rng(5)
    ref_img = rng.random((1, 512, 512, 3), dtype=np.float32)
    x_start = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
    hint = rng.random((1, 3, 512, 512), dtype=np.float32)

    # ---- torch reference path (app.py:243-270 semantics: control in c_info)
    with torch.no_grad():
        c_ref = ref_net.ctx_encode(
            torch.from_numpy(ref_img.transpose(0, 3, 1, 2)), which="image")
        u_ref = torch.zeros_like(c_ref)
        x_ref, _ = RefDDIM(ref_net).sample(
            steps=50, shape=(1, 4, 64, 64),
            x_info={"type": "image", "xt": torch.from_numpy(x_start)},
            c_info={"type": "image", "conditioning": c_ref,
                    "unconditional_conditioning": u_ref,
                    "unconditional_guidance_scale": 2.0,
                    "control": torch.from_numpy(hint)},
            eta=0.0, verbose=False)
        img_ref = ref_net.vae_decode(x_ref, which="image")
    img_ref = ref_utils.t2n(img_ref).transpose(0, 2, 3, 1)

    cache_dir = os.environ.get("PFD_REF_CACHE")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(os.path.join(cache_dir, "e2e_fullsize_control_ref.npz"),
                 img_ref=img_ref, x_ref=ref_utils.t2n(x_ref),
                 c_ref=ref_utils.t2n(c_ref))

    # ---- pfd_tpu path, identical weights/noise/hint
    c = model.ctx_encode(params, jnp.asarray(ref_img), "image")
    np.testing.assert_allclose(np.asarray(c), ref_utils.t2n(c_ref),
                               rtol=2e-2, atol=2e-3)
    x, _ = DDIMSampler(model).sample(
        params, jax.random.PRNGKey(0), (1, 4, 64, 64),
        x_info={"xt": jnp.asarray(x_start.transpose(0, 2, 3, 1))},
        c_info={"conditioning": c,
                "unconditional_conditioning": jnp.zeros_like(c),
                "unconditional_guidance_scale": 2.0,
                "control": jnp.asarray(hint.transpose(0, 2, 3, 1))},
        steps=50, eta=0.0)
    lat_ref = ref_utils.t2n(x_ref).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(x), lat_ref, rtol=5e-2, atol=5e-3)
    img = np.asarray(model.vae_decode(params, x, "image"))

    s = ssim(img[0], img_ref[0], data_range=1.0)
    print(f"full-size control DDIM-50 e2e SSIM: {s:.5f}")
    assert s >= 0.95, f"control e2e SSIM {s:.4f} below the 0.95 gate"
