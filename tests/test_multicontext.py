"""Multicontext mixing parity vs reference apply_model_multicontext."""

import numpy as np
import jax
import jax.numpy as jnp

from pfd_tpu import registry
from pfd_tpu.io.convert import torch_sd_to_pytree
from tests import ref_utils
from tests.ref_utils import assert_close
from tests.test_unet import TINY, ref_unet_walk


def _ref_pfd_shell(unets):
    import torch
    from lib.model_zoo.pfd import PromptFreeDiffusion as RefPFD

    shell = RefPFD.__new__(RefPFD)
    torch.nn.Module.__init__(shell)
    shell.diffuser = torch.nn.ModuleDict(unets)
    shell.global_layer_ptr = None
    return shell


def test_attention_mixing_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.openaimodel import UNetModel2D_Next

    ref_utils.seed_all(0)
    ref_a = UNetModel2D_Next(**TINY).eval()
    ref_b = UNetModel2D_Next(**TINY).eval()
    ref_utils.randomize_params(ref_a, seed=21)
    ref_utils.randomize_params(ref_b, seed=22)
    shell = _ref_pfd_shell({"image": ref_a, "aux": ref_b})

    model = registry.get("pfd")(
        vae_cfg_list=[], ctx_cfg_list=[],
        diffuser_cfg_list=[["image", {"type": "openai_unet_2d_next", "args": TINY}],
                           ["aux", {"type": "openai_unet_2d_next", "args": TINY}]],
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = {"diffuser": {
        "image": torch_sd_to_pytree(ref_utils.sd_numpy(ref_a)),
        "aux": torch_sd_to_pytree(ref_utils.sd_numpy(ref_b)),
    }}

    x = np.random.randn(1, 4, 16, 16).astype(np.float32)
    t = np.array([321], np.int64)
    c1 = np.random.randn(1, 9, 64).astype(np.float32)
    c2 = np.random.randn(1, 7, 64).astype(np.float32)

    with torch.no_grad():
        want = shell.apply_model_multicontext(
            {"type": "image", "x": torch.from_numpy(x)},
            torch.from_numpy(t),
            [{"type": "image", "c": torch.from_numpy(c1), "ratio": 0.7},
             {"type": "aux", "c": torch.from_numpy(c2), "ratio": 0.3}],
            mixing_type="attention")

    got = model.apply_model_multicontext(
        params, {"type": "image", "x": jnp.asarray(x.transpose(0, 2, 3, 1))},
        jnp.asarray(t),
        [{"type": "image", "c": jnp.asarray(c1), "ratio": 0.7},
         {"type": "aux", "c": jnp.asarray(c2), "ratio": 0.3}],
        mixing_type="attention")
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=2e-3, atol=2e-4, name="multicontext attention mixing")


def test_multicontext_sampler_runs():
    from pfd_tpu.diffusion.ddim import DDIMSampler

    model = registry.get("pfd")(
        vae_cfg_list=[], ctx_cfg_list=[],
        diffuser_cfg_list=[["image", {"type": "openai_unet_2d_next", "args": TINY}]],
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    sampler = DDIMSampler(model)
    c1 = jnp.zeros((1, 9, 64))
    x, _ = sampler.sample_multicontext(
        params, jax.random.PRNGKey(1), (1, 8, 8, 4), {},
        [{"type": "image", "conditioning": c1,
          "unconditional_conditioning": jnp.zeros_like(c1),
          "unconditional_guidance_scale": 2.0, "ratio": 1.0}],
        steps=5)
    assert x.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(x)).all()
