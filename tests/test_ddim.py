"""DDIM trajectory parity: full sampler loop vs the reference, tiny UNet,
identical start noise, eta=0 (the live app path, app.py:133 / ddim.py:145-172)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu import registry
from pfd_tpu.diffusion.ddim import DDIMSampler
from pfd_tpu.io.convert import torch_sd_to_pytree
from tests import ref_utils
from tests.ref_utils import assert_close
from tests.test_unet import TINY


class _Shell:
    """Minimal pfd_tpu 'model' carrying one diffuser, for sampler tests."""

    def __init__(self, unet, schedule):
        self.diffuser = {"image": unet}
        self.schedule = schedule
        self.global_layer_ptr = None

    def apply_model(self, params, x_info, t, c_info, **kw):
        return self.diffuser["image"].apply(params["diffuser"]["image"],
                                            x_info["x"], t, c_info["c"], **kw)


def make_ref_shell(ref_unet):
    """Reference pfd shell with just a diffuser + schedule (pfd.py semantics)."""
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.pfd import PromptFreeDiffusion as RefPFD

    shell = RefPFD.__new__(RefPFD)
    torch.nn.Module.__init__(shell)
    shell.v_posterior = 0.0
    shell.parameterization = "eps"
    shell.register_schedule(beta_schedule="linear", timesteps=1000,
                            linear_start=0.00085, linear_end=0.012)
    shell.diffuser = torch.nn.ModuleDict({"image": ref_unet})
    shell.global_layer_ptr = None
    shell.device = "cpu"
    return shell


@pytest.mark.parametrize("ugscale,use_uncond", [(2.0, True), (1.0, False)])
def test_ddim_loop_parity(ugscale, use_uncond):
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.openaimodel import UNetModel2D_Next
    from lib.model_zoo.ddim import DDIMSampler as RefDDIM

    # the reference force-moves buffers to CUDA (ddim.py:17-21) — a bug for
    # CPU runs; neutralize for the test.
    RefDDIM.register_buffer = lambda self, name, attr: setattr(self, name, attr)
    # reference ddim.py:95 calls Tensor.astype (doesn't exist; dead path in
    # the app, which always samples from pure noise) — shim it.
    if not hasattr(torch.Tensor, "astype"):
        torch.Tensor.astype = lambda self, d: self.to(d)

    ref_utils.seed_all(0)
    ref_unet = UNetModel2D_Next(**TINY).eval()
    ref_utils.randomize_params(ref_unet, seed=11)  # de-zero output convs
    shell_ref = make_ref_shell(ref_unet)
    sampler_ref = RefDDIM(shell_ref)

    ours_unet = registry.get("openai_unet_2d_next")(**TINY)
    from pfd_tpu.diffusion import schedules
    sched = schedules.make_diffusion_schedule("linear", 1000,
                                              linear_start=0.00085,
                                              linear_end=0.012)
    shell = _Shell(ours_unet, sched)
    params = {"diffuser": {"image": torch_sd_to_pytree(ref_utils.sd_numpy(ref_unet))}}
    sampler = DDIMSampler(shell)

    ref_utils.seed_all(1)
    shape = (1, 4, 16, 16)
    x_start = np.random.randn(*shape).astype(np.float32)
    c = np.random.randn(1, 9, 64).astype(np.float32)
    u = np.zeros_like(c)

    with torch.no_grad():
        want, _ = sampler_ref.sample(
            steps=5, shape=shape,
            x_info={"type": "image", "xt": torch.from_numpy(x_start)},
            c_info={"type": "image",
                    "conditioning": torch.from_numpy(c),
                    "unconditional_conditioning":
                        torch.from_numpy(u) if use_uncond else None,
                    "unconditional_guidance_scale": ugscale},
            eta=0.0, verbose=False)

    got, _ = sampler.sample(
        params, jax.random.PRNGKey(0), shape,
        x_info={"xt": jnp.asarray(x_start.transpose(0, 2, 3, 1))},
        c_info={"conditioning": jnp.asarray(c),
                "unconditional_conditioning": jnp.asarray(u) if use_uncond else None,
                "unconditional_guidance_scale": ugscale},
        steps=5, eta=0.0)

    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=5e-3, atol=5e-4, name=f"ddim final latent cfg={ugscale}")


def test_img2img_x0_path():
    """x_info={'x0', 'x0_forward_timesteps'} (reference ddim.py:94-105):
    q_sample parity vs the reference shell + internal consistency of the
    sampler's x0 path with a manually q_sample'd xt fed through the xt path
    (same rng split), truncated to the same step count."""
    ref_utils.load_reference()
    import torch
    from tests.test_unet import make_pair

    ref_unet, _, params_u = make_pair(TINY)
    shell_ref = make_ref_shell(ref_unet)

    model = registry.get("pfd")(
        vae_cfg_list=[], ctx_cfg_list=[],
        diffuser_cfg_list=[["image", {"type": "openai_unet_2d_next",
                                      "args": TINY}]],
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = {"diffuser": {"image": params_u}}

    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    noise = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    t = jnp.asarray([100, 700], jnp.int32)

    # q_sample parity (shared x0, t, noise)
    got = model.q_sample(x0, t, jnp.asarray(noise))
    with torch.no_grad():
        want = shell_ref.q_sample(
            torch.from_numpy(np.asarray(x0).transpose(0, 3, 1, 2)),
            torch.tensor([100, 700]),
            torch.from_numpy(noise.transpose(0, 3, 1, 2)))
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=1e-5, atol=1e-6, name="q_sample")

    # sampler x0 path == q_sample'd xt through the xt path, same rng
    sampler = DDIMSampler(model)
    c = jnp.asarray(rng.standard_normal((2, 9, 64)), jnp.float32)
    c_info = {"conditioning": c, "unconditional_conditioning": None,
              "unconditional_guidance_scale": 1.0}
    steps, k = 10, 4
    key = jax.random.PRNGKey(7)
    xa, _ = sampler.sample(params, key, x0.shape,
                           x_info={"x0": x0, "x0_forward_timesteps": k},
                           c_info=dict(c_info), steps=steps, eta=0.0)
    tables = sampler.make_tables(steps, 0.0)
    rng2, init_rng = jax.random.split(key)
    ts = jnp.full((2,), int(tables.timesteps[k]), jnp.int32)
    n2 = jax.random.normal(init_rng, x0.shape, x0.dtype)
    xt = model.q_sample(x0, ts, n2)
    xb, _ = sampler.sample_fn(params, rng2, xt, dict(c_info), tables, k)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(xa)).all()
