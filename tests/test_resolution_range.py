"""Resolution-range contract (reference app.py:197-207): 512-1536 in 64-px
steps, free aspect ratio. CPU-tiny evidence that non-square and
non-window-multiple sizes flow through every component: autoset_hw policy,
Swin pad-to-window (reference swin.py:269-273), sampler + VAE at h != w,
and the DP serving program."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu import registry
from pfd_tpu.parallel import mesh as mesh_lib
from pfd_tpu.parallel.serve import DataParallelServer
from pfd_tpu.pipeline import PromptFreeDiffusionPipeline
from tests import ref_utils
from tests.test_dp_serving import TINY_UNET, TINY_VAE, TINY_SEECODER


@pytest.mark.parametrize("shape,want", [
    ((700, 333, 3), (640, 512)),   # floor to 64-multiple, clamp up to 512
    ((100, 100, 3), (512, 512)),   # below range -> clamp to 512
    ((2000, 1700, 3), (1536, 1536)),  # above range -> clamp to 1536
    ((512, 768, 3), (512, 768)),   # already on-grid, non-square preserved
    ((575, 1535, 3), (512, 1472)),  # floor both dims independently
])
def test_autoset_hw_policy(shape, want):
    assert PromptFreeDiffusionPipeline.action_autoset_hw(
        np.zeros(shape, np.float32)) == want


def test_autoset_hw_none_defaults():
    assert PromptFreeDiffusionPipeline.action_autoset_hw(None) == (512, 512)


def test_swin_pad_to_window_nonmultiple():
    """Feature maps that are NOT window multiples must pad (reference
    swin.py:269-273): 72x40 input, patch 4 -> 18x10 features, window 4 ->
    pad to 20x12. Checks both plain and shifted-window stages."""
    swin = registry.get("swin")(embed_dim=32, depths=[1, 1, 1, 1],
                                num_heads=[1, 2, 4, 8],
                                window_size=4, ape=False, patch_norm=True)
    params = ref_utils.dezero_pytree(swin.init(jax.random.PRNGKey(0)))
    x = jnp.asarray(np.random.default_rng(0).random((1, 72, 40, 3)),
                    jnp.float32)
    feats = swin.apply(params, x)
    r2 = feats["res2"]
    assert r2.shape[1:3] == (18, 10), r2.shape
    for v in feats.values():
        assert np.isfinite(np.asarray(v)).all()


def test_nonsquare_serving_and_turbo():
    """Non-square (h != w) request through the full batched serving program,
    exact and turbo samplers: SeeCoder -> CFG DDIM -> VAE decode."""
    model = registry.get("pfd")(
        vae_cfg_list=[["image", TINY_VAE]],
        ctx_cfg_list=[["image", TINY_SEECODER]],
        diffuser_cfg_list=[["image", TINY_UNET]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    mesh = mesh_lib.make_mesh(jax.devices(), tp=1)
    refs = np.random.default_rng(1).random((8, 96, 64, 3)).astype(np.float32)

    server = DataParallelServer(model, params, mesh, steps=2)
    out = server.generate(refs, h=96, w=64, seed=1)
    assert out.shape == (8, 96, 64, 3)
    assert np.isfinite(np.asarray(out)).all()

    turbo = DataParallelServer(model, params, mesh, steps=4,
                               encoder_interval=2, cfg_interval=2,
                               deep_interval=2)
    out2 = turbo.generate(refs, h=96, w=64, seed=1)
    assert out2.shape == (8, 96, 64, 3)
    assert np.isfinite(np.asarray(out2)).all()


def test_bucketed_warmup_aspect_grid():
    """The 64-multiple (h, w) grid compiles as independent buckets — a
    non-square bucket does not collide with the square one."""
    model = registry.get("pfd")(
        vae_cfg_list=[["image", TINY_VAE]],
        ctx_cfg_list=[["image", TINY_SEECODER]],
        diffuser_cfg_list=[["image", TINY_UNET]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    mesh = mesh_lib.make_mesh(jax.devices(), tp=1)
    server = DataParallelServer(model, params, mesh, steps=2)
    keys = server.warmup([(64, 64), (64, 128), (128, 64)], batch=8)
    assert (64, 128, 8, False) in keys and (128, 64, 8, False) in keys
