"""Sharded-execution equality: the same UNet forward must produce the same
numbers on a single device, dp8, and dp2 x sp2 x tp2 (halo-exchange convs +
Megatron TP attention + batch DP all at once).

This is the numerical gate for parallel/{mesh,sharding}.py — the SPMD
replacement for the reference's DDP stack (lib/utils.py:558-561). The fast
test runs a tiny model; the slow test runs the full SD-1.5 *block plan*
(openai_unet.yaml:23-35 structure: 4 levels, mult [1,2,4,4], 2 res blocks per
level, attention at ds 1/2/4) at half width and 16x16 latents — on the
single-host-core CPU backend, multi-device emulation pays a ~30x execution
overhead plus param-streaming cost, so full width at 64x64 latents is not
runnable here (measured: one full-width 16x16 forward alone is 39 s
single-device).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu import registry
from pfd_tpu.parallel import mesh as mesh_lib
from pfd_tpu.parallel import sharding
from tests import ref_utils


def _build(model_channels, num_res_blocks, channel_mult, attn):
    unet_cfg = {"type": "openai_unet_2d_next",
                "args": dict(in_channels=4, out_channels=4,
                             model_channels=model_channels,
                             attention_resolutions=attn,
                             num_res_blocks=num_res_blocks,
                             channel_mult=channel_mult,
                             num_heads=8, context_dim=768)}
    model = registry.get("pfd")(
        vae_cfg_list=[], ctx_cfg_list=[],
        diffuser_cfg_list=[["image", unet_cfg]],
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    return model, params


def _forward_on_mesh(model, params, x, t, c, mesh):
    p = sharding.place_params(params, mesh)
    dshard = mesh_lib.data_sharding(mesh)
    bshard = mesh_lib.batch_only_sharding(mesh)
    xs = jax.device_put(x, dshard)
    ts = jax.device_put(t, bshard)
    cs = jax.device_put(c, bshard)
    f = jax.jit(lambda p, x, t, c: model.apply_model(
        p, {"type": "image", "x": x}, t, {"type": "image", "c": c}))
    out = f(p, xs, ts, cs)
    return np.asarray(jax.block_until_ready(out))


def _equality(model, params, res):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, res, res, 4)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 1000, (8,)), jnp.int32)
    c = jnp.asarray(rng.standard_normal((8, 148, 768)), jnp.float32)

    f1 = jax.jit(lambda p, x, t, c: model.apply_model(
        p, {"type": "image", "x": x}, t, {"type": "image", "c": c}))
    golden = np.asarray(jax.block_until_ready(f1(params, x, t, c)))

    dp8 = _forward_on_mesh(model, params, x, t, c,
                           mesh_lib.make_mesh(jax.devices(), tp=1, sp=1))
    np.testing.assert_allclose(dp8, golden, rtol=2e-5, atol=2e-5)

    mixed = _forward_on_mesh(model, params, x, t, c,
                             mesh_lib.make_mesh(jax.devices(), tp=2, sp=2))
    np.testing.assert_allclose(mixed, golden, rtol=2e-5, atol=2e-5)


def test_dp8_vs_dp2sp2tp2_tiny():
    model, params = _build(32, [1, 1], [1, 2], [1, 2])
    _equality(model, params, res=16)


@pytest.mark.slow
def test_dp8_vs_dp2sp2tp2_sd15_block_plan():
    """Full SD-1.5 block plan (structure-exact) at half width."""
    model, params = _build(160, [2, 2, 2, 2], [1, 2, 4, 4], [4, 2, 1])
    _equality(model, params, res=16)
