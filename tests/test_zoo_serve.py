"""Mixed-checkpoint batched serving (parallel/zoo_serve.py) on the virtual
8-device CPU mesh — BASELINE config #5 as written: per-request checkpoint
tags + per-request control, one batched program.

Equality contract: every request's output must equal a SINGLE-checkpoint,
single-request run of the plain sampler with the same per-request init
noise (ZooServer.init_noise's fold_in(seed, i) draws) — for both execution
modes (sharded shard_map over 8 devices; grouped by tag) and with control
masked per request (mask 0 == the reference's no-hint semantics,
pfd.py:475-478)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu import registry
from pfd_tpu.diffusion.ddim import DDIMSampler
from pfd_tpu.parallel import mesh as mesh_lib
from pfd_tpu.parallel.zoo_serve import ZooServer
from tests import ref_utils
from tests.test_dp_serving import TINY_UNET, TINY_VAE, TINY_SEECODER

TINY_CTL = {"type": "controlnet",
            "args": dict(in_channels=4, hint_channels=3, model_channels=32,
                         attention_resolutions=[1, 2], num_res_blocks=1,
                         channel_mult=[1, 2], num_heads=8, context_dim=768)}

# the ControlNet hint pyramid is fixed 8x, so control tests need an f=8 VAE
# (4 ch_mult levels) to align hint-embedding and latent resolutions
TINY_VAE_F8 = {"type": "autoencoderkl",
               "args": {"embed_dim": 4,
                        "ddconfig": {"double_z": True, "z_channels": 4,
                                     "resolution": 64, "in_channels": 3,
                                     "out_ch": 3, "ch": 32,
                                     "ch_mult": [1, 1, 2, 2],
                                     "num_res_blocks": 1,
                                     "attn_resolutions": []}}}

STEPS = 2
H = W = 64


def _build(with_control=False):
    kw = dict(
        vae_cfg_list=[["image", TINY_VAE_F8 if with_control else TINY_VAE]],
        ctx_cfg_list=[["image", TINY_SEECODER]],
        diffuser_cfg_list=[["image", TINY_UNET]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    if with_control:
        model = registry.get("pfd_with_control")(ctl_cfg=TINY_CTL, **kw)
    else:
        model = registry.get("pfd")(**kw)
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    return model, params


def _perturbed(tree, key, scale=0.05):
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(treedef, [
        a + scale * jax.random.normal(k, a.shape, a.dtype)
        if jnp.issubdtype(a.dtype, jnp.floating) else a
        for a, k in zip(leaves, keys)])


def _single(model, params, ref, x0, hint=None, scale=2.0):
    """Independent single-request expected path: plain DDIMSampler run."""
    sampler = DDIMSampler(model)
    tables = sampler.make_tables(STEPS, 0.0)
    c = model.ctx_encode(params, ref[None], "image")
    ci = {"conditioning": c, "unconditional_conditioning": jnp.zeros_like(c),
          "unconditional_guidance_scale": jnp.float32(scale)}
    if hint is not None:
        ci["control"] = hint[None]
    x, _ = sampler.sample_fn(params, jax.random.PRNGKey(9), x0[None], ci,
                             tables)
    return np.asarray(model.vae_decode(params, x, "image"))[0]


def test_zoo_sharded_mixed_checkpoints_equal_single():
    """8 requests over 8 devices, 2 diffuser tags + 2 SeeCoder tags mixed
    per request: each output equals its single-checkpoint run."""
    model, params = _build()
    zoo_d = {"a": params["diffuser"],
             "b": _perturbed(params["diffuser"], jax.random.PRNGKey(1))}
    zoo_c = {"s1": params["ctx"],
             "s2": _perturbed(params["ctx"], jax.random.PRNGKey(2))}
    mesh = mesh_lib.make_mesh(jax.devices(), tp=1)  # 8-way data
    server = ZooServer(model, params, zoo_d, ctx_zoo=zoo_c, mesh=mesh,
                       steps=STEPS)

    rng = np.random.default_rng(0)
    refs = rng.random((8, H, W, 3), dtype=np.float32)
    dtags = ["a", "b", "a", "b", "b", "a", "b", "a"]
    ctags = ["s1", "s1", "s2", "s2", "s1", "s2", "s1", "s2"]
    out = server.generate(refs, dtags, ctx_tags=ctags, h=H, w=W, seed=3)
    assert out.shape == (8, H, W, 3)
    assert len(out.sharding.device_set) == 8  # actually batch-sharded

    x_init = server.init_noise(jax.random.PRNGKey(3), 8, H, W)
    for i in [0, 1, 2, 5]:
        p = dict(params)
        p["diffuser"] = zoo_d[dtags[i]]
        p["ctx"] = zoo_c[ctags[i]]
        want = _single(model, p, jnp.asarray(refs[i]), x_init[i])
        np.testing.assert_allclose(np.asarray(out)[i], want,
                                   rtol=1e-4, atol=1e-5)
    # distinct checkpoints actually produce distinct outputs
    assert not np.allclose(np.asarray(out)[0], np.asarray(out)[1])


def test_zoo_grouped_equal_single():
    """Grouped mode (batch != device count): 4 requests, 2 tags, on the
    8-device mesh -> tag groups run sequentially with params-as-arguments
    (no recompile between groups beyond the per-size bucket)."""
    model, params = _build()
    zoo_d = {"a": params["diffuser"],
             "b": _perturbed(params["diffuser"], jax.random.PRNGKey(1))}
    mesh = mesh_lib.make_mesh(jax.devices(), tp=1)
    server = ZooServer(model, params, zoo_d, mesh=mesh, steps=STEPS)

    rng = np.random.default_rng(1)
    refs = rng.random((4, H, W, 3), dtype=np.float32)
    dtags = ["b", "a", "b", "a"]
    out = server.generate(refs, dtags, h=H, w=W, seed=7)
    assert out.shape == (4, H, W, 3)

    x_init = server.init_noise(jax.random.PRNGKey(7), 4, H, W)
    for i in range(4):
        p = dict(params)
        p["diffuser"] = zoo_d[dtags[i]]
        want = _single(model, p, jnp.asarray(refs[i]), x_init[i])
        np.testing.assert_allclose(np.asarray(out)[i], want,
                                   rtol=1e-4, atol=1e-5)


def test_zoo_per_request_control_mask():
    """Mixed control batch: requests with control_mask=0 must equal plain
    no-control runs (ccs_zeros semantics, reference pfd.py:475-478);
    mask=1 requests must equal with-hint runs."""
    model, params = _build(with_control=True)
    zoo_d = {"a": params["diffuser"]}
    mesh = mesh_lib.make_mesh(jax.devices(), tp=1)
    server = ZooServer(model, params, zoo_d, mesh=mesh, steps=STEPS)

    rng = np.random.default_rng(2)
    refs = rng.random((8, H, W, 3), dtype=np.float32)
    hints = rng.random((8, H, W, 3), dtype=np.float32)
    on = [True, False, True, False, True, False, True, False]
    out = server.generate(refs, ["a"] * 8, hints=hints, control_on=on,
                          h=H, w=W, seed=5)

    x_init = server.init_noise(jax.random.PRNGKey(5), 8, H, W)
    for i in [0, 1]:
        want = _single(model, params, jnp.asarray(refs[i]), x_init[i],
                       hint=jnp.asarray(hints[i]) if on[i] else None)
        np.testing.assert_allclose(np.asarray(out)[i], want,
                                   rtol=1e-4, atol=1e-5)
    # the hint actually matters for an enabled request
    out2 = server.generate(refs, ["a"] * 8,
                           hints=np.roll(hints, 1, axis=0), control_on=on,
                           h=H, w=W, seed=5)
    assert not np.allclose(np.asarray(out)[0], np.asarray(out2)[0])
    np.testing.assert_allclose(np.asarray(out)[1], np.asarray(out2)[1],
                               rtol=1e-5, atol=1e-6)


def test_zoo_control_requires_hints():
    model, params = _build()
    server = ZooServer(model, params, {"a": params["diffuser"]},
                       mesh=mesh_lib.make_mesh(jax.devices(), tp=1),
                       steps=STEPS)
    with pytest.raises(ValueError):
        server.generate(np.zeros((2, H, W, 3), np.float32), ["a", "a"],
                        control_on=[True, False], h=H, w=W)
