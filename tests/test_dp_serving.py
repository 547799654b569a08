"""8-way DP batched serving on the virtual CPU mesh (tiny models)."""

import numpy as np
import jax
import pytest

from pfd_tpu import registry
from pfd_tpu.parallel import mesh as mesh_lib
from pfd_tpu.parallel.serve import DataParallelServer
from tests import ref_utils

TINY_UNET = {"type": "openai_unet_2d_next",
             "args": dict(in_channels=4, out_channels=4, model_channels=32,
                          attention_resolutions=[1, 2], num_res_blocks=[1, 1],
                          channel_mult=[1, 2], num_heads=8, context_dim=768)}
TINY_VAE = {"type": "autoencoderkl",
            "args": {"embed_dim": 4,
                     "ddconfig": {"double_z": True, "z_channels": 4,
                                  "resolution": 64, "in_channels": 3,
                                  "out_ch": 3, "ch": 32, "ch_mult": [1, 2],
                                  "num_res_blocks": 1, "attn_resolutions": []}}}
TINY_SEECODER = {
    "type": "seecoder",
    "args": {
        "imencoder_cfg": {"type": "swin", "args": dict(
            embed_dim=32, depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
            window_size=4, ape=False, patch_norm=True)},
        "imdecoder_cfg": {"type": "seecoder_decoder", "args": dict(
            inchannels={"res3": 64, "res4": 128, "res5": 256},
            trans_input_tags=["res3", "res4", "res5"], trans_num_layers=1,
            trans_dim=768, trans_nheads=8, trans_dropout=0.0,
            trans_feedforward_dim=64)},
        "qtransformer_cfg": {"type": "seecoder_query_transformer", "args": dict(
            in_channels=768, hidden_dim=768, num_queries=[4, 16], nheads=8,
            num_layers=3, feedforward_dim=64, pre_norm=False,
            num_feature_levels=3, enforce_input_project=False,
            with_fea2d_pos=False)},
    },
}


def test_dp_serving_8way():
    model = registry.get("pfd")(
        vae_cfg_list=[["image", TINY_VAE]],
        ctx_cfg_list=[["image", TINY_SEECODER]],
        diffuser_cfg_list=[["image", TINY_UNET]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    mesh = mesh_lib.make_mesh(jax.devices(), tp=1)  # 8-way DP
    server = DataParallelServer(model, params, mesh, steps=2)

    refs = np.random.rand(8, 64, 64, 3).astype(np.float32)
    out = server.generate(refs, h=64, w=64, seed=1)
    assert out.shape == (8, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    # output is batch-sharded over the mesh
    assert len(out.sharding.device_set) == 8

    # mixed batch actually depends on each row's reference
    refs2 = refs.copy()
    refs2[3] = np.random.rand(64, 64, 3)
    out2 = server.generate(refs2, h=64, w=64, seed=1)
    assert not np.allclose(np.asarray(out)[3], np.asarray(out2)[3])
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(out2)[0],
                               rtol=1e-4, atol=1e-5)

    # warmup precompiles buckets
    keys = server.warmup([(64, 64), (64, 128)], batch=8)
    assert (64, 128, 8, False) in keys


def test_dp_serving_turbo_knobs():
    """cfg_interval/deep_interval compose with DP batching: the sharded scan
    program still compiles and the output stays batch-sharded and finite."""
    model = registry.get("pfd")(
        vae_cfg_list=[["image", TINY_VAE]],
        ctx_cfg_list=[["image", TINY_SEECODER]],
        diffuser_cfg_list=[["image", TINY_UNET]],
        latent_scale_factor={"image": 0.18215},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    mesh = mesh_lib.make_mesh(jax.devices(), tp=1)
    server = DataParallelServer(model, params, mesh, steps=4,
                                encoder_interval=2, cfg_interval=2,
                                deep_interval=2)
    refs = np.random.rand(8, 64, 64, 3).astype(np.float32)
    out = server.generate(refs, h=64, w=64, seed=1)
    assert out.shape == (8, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert len(out.sharding.device_set) == 8
