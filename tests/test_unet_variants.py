"""Legacy UNet variants: parity vs the reference family."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu import registry
from pfd_tpu.io.convert import torch_sd_to_pytree
from tests import ref_utils
from tests.ref_utils import assert_close


def _run(ref, ours, x, t, rtol=2e-3, atol=2e-4, name=""):
    import torch

    with torch.no_grad():
        want = ref(torch.from_numpy(x), timesteps=torch.from_numpy(t))
    got = ours.apply(torch_sd_to_pytree(ref_utils.sd_numpy(ref)),
                     jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=rtol, atol=atol, name=name)


def test_nocontext_attentionblock_parity():
    ref_utils.load_reference()
    from lib.model_zoo.openaimodel import UNetModelNoContext

    kw = dict(image_size=None, in_channels=4, model_channels=32, out_channels=4,
              num_res_blocks=1, attention_resolutions=[1, 2],
              channel_mult=[1, 2], num_heads=4, use_spatial_transformer=False,
              legacy=False)
    ref_utils.seed_all(20)
    ref = UNetModelNoContext(**kw).eval()
    ref_utils.randomize_params(ref, seed=51)
    ours = registry.get("openai_unet_nocontext")(**kw)
    x = np.random.randn(1, 4, 16, 16).astype(np.float32)
    t = np.array([42], np.int64)
    _run(ref, ours, x, t, name="nocontext attnblock")


def test_nocontext_spatialtransformer_parity():
    ref_utils.load_reference()
    from lib.model_zoo.openaimodel import UNetModelNoContext

    kw = dict(image_size=None, in_channels=4, model_channels=32, out_channels=4,
              num_res_blocks=1, attention_resolutions=[1, 2],
              channel_mult=[1, 2], num_heads=4, use_spatial_transformer=True,
              legacy=False)
    ref_utils.seed_all(21)
    ref = UNetModelNoContext(**kw).eval()
    ref_utils.randomize_params(ref, seed=52)
    ours = registry.get("openai_unet_nocontext")(**kw)
    x = np.random.randn(1, 4, 16, 16).astype(np.float32)
    t = np.array([42], np.int64)
    _run(ref, ours, x, t, name="nocontext ST")


def test_noatt_parity():
    ref_utils.load_reference()
    from lib.model_zoo.openaimodel import UNetModelNoContextNoAtt

    kw = dict(in_channels=4, model_channels=32, out_channels=4,
              num_res_blocks=1, channel_mult=[1, 2])
    ref_utils.seed_all(22)
    ref = UNetModelNoContextNoAtt(**kw).eval()
    ref_utils.randomize_params(ref, seed=53)
    ours = registry.get("openai_unet_nocontext_noatt")(**kw)
    x = np.random.randn(1, 4, 16, 16).astype(np.float32)
    t = np.array([7], np.int64)
    _run(ref, ours, x, t, name="noatt")


def test_decoderonly_parity():
    ref_utils.load_reference()
    from lib.model_zoo.openaimodel import UNetModelNoContextNoAttDecoderOnly

    kw = dict(in_channels=4, out_channels=3, model_channels=32,
              num_res_blocks=1, channel_mult=[2, 1])
    ref_utils.seed_all(23)
    ref = UNetModelNoContextNoAttDecoderOnly(**kw).eval()
    ref_utils.randomize_params(ref, seed=54)
    ours = registry.get("openai_unet_nocontext_noatt_decoderonly")(**kw)
    x = np.random.randn(1, 4, 8, 8).astype(np.float32)
    t = np.array([7], np.int64)
    _run(ref, ours, x, t, name="decoderonly")


@pytest.mark.parametrize("pool", ["adaptive", "spatial", "spatial_v2"])
def test_encoder_unet_parity(pool):
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.openaimodel import EncoderUNetModel

    kw = dict(image_size=16, in_channels=4, model_channels=32, out_channels=10,
              num_res_blocks=1, attention_resolutions=[2],
              channel_mult=[1, 2], num_heads=4, pool=pool)
    ref_utils.seed_all(24)
    ref = EncoderUNetModel(**kw).eval()
    ref_utils.randomize_params(ref, seed=55)
    ours = registry.get("openai_unet_encoder")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    x = np.random.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([5, 900], np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t))
    got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    assert_close(got, ref_utils.t2n(want), rtol=2e-3, atol=2e-4,
                 name=f"encoder pool={pool}")
