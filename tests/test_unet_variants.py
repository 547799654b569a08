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


def test_unet_2d_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.openaimodel import UNetModel2D as Ref2D

    kw = dict(input_channels=4, model_channels=32, output_channels=4,
              context_dim=64, num_noattn_blocks=(1, 1), channel_mult=(1, 2),
              with_attn=[True, False], num_heads=4, use_checkpoint=False)
    ref_utils.seed_all(25)
    ref = Ref2D(**kw).eval()
    ref_utils.randomize_params(ref, seed=56)
    ours = registry.get("openai_unet_2d")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    x = np.random.randn(1, 4, 16, 16).astype(np.float32)
    t = np.array([88], np.int64)
    c = np.random.randn(1, 9, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                   context=torch.from_numpy(c))
    got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t), jnp.asarray(c))
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=2e-3, atol=2e-4, name="openai_unet_2d")


def test_unet_0d_classic_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.openaimodel import UNetModel0D as Ref0D

    kw = dict(input_channels=24, model_channels=32, output_channels=24,
              context_dim=64, num_noattn_blocks=(1, 1), channel_mult=(1, 2),
              with_attn=[True, False], num_heads=4, use_checkpoint=False)
    ref_utils.seed_all(26)
    ref = Ref0D(**kw).eval()
    ref_utils.randomize_params(ref, seed=57)
    ours = registry.get("openai_unet_0d")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    x = np.random.randn(2, 24, 1, 1).astype(np.float32)
    t = np.array([3, 700], np.int64)
    c = np.random.randn(2, 9, 64).astype(np.float32)
    import torch as th
    with th.no_grad():
        want = ref(th.from_numpy(x), timesteps=th.from_numpy(t),
                   context=th.from_numpy(c))
    got = ours.apply(params, jnp.asarray(x[:, :, 0, 0]), jnp.asarray(t),
                     jnp.asarray(c))
    assert_close(got[:, 0, 0, :], ref_utils.t2n(want)[:, :, 0, 0],
                 rtol=2e-3, atol=2e-4, name="openai_unet_0d")


def test_unet_0dmd_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.openaimodel import UNetModel0D_MultiDim as Ref0DMD

    kw = dict(input_channels=24, model_channels=32, output_channels=24,
              context_dim=64, num_noattn_blocks=(1, 1), channel_mult=(1, 2),
              second_dim=(2, 2), with_attn=[True, False], num_heads=4,
              use_checkpoint=False)
    ref_utils.seed_all(27)
    ref = Ref0DMD(**kw).eval()
    ref_utils.randomize_params(ref, seed=58)
    ours = registry.get("openai_unet_0dmd")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    x = np.random.randn(2, 24, 1, 1).astype(np.float32)
    t = np.array([3, 700], np.int64)
    c = np.random.randn(2, 9, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                   context=torch.from_numpy(c))
    got = ours.apply(params, jnp.asarray(x[:, :, 0, 0]), jnp.asarray(t),
                     jnp.asarray(c))
    w = ref_utils.t2n(want)
    assert_close(got, w.reshape(got.shape), rtol=2e-3, atol=2e-4,
                 name="openai_unet_0dmd")


def _vd_pair():
    ref_utils.load_reference()
    from lib.model_zoo.openaimodel import UNetModelVD as RefVD
    from tests.test_e2e_parity import AttrDict

    img_cfg = {"type": "openai_unet_2d", "args": dict(
        input_channels=4, model_channels=32, output_channels=4, context_dim=64,
        num_noattn_blocks=(1, 1), channel_mult=(1, 2), with_attn=[True, False],
        num_heads=4, use_checkpoint=False)}
    txt_cfg = {"type": "openai_unet_0dmd", "args": dict(
        input_channels=24, model_channels=32, output_channels=24, context_dim=64,
        num_noattn_blocks=(1, 1), channel_mult=(1, 2), second_dim=(2, 2),
        with_attn=[True, False], num_heads=4, use_checkpoint=False)}
    ref_utils.seed_all(28)
    ref = RefVD(unet_image_cfg=AttrDict(img_cfg),
                unet_text_cfg=AttrDict(txt_cfg)).eval()
    ref_utils.randomize_params(ref, seed=59)
    ours = registry.get("openai_unet_vd")(unet_image_cfg=img_cfg,
                                          unet_text_cfg=txt_cfg)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))
    return ref, ours, params


def test_vd_unet_image_stream_parity():
    import torch

    ref, ours, params = _vd_pair()
    x = np.random.randn(1, 4, 16, 16).astype(np.float32)
    t = np.array([64], np.int64)
    c = np.random.randn(1, 9, 64).astype(np.float32)
    for ctype in ("prompt", "vision"):
        with torch.no_grad():
            want = ref(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(c), xtype="image", ctype=ctype)
        got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), jnp.asarray(c), xtype="image",
                         ctype=ctype)
        assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                     rtol=2e-3, atol=2e-4, name=f"vd image ctype={ctype}")


def test_vd_unet_text_stream_parity():
    import torch

    ref, ours, params = _vd_pair()
    x = np.random.randn(1, 24).astype(np.float32)
    t = np.array([64], np.int64)
    c = np.random.randn(1, 9, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t),
                   torch.from_numpy(c), xtype="text", ctype="prompt")
    got = ours.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(c),
                     xtype="text", ctype="prompt")
    w = ref_utils.t2n(want)
    assert_close(got, w.reshape(got.shape), rtol=2e-3, atol=2e-4,
                 name="vd text stream")


def test_vd_unet_dual_context_parity():
    import torch

    ref, ours, params = _vd_pair()
    x = np.random.randn(1, 4, 16, 16).astype(np.float32)
    t = np.array([64], np.int64)
    c0 = np.random.randn(1, 9, 64).astype(np.float32)
    c1 = np.random.randn(1, 7, 64).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_dc(torch.from_numpy(x), torch.from_numpy(t),
                              torch.from_numpy(c0), torch.from_numpy(c1),
                              xtype="image", c0_type="vision", c1_type="prompt",
                              mixed_ratio=0.4)
    got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t), jnp.asarray(c0), xtype="image",
                     ctype="vision", context2=(jnp.asarray(c1), "prompt"),
                     mixed_ratio=0.4)
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=2e-3, atol=2e-4, name="vd dual context")
