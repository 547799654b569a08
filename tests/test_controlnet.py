"""ControlNet parity vs reference, shared weights (tiny config)."""

import numpy as np
import jax.numpy as jnp

from pfd_tpu import registry
from pfd_tpu.io.convert import torch_sd_to_pytree
from tests import ref_utils
from tests.ref_utils import assert_close

TINY = dict(image_size=None, in_channels=4, hint_channels=3, model_channels=32,
            attention_resolutions=[1, 2], num_res_blocks=1, channel_mult=[1, 2],
            num_heads=4, use_spatial_transformer=True, transformer_depth=1,
            context_dim=64, use_checkpoint=False, legacy=False)


def test_controlnet_residual_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.controlnet import ControlNet as RefCN

    ref_utils.seed_all(0)
    ref = RefCN(**TINY).eval()
    ref_utils.randomize_params(ref, seed=9)  # de-zero zero_convs/hint conv
    ours = registry.get("controlnet")(
        in_channels=4, hint_channels=3, model_channels=32,
        attention_resolutions=[1, 2], num_res_blocks=1, channel_mult=[1, 2],
        num_heads=4, context_dim=64)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    ref_utils.seed_all(1)
    x = np.random.randn(2, 4, 8, 8).astype(np.float32)
    hint = np.random.rand(2, 3, 64, 64).astype(np.float32)
    t = np.array([10, 500], np.int64)
    c = np.random.randn(2, 9, 64).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x), hint=torch.from_numpy(hint),
                   timesteps=torch.from_numpy(t), context=torch.from_numpy(c))

    got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(hint.transpose(0, 2, 3, 1)),
                     jnp.asarray(t), jnp.asarray(c))
    assert len(got) == len(want) == ours.num_residuals
    for i, (g, w) in enumerate(zip(got, want)):
        assert_close(g, ref_utils.t2n(w).transpose(0, 2, 3, 1),
                     rtol=2e-3, atol=2e-4, name=f"ctl residual {i}")


def test_full_controlnet_plan():
    from pfd_tpu import config

    cn = registry.build_model(config.model_cfg("controlnet"))
    assert cn.num_residuals == 13  # 12 input blocks + middle (SURVEY §2.7)


def test_pfd_with_control_apply_model_parity():
    """Full control path: 13 residuals folded into the UNet walk
    (pfd.py:457-528 pop-order semantics) vs the reference."""
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.controlnet import ControlNet as RefCN
    from lib.model_zoo.openaimodel import UNetModel2D_Next
    from lib.model_zoo.pfd import PromptFreeDiffusion_with_control as RefPFDC

    UNET_ARGS = dict(in_channels=4, out_channels=4, model_channels=32,
                     attention_resolutions=[1, 2], num_res_blocks=[1, 1],
                     channel_mult=[1, 2], num_heads=4, context_dim=64)
    CTL_ARGS = dict(image_size=None, in_channels=4, hint_channels=3,
                    model_channels=32, attention_resolutions=[1, 2],
                    num_res_blocks=1, channel_mult=[1, 2], num_heads=4,
                    use_spatial_transformer=True, transformer_depth=1,
                    context_dim=64, use_checkpoint=False, legacy=False)

    ref_utils.seed_all(2)
    ref_unet = UNetModel2D_Next(**UNET_ARGS).eval()
    ref_ctl = RefCN(**CTL_ARGS).eval()
    ref_utils.randomize_params(ref_unet, seed=41)
    ref_utils.randomize_params(ref_ctl, seed=42)

    shell = RefPFDC.__new__(RefPFDC)
    torch.nn.Module.__init__(shell)
    shell.diffuser = torch.nn.ModuleDict({"image": ref_unet})
    shell.ctl = ref_ctl
    shell.global_layer_ptr = None

    model = registry.get("pfd_with_control")(
        vae_cfg_list=[], ctx_cfg_list=[],
        diffuser_cfg_list=[["image", {"type": "openai_unet_2d_next",
                                      "args": UNET_ARGS}]],
        ctl_cfg={"type": "controlnet",
                 "args": dict(in_channels=4, hint_channels=3, model_channels=32,
                              attention_resolutions=[1, 2], num_res_blocks=1,
                              channel_mult=[1, 2], num_heads=4, context_dim=64)},
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = {
        "diffuser": {"image": torch_sd_to_pytree(ref_utils.sd_numpy(ref_unet))},
        "ctl": torch_sd_to_pytree(ref_utils.sd_numpy(ref_ctl)),
    }

    x = np.random.randn(1, 4, 8, 8).astype(np.float32)
    hint = np.random.rand(1, 3, 64, 64).astype(np.float32)
    t = np.array([123], np.int64)
    c = np.random.randn(1, 9, 64).astype(np.float32)

    with torch.no_grad():
        want = shell.apply_model(
            {"type": "image", "x": torch.from_numpy(x)}, torch.from_numpy(t),
            {"type": "image", "c": torch.from_numpy(c),
             "control": torch.from_numpy(hint)})
    got = model.apply_model(
        params, {"type": "image", "x": jnp.asarray(x.transpose(0, 2, 3, 1))},
        jnp.asarray(t),
        {"type": "image", "c": jnp.asarray(c),
         "control": jnp.asarray(hint.transpose(0, 2, 3, 1))})
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=2e-3, atol=2e-4, name="pfd_with_control eps")

    # encoder/decoder split must agree with the full control walk too
    h, hs = model.apply_model_encoder(
        params, {"type": "image", "x": jnp.asarray(x.transpose(0, 2, 3, 1))},
        jnp.asarray(t),
        {"type": "image", "c": jnp.asarray(c),
         "control": jnp.asarray(hint.transpose(0, 2, 3, 1))})
    split = model.apply_model_decoder(params, h, hs, jnp.asarray(t),
                                      {"type": "image", "c": jnp.asarray(c)})
    assert_close(split, np.asarray(got), rtol=1e-5, atol=1e-6,
                 name="control split==full")
