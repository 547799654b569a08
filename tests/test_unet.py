"""UNet parity vs reference UNetModel2D_Next, shared weights.

The reference UNet's own .forward has a dead-code bug (iterates i_order in the
output loop, openaimodel.py:2801); the live execution path is
pfd.apply_model's walk (pfd.py:496-527). We drive the reference modules with
that exact walk here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pfd_tpu import config, registry
from pfd_tpu.io.convert import torch_sd_to_pytree
from tests import ref_utils
from tests.ref_utils import assert_close

TINY = dict(in_channels=4, out_channels=4, model_channels=32,
            attention_resolutions=[1, 2], num_res_blocks=[1, 1],
            channel_mult=[1, 2], num_heads=4, context_dim=64)


def ref_unet_walk(net, x, timesteps, context):
    """The live apply_model walk (pfd.py:481-527), driving reference modules."""
    import torch
    from lib.model_zoo.openaimodel import timestep_embedding

    t_emb = timestep_embedding(timesteps, net.model_channels, repeat_only=False)
    emb = net.time_embed(t_emb)
    d_iter = iter(net.data_blocks)
    c_iter = iter(net.context_blocks)
    hs, h = [], x
    for ltype in net.i_order:
        if ltype == "d":
            h = next(d_iter)(h, emb, None)
        elif ltype == "c":
            h = next(c_iter)(h, emb, context)
        elif ltype == "save_hidden_feature":
            hs.append(h)
    for ltype in net.m_order:
        if ltype == "d":
            h = next(d_iter)(h, emb, None)
        elif ltype == "c":
            h = next(c_iter)(h, emb, context)
    for ltype in net.o_order:
        if ltype == "load_hidden_feature":
            h = torch.cat([h, hs.pop()], dim=1)
        elif ltype == "d":
            h = next(d_iter)(h, emb, None)
        elif ltype == "c":
            h = next(c_iter)(h, emb, context)
    return h


def make_pair(cfg_args):
    ref_utils.load_reference()
    from lib.model_zoo.openaimodel import UNetModel2D_Next

    ref_utils.seed_all(0)
    ref = UNetModel2D_Next(**cfg_args).eval()
    ref_utils.randomize_params(ref, seed=7)  # de-zero the zero-init convs
    ours = registry.get("openai_unet_2d_next")(**cfg_args)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))
    return ref, ours, params


def test_plan_matches_reference_orders():
    ref, ours, _ = make_pair(TINY)

    def to_ops(order):
        out = []
        for o in order:
            out.append({"d": "d", "c": "c", "save_hidden_feature": "save",
                        "load_hidden_feature": "load"}[o])
        return out

    assert [op[0] for op in ours.plan.i_ops] == to_ops(ref.i_order)
    assert [op[0] for op in ours.plan.m_ops] == to_ops(ref.m_order)
    assert [op[0] for op in ours.plan.o_ops] == to_ops(ref.o_order)
    assert len(ours.plan.data_specs) == len(ref.data_blocks)
    assert len(ours.plan.context_specs) == len(ref.context_blocks)


def test_sd15_plan_shape():
    """The production config must produce the canonical 30/16 block split
    (SURVEY §2.5; tools/model_conversion.py key space)."""
    cfg = config.model_cfg("openai_unet_2d_v1")
    net = registry.build_model(cfg)
    assert len(net.plan.data_specs) == 30
    assert len(net.plan.context_specs) == 16


def test_tiny_unet_forward_parity():
    import torch

    ref, ours, params = make_pair(TINY)
    ref_utils.seed_all(1)
    x = np.random.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([3, 977], np.int64)
    c = np.random.randn(2, 9, 64).astype(np.float32)
    with torch.no_grad():
        want = ref_unet_walk(ref, torch.from_numpy(x), torch.from_numpy(t),
                             torch.from_numpy(c))
    got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t), jnp.asarray(c))
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=2e-3, atol=2e-4, name="tiny unet eps")


@pytest.mark.slow
def test_sd15_unet_forward_parity():
    import torch

    cfg = config.model_cfg("openai_unet_2d_v1")
    ref_utils.load_reference()
    from lib.model_zoo.openaimodel import UNetModel2D_Next

    ref_utils.seed_all(2)
    ref = UNetModel2D_Next(**cfg["args"]).eval()
    ref_utils.randomize_params(ref, scale=0.02, seed=8)
    ours = registry.build_model(cfg)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    x = np.random.randn(1, 4, 32, 32).astype(np.float32)
    t = np.array([500], np.int64)
    c = np.random.randn(1, 148, 768).astype(np.float32)
    with torch.no_grad():
        want = ref_unet_walk(ref, torch.from_numpy(x), torch.from_numpy(t),
                             torch.from_numpy(c))
    got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t), jnp.asarray(c))
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=2e-3, atol=5e-4, name="sd15 unet eps")


def test_classic_unet_parity():
    """openai_unet (classic sdwebui layout) vs reference openai_unet."""
    import torch
    ref_utils.load_reference()
    from lib.model_zoo.openaimodel import UNetModel as RefClassic

    ref_utils.seed_all(4)
    kw = dict(image_size=None, in_channels=4, out_channels=4, model_channels=32,
              attention_resolutions=[1, 2], num_res_blocks=1, channel_mult=[1, 2],
              num_heads=4, use_spatial_transformer=True, transformer_depth=1,
              context_dim=64, use_checkpoint=False, legacy=False)
    ref = RefClassic(**kw).eval()
    ref_utils.randomize_params(ref, seed=13)
    ours = registry.get("openai_unet")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    x = np.random.randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([3, 977], np.int64)
    c = np.random.randn(2, 9, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                   context=torch.from_numpy(c))
    got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t), jnp.asarray(c))
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=2e-3, atol=2e-4, name="classic unet")


def test_nocontext_parts():
    """parts without 'context' -> no context blocks (reference 2d_next
    parts machinery, openaimodel.py:2616-2619)."""
    net = registry.get("openai_unet_2d_next")(
        **dict(TINY, attention_resolutions=[1, 2]), parts=("global", "data"))
    assert len(net.plan.context_specs) == 0
    import jax
    params = net.init(jax.random.PRNGKey(0))
    assert params["context_blocks"] == {}
    x = jnp.zeros((1, 8, 8, 4))
    out = net.apply(params, x, jnp.array([5]), None)
    assert out.shape == x.shape


def test_0d_unet_parity():
    """openai_unet_0d_next (FC/vector diffuser) vs reference, shared weights."""
    import torch
    ref_utils.load_reference()
    from lib.model_zoo.openaimodel import UNetModel0D_Next

    kw = dict(input_channels=24, model_channels=32, output_channels=24,
              context_dim=64, num_noattn_blocks=(1, 1), channel_mult=(1, 2),
              second_dim=(2, 2), with_attn=[True, False], num_heads=4)
    ref_utils.seed_all(6)
    ref = UNetModel0D_Next(**kw).eval()
    ref_utils.randomize_params(ref, seed=17)
    ours = registry.get("openai_unet_0d_next")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    x = np.random.randn(2, 24).astype(np.float32)
    t = np.array([3, 977], np.int64)
    c = np.random.randn(2, 9, 64).astype(np.float32)
    with torch.no_grad():
        want = ref_unet_walk(ref, torch.from_numpy(x), torch.from_numpy(t),
                             torch.from_numpy(c))
    got = ours.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(c))
    w = ref_utils.t2n(want)
    assert_close(got, w.reshape(got.shape), rtol=2e-3, atol=2e-4,
                 name="0d unet")


def test_dual_context_unet_parity():
    import torch
    ref_utils.load_reference()
    from lib.model_zoo.openaimodel import UNetModelDualContext as RefDual

    kw = dict(image_size=None, in_channels=4, out_channels=4, model_channels=32,
              attention_resolutions=[1, 2], num_res_blocks=1, channel_mult=[1, 2],
              num_heads=4, use_spatial_transformer=True, transformer_depth=1,
              context_dim=64, use_checkpoint=False, legacy=False)
    ref_utils.seed_all(9)
    ref = RefDual(**kw).eval()
    ref_utils.randomize_params(ref, seed=19)
    ours = registry.get("openai_unet_dual_context")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    x = np.random.randn(1, 4, 16, 16).astype(np.float32)
    t = np.array([55], np.int64)
    c = np.random.randn(1, 9, 64).astype(np.float32)
    for which in (0, 1):
        with torch.no_grad():
            want = ref(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                       context=torch.from_numpy(c), which_attn=which)
        got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), jnp.asarray(c), which=which)
        assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                     rtol=2e-3, atol=2e-4, name=f"dual unet which={which}")

    # float which blends both branches over a context pair
    c2 = np.random.randn(1, 7, 64).astype(np.float32)
    class CtxList(list):
        # reference dual forward calls context.dtype even for list contexts
        # (openaimodel.py:1921) — a latent bug; shim it
        dtype = torch.float32

    with torch.no_grad():
        want = ref(torch.from_numpy(x), timesteps=torch.from_numpy(t),
                   context=CtxList([torch.from_numpy(c), torch.from_numpy(c2)]),
                   which_attn=0.3)
    got = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t), [jnp.asarray(c), jnp.asarray(c2)],
                     which=0.3)
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=2e-3, atol=2e-4, name="dual unet blend")
