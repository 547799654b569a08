"""Pipeline checkpoint hot-swap contract (app.py:137-195 semantics), on tiny
models with synthetic safetensors zoo checkpoints."""

import os

import numpy as np
import jax
import pytest

from pfd_tpu.io.convert import pytree_to_torch_sd
from pfd_tpu.pipeline import PromptFreeDiffusionPipeline
from tests import ref_utils
from tests.test_dp_serving import TINY_UNET, TINY_SEECODER

# f=8 VAE (4 levels) so the ControlNet hint pyramid (fixed 8x, matching the
# production AutoKL) aligns with the latent grid
TINY_VAE = {"type": "autoencoderkl",
            "args": {"embed_dim": 4,
                     "ddconfig": {"double_z": True, "z_channels": 4,
                                  "resolution": 64, "in_channels": 3,
                                  "out_ch": 3, "ch": 32, "ch_mult": [1, 1, 2, 2],
                                  "num_res_blocks": 1, "attn_resolutions": []}}}

TINY_CTL = {"type": "controlnet",
            "args": dict(in_channels=4, hint_channels=3, model_channels=32,
                         attention_resolutions=[1, 2], num_res_blocks=1,
                         channel_mult=[1, 2], num_heads=8, context_dim=768)}

TINY_PFD = {
    "type": "pfd_with_control",
    "args": {
        "vae_cfg_list": [["image", TINY_VAE]],
        "ctx_cfg_list": [["image", TINY_SEECODER]],
        "diffuser_cfg_list": [["image", TINY_UNET]],
        "latent_scale_factor": {"image": 0.18215},
        "beta_linear_start": 0.00085, "beta_linear_end": 0.012,
        "timesteps": 1000, "ctl_cfg": TINY_CTL,
    },
}


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    root = tmp_path_factory.mktemp("zoo")
    pipe = PromptFreeDiffusionPipeline(
        fp16=False, config_override=TINY_PFD, pretrained_root=str(root),
        tag_ctx="SeeCoder", tag_diffuser="SD-v1.5", tag_ctl="canny")
    pipe.ddim_steps = 2
    pipe.params = ref_utils.dezero_pytree(pipe.params, key=3)
    return pipe, str(root)


def _write_diffuser_ckpt(pipe, root, rel, seed, context_under_text):
    """Synthesize a zoo diffuser checkpoint in the pfd torch key layout."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    tree = jax.tree.map(
        lambda a: rng.standard_normal(a.shape).astype(np.float32) * 0.03,
        jax.tree.map(np.asarray, pipe.params["diffuser"]))
    sd = pytree_to_torch_sd(tree, prefix="diffuser.")
    if context_under_text:
        # zoo checkpoints carry context weights under diffuser.text.*
        sd = {k.replace("diffuser.image.context_blocks.",
                        "diffuser.text.context_blocks."): v
              for k, v in sd.items()}
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
    return tree


def test_diffuser_hotswap_with_text_rename(pipe):
    pipe, root = pipe
    from pfd_tpu import zoo

    want = _write_diffuser_ckpt(pipe, root, zoo.DIFFUSER_PATH["SD-v1.5"],
                                seed=7, context_under_text=True)
    pipe.action_load_diffuser("SD-v1.5")
    got = jax.tree.map(np.asarray, pipe.params["diffuser"])
    leaf_w = want["image"]["data_blocks"]["0"]["0"]["kernel"]
    leaf_g = got["image"]["data_blocks"]["0"]["0"]["kernel"]
    np.testing.assert_allclose(leaf_g, leaf_w, rtol=1e-6)
    # the text->image context rename happened (app.py:148-152)
    ctx_w = want["image"]["context_blocks"]["0"]["0"]["norm"]["scale"]
    ctx_g = got["image"]["context_blocks"]["0"]["0"]["norm"]["scale"]
    np.testing.assert_allclose(ctx_g, ctx_w, rtol=1e-6)


def test_hotswap_keeps_jit_cache(pipe):
    pipe, root = pipe
    ref = np.random.rand(64, 64, 3).astype(np.float32)
    out1 = pipe.action_inference(ref, None, "none", False, 64, 64, 2.0, 1)
    n_compiled = len(pipe._jit_cache)
    # swap weights (same structure) -> same compiled program, new outputs
    _write_diffuser_ckpt(pipe, root,
                         __import__("pfd_tpu.zoo", fromlist=["zoo"]).DIFFUSER_PATH["Anything-v4"],
                         seed=11, context_under_text=False)
    pipe.action_load_diffuser("Anything-v4")
    out2 = pipe.action_inference(ref, None, "none", False, 64, 64, 2.0, 1)
    assert len(pipe._jit_cache) == n_compiled, "hot-swap must not recompile"
    assert not np.allclose(out1[0], out2[0]), "new weights must change output"
