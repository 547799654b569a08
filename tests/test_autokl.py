"""VAE parity: pfd_tpu AutoencoderKL vs the reference torch module, shared weights."""

import jax.numpy as jnp
import numpy as np
import pytest

from pfd_tpu import config, registry
from pfd_tpu.io.convert import torch_sd_to_pytree, pytree_to_torch_sd
from tests import ref_utils
from tests.ref_utils import assert_close


@pytest.fixture(scope="module")
def pair():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.autokl import AutoencoderKL as RefVAE

    ref_utils.seed_all(0)
    cfg = config.model_cfg("autokl_v2")
    ref = RefVAE(ddconfig=cfg["args"]["ddconfig"], lossconfig=None, embed_dim=4)
    ref.eval()
    ours = registry.build_model(cfg)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))
    return ref, ours, params


def test_encode_moments_parity(pair):
    import torch

    ref, ours, params = pair
    ref_utils.seed_all(1)
    x = np.random.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        post = ref.encode(torch.from_numpy(x).permute(0, 3, 1, 2), out_posterior=True)
    mean, logvar = ours.encode_moments(params, jnp.asarray(x))
    assert_close(mean, ref_utils.t2n(post.mean).transpose(0, 2, 3, 1),
                 rtol=1e-3, atol=1e-4, name="vae mean")
    assert_close(logvar, ref_utils.t2n(post.logvar).transpose(0, 2, 3, 1),
                 rtol=1e-3, atol=1e-4, name="vae logvar")


def test_decode_parity(pair):
    import torch

    ref, ours, params = pair
    ref_utils.seed_all(2)
    z = np.random.randn(1, 8, 8, 4).astype(np.float32)
    with torch.no_grad():
        dec = ref.decode(torch.from_numpy(z).permute(0, 3, 1, 2))
    out = ours.decode(params, jnp.asarray(z))
    assert_close(out, ref_utils.t2n(dec).transpose(0, 2, 3, 1),
                 rtol=1e-3, atol=1e-4, name="vae decode")


def test_roundtrip_export(pair):
    ref, ours, params = pair
    sd = pytree_to_torch_sd(params)
    ref_sd = ref_utils.sd_numpy(ref)
    assert set(sd) == set(ref_sd)
    for k in sd:
        np.testing.assert_allclose(sd[k], ref_sd[k], err_msg=k)
