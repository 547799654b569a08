"""VAE GAN-loss stack: LPIPS/discriminator parity + loss protocol smoke."""

import numpy as np
import jax
import jax.numpy as jnp

from pfd_tpu import config, registry
from pfd_tpu.models import autokl_losses as L
from tests import ref_utils
from tests.ref_utils import assert_close


def test_discriminator_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.autokl_utils import NLayerDiscriminator

    ref_utils.seed_all(0)
    ref = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=3).eval()
    ref_utils.randomize_params(ref, seed=31)
    from pfd_tpu.io.convert import torch_sd_to_pytree

    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref), prefix="main.")
    x = np.random.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))
    got = L.discriminator(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert_close(got, ref_utils.t2n(want).transpose(0, 2, 3, 1),
                 rtol=2e-3, atol=1e-3, name="patchgan discriminator")


def test_gan_losses_match_reference():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo import autokl_utils as ref

    # the reference never imports F (autokl_utils.py:283 NameError — its VAE
    # training losses are dead code there); inject to compare the math.
    ref.F = torch.nn.functional

    lr = np.random.randn(2, 1, 6, 6).astype(np.float32)
    lf = np.random.randn(2, 1, 6, 6).astype(np.float32)
    np.testing.assert_allclose(
        float(L.hinge_d_loss(jnp.asarray(lr), jnp.asarray(lf))),
        float(ref.hinge_d_loss(torch.from_numpy(lr), torch.from_numpy(lf))),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(L.vanilla_d_loss(jnp.asarray(lr), jnp.asarray(lf))),
        float(ref.vanilla_d_loss(torch.from_numpy(lr), torch.from_numpy(lf))),
        rtol=1e-6)


def test_vae_gan_training_protocol_smoke():
    """Both optimizer phases produce finite losses and usable grads on a
    tiny VAE (the reference protocol, autokl.py:72-111)."""
    cfg = config.model_cfg("autokl_v2")
    cfg["args"]["ddconfig"].update(ch=32, ch_mult=[1, 2], num_res_blocks=1)
    vae = registry.build_model(cfg)
    vae_params = vae.init(jax.random.PRNGKey(0))
    loss_params = {"lpips": L.init_lpips(jax.random.PRNGKey(1)),
                   "discriminator": L.init_discriminator(jax.random.PRNGKey(2), ndf=8)}
    x = jnp.asarray(np.random.rand(1, 32, 32, 3), jnp.float32)

    (g, aux), grads = jax.value_and_grad(
        lambda vp: L.generator_loss(loss_params, vae, vp, x,
                                    jax.random.PRNGKey(3), global_step=10),
        has_aux=True)(vae_params)
    assert np.isfinite(float(g))
    assert np.isfinite(float(aux["d_weight"]))
    gnorm = float(jax.tree.reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), grads, 0.0))
    assert gnorm > 0

    (d, daux), dgrads = jax.value_and_grad(
        lambda lp: L.discriminator_loss(lp, vae, vae_params, x,
                                        jax.random.PRNGKey(4), global_step=10),
        has_aux=True)({"discriminator": loss_params["discriminator"]})
    assert np.isfinite(float(d))
