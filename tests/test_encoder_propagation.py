"""Encoder/decoder split correctness + encoder-propagation sampling."""

import numpy as np
import jax
import jax.numpy as jnp

from pfd_tpu import registry
from pfd_tpu.diffusion.ddim import DDIMSampler
from tests.ref_utils import assert_close
from tests.test_training import TINY_UNET, make_model


from tests import ref_utils


def test_split_equals_full_apply():
    model = make_model()
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)),
                    jnp.float32)
    t = jnp.array([10, 700], jnp.int32)
    c = jnp.asarray(np.random.default_rng(1).standard_normal((2, 9, 64)),
                    jnp.float32)
    full = model.apply_model(params, {"type": "image", "x": x}, t,
                             {"type": "image", "c": c})
    h, hs = model.apply_model_encoder(params, {"type": "image", "x": x}, t,
                                      {"type": "image", "c": c})
    split = model.apply_model_decoder(params, h, hs, t, {"type": "image", "c": c})
    assert_close(split, np.asarray(full), rtol=1e-5, atol=1e-6,
                 name="encoder/decoder split")


def test_encoder_propagation_sampling():
    model = make_model()
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    sampler = DDIMSampler(model)
    tables = sampler.make_tables(8, 0.0)
    c = jnp.zeros((1, 9, 64))
    ci = {"conditioning": c, "unconditional_conditioning": jnp.zeros_like(c),
          "unconditional_guidance_scale": 2.0}
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4), jnp.float32)

    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0, ci, tables)
    turbo, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0, ci, tables,
                                 encoder_interval=2)
    assert np.isfinite(np.asarray(turbo)).all()
    # interval=1 through the cached path must match the plain path exactly
    same, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0, ci, tables,
                                encoder_interval=1)
    np.testing.assert_allclose(np.asarray(same), np.asarray(ref), rtol=1e-6)
    # turbo differs but stays in the same distributional ballpark
    assert not np.allclose(np.asarray(turbo), np.asarray(ref))
    assert abs(np.asarray(turbo).std() - np.asarray(ref).std()) < 1.0
