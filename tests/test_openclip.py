"""OpenCLIP text tower: causality + layer-depth behavior (no open_clip in
this env — the reference can't build these either; structural tests only)."""

import numpy as np
import jax
import jax.numpy as jnp

from pfd_tpu import registry
from pfd_tpu.models.clip import init_openclip_text, _openclip_text_transformer


def tiny_params(seed=0):
    return init_openclip_text(jax.random.PRNGKey(seed), num_layers=2, width=32,
                              heads=4, vocab=100, n_ctx=8, embed_dim=16)


def test_causal_masking():
    params = tiny_params()
    t1 = np.array([[1, 2, 3, 4, 5, 6, 7, 8]]) % 100
    t2 = t1.copy()
    t2[0, 5:] = [9, 9, 9]  # change only future tokens
    o1 = _openclip_text_transformer(params, jnp.asarray(t1), heads=4, layers_to_run=2)
    o2 = _openclip_text_transformer(params, jnp.asarray(t2), heads=4, layers_to_run=2)
    np.testing.assert_allclose(np.asarray(o1)[:, :5], np.asarray(o2)[:, :5],
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(o1)[:, 5:], np.asarray(o2)[:, 5:])


def test_penultimate_vs_last_layer():
    params = tiny_params()
    enc_last = registry.get("openclip_text_context_encoder_sdv2")(
        num_layers=2, width=32, heads=4, layer="last")
    enc_pen = registry.get("openclip_text_context_encoder_sdv2")(
        num_layers=2, width=32, heads=4, layer="penultimate")
    tokens = np.array([[1, 2, 3, 4, 0, 0, 0, 0]])
    a = enc_last.encode(params, tokens)
    b = enc_pen.encode(params, tokens)
    assert a.shape == b.shape == (1, 8, 32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_projected_variant_shape():
    params = tiny_params()
    enc = registry.get("openclip_text_context_encoder")(
        num_layers=2, width=32, heads=4)
    tokens = np.array([[1, 2, 7, 4, 0, 0, 0, 0], [3, 9, 7, 0, 0, 0, 0, 0]])
    z = enc.encode(params, tokens)
    assert z.shape == (2, 8, 16)
    assert np.isfinite(np.asarray(z)).all()


def test_openclip_image_tower_behavior():
    """openclip_image_context_encoder (reference clip.py:400-492): tower
    shape, cls-norm scaling, and the preserved inverted-mask quirk
    (clip.py:478 pools 1-masks; cls token zeroed)."""
    import numpy as np
    from pfd_tpu import registry

    enc = registry.get("openclip_image_context_encoder")(
        width=32, layers=2, heads=2, patch=8, image_size=32, embed_dim=24)
    params = enc.init(jax.random.PRNGKey(0))
    imgs = np.random.default_rng(0).random((2, 32, 32, 3)).astype(np.float32)

    z = np.asarray(enc.encode(params, imgs))
    assert z.shape == (2, 1 + 16, 24)
    # after x / ||x_pool||, the cls token has unit norm
    np.testing.assert_allclose(np.linalg.norm(z[:, 0], axis=-1), 1.0,
                               rtol=1e-5)

    # inverted-mask quirk: an all-ZERO mask leaves patch tokens unscaled
    # (1-m pools to 1) while the cls token is zeroed ...
    zeros = np.zeros((2, 32, 32, 1), np.float32)
    zm = np.asarray(enc.encode(params, imgs, masks=zeros))
    np.testing.assert_allclose(zm[:, 1:], z[:, 1:], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(zm[:, 0], 0.0, atol=1e-7)
    # ... and an all-ONES mask zeroes everything (faithful to the reference)
    ones = np.ones_like(zeros)
    zo = np.asarray(enc.encode(params, ones * 0 + imgs, masks=ones))
    np.testing.assert_allclose(zo, 0.0, atol=1e-6)
