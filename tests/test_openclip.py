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
