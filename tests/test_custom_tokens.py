"""Customized-token encoders + LoRA utilities (no tokenizer weights needed:
pre-tokenized paths + split/merge math)."""

import numpy as np
import jax
import jax.numpy as jnp

from pfd_tpu.models.clip import (_split_custom_tokens, _pad_rows,
                                 init_openclip_text)
from pfd_tpu import registry
from pfd_tpu.training import lora


def test_split_custom_tokens():
    # vocab of 10 regular tokens; ids >= 10 are custom
    r, c, m = _split_custom_tokens([[1, 2, 10, 3], [11, 4]], 10, texpand=1)
    assert r[0] == [1, 2, 0, 3] and c[0] == [0, 0, 0, 0] and m[0] == [0, 0, 1, 0]
    assert r[1] == [0, 4] and c[1] == [1, 4][0:1] + [0] and m[1] == [1, 0]

    r, c, m = _split_custom_tokens([[1, 11, 2]], 10, texpand=3)
    assert r[0] == [1, 0, 0, 0, 2]
    assert c[0] == [0, 3, 4, 5, 0]
    assert m[0] == [0, 1, 1, 1, 0]


def test_v1_output_replacement():
    enc = registry.get("openclip_text_context_encoder_sdv2_customized_tokenizer_v1")(
        customized_tokens=["<cat>"], num_layers=2, width=32, heads=4)
    params = init_openclip_text(jax.random.PRNGKey(0), num_layers=2, width=32,
                                heads=4, vocab=100, n_ctx=8, embed_dim=16)
    params.update(enc.init_custom(jax.random.PRNGKey(1), 32))

    # bypass the tokenizer: emulate its output triples
    enc.tokenize = lambda text, texpand=1: (
        np.array([[1, 2, 0, 3, 0, 0, 0, 0]], np.int32),
        np.array([[0, 0, 0, 0, 0, 0, 0, 0]], np.int32),
        np.array([[0, 0, 1, 0, 0, 0, 0, 0]], np.int32))
    z = enc.encode(params, ["ignored"])
    custom = np.asarray(params["customized_token_embedding"]["weight"][0])
    np.testing.assert_allclose(np.asarray(z)[0, 2], custom, rtol=1e-6)


def test_v2_input_injection_changes_output():
    enc = registry.get("openclip_text_context_encoder_sdv2_customized_tokenizer_v2")(
        customized_tokens=["<cat>"], num_layers=2, width=32, heads=4)
    params = init_openclip_text(jax.random.PRNGKey(0), num_layers=2, width=32,
                                heads=4, vocab=100, n_ctx=8, embed_dim=16)
    params.update(enc.init_custom(jax.random.PRNGKey(1), 32))

    def fake_tok(mask_on):
        return lambda text, texpand=1: (
            np.array([[1, 2, 0, 3, 0, 0, 0, 0]], np.int32),
            np.array([[0, 0, 0, 0, 0, 0, 0, 0]], np.int32),
            np.array([[0, 0, int(mask_on), 0, 0, 0, 0, 0]], np.int32))

    enc.tokenize = fake_tok(True)
    z1 = enc.encode(params, ["x"])
    enc.tokenize = fake_tok(False)
    z2 = enc.encode(params, ["x"])
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_lora_merge_equals_bypass():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (16, 24))
    ad = lora.init_adapter(jax.random.PRNGKey(1), 16, 24, rank=4)
    ad["lora_B"] = jax.random.normal(jax.random.PRNGKey(2), (4, 24)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 16))
    y1 = lora.apply_linear(x, w, ad)
    y2 = x @ (w + lora.delta(ad))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-6)

    params = {"resblocks": {"0": {"attn": {"out_proj": {"kernel": w}}}}}
    adapters = lora.init_for_kernels(
        jax.random.PRNGKey(4), params,
        lambda names: "resblocks" in names and names[-2] == "out_proj", rank=4)
    assert "resblocks/0/attn/out_proj" in adapters
    merged = lora.merge(params, adapters)
    # zero-init B -> merge is identity at start
    np.testing.assert_allclose(
        np.asarray(merged["resblocks"]["0"]["attn"]["out_proj"]["kernel"]),
        np.asarray(w), rtol=1e-6)


def _tiny_hf_clip_tree(key, vocab=50, width=32, layers=2, heads=4, n_ctx=8):
    from pfd_tpu.ops import nn as pnn
    ks = iter(jax.random.split(key, 6 * layers + 4))
    lyrs = {}
    for i in range(layers):
        lyrs[str(i)] = {
            "self_attn": {n: pnn.init_linear(next(ks), width, width)
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm1": pnn.init_norm(width),
            "layer_norm2": pnn.init_norm(width),
            "mlp": {"fc1": pnn.init_linear(next(ks), width, width * 4),
                    "fc2": pnn.init_linear(next(ks), width * 4, width)},
        }
    return {"text_model": {
        "embeddings": {
            "token_embedding": {"embedding": jax.random.normal(next(ks), (vocab, width)) * 0.02},
            "position_embedding": {"embedding": jax.random.normal(next(ks), (n_ctx, width)) * 0.01},
        },
        "encoder": {"layers": lyrs},
        "final_layer_norm": pnn.init_norm(width),
    }}


def test_hf_clip_forward_causality_and_injection():
    from pfd_tpu.models.clip import hf_clip_text_forward

    params = _tiny_hf_clip_tree(jax.random.PRNGKey(0))
    t1 = np.array([[1, 2, 3, 4, 5, 6, 7, 8]]) % 50
    t2 = t1.copy(); t2[0, 6] = 9
    o1 = hf_clip_text_forward(params, jnp.asarray(t1), heads=4)
    o2 = hf_clip_text_forward(params, jnp.asarray(t2), heads=4)
    np.testing.assert_allclose(np.asarray(o1)[:, :6], np.asarray(o2)[:, :6],
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(o1)[:, 6:], np.asarray(o2)[:, 6:])

    # embedding injection changes the output from the injected position on
    emb = params["text_model"]["embeddings"]["token_embedding"]["embedding"]
    base = emb[jnp.asarray(t1)]
    injected = base.at[0, 3].set(jnp.ones(32) * 0.5)
    oi = hf_clip_text_forward(params, inputs_embeds=injected, heads=4)
    np.testing.assert_allclose(np.asarray(o1)[:, :3], np.asarray(oi)[:, :3],
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(o1)[:, 3:], np.asarray(oi)[:, 3:])
