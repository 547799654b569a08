"""DeepCache (arXiv:2312.00858) — deep-decoder-branch caching in the DDIM
group scan (diffusion/ddim.py deep_interval).

The mechanism's exactness handle: the decoder SPLIT itself is an identity —
running apply_model_decoder_deep then apply_model_decoder_shallow must equal
apply_model_decoder bit-for-bit, and apply_model_encoder_shallow must equal
the first n shallow saves of apply_model_encoder. The cross-step CACHING is
output-changing by design at every guidance scale (stale deep features), so
the sampler-level checks are structural (runs, finite, actually diverges
from the exact trajectory) and the quality claim lives in the TPU SSIM
gates (tools/e2e_gate.py / quant_gate.py rows, docs/PARITY.md).

No reference counterpart: the reference runs the full UNet every step
(lib/model_zoo/ddim.py:145-150).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu.diffusion.ddim import DDIMSampler
from tests import ref_utils
from tests.test_cfg_reuse import _setup, _ci


def test_decoder_split_is_identity():
    params, sampler, tables, c, x0 = _setup()
    model = sampler.model
    ts = jnp.full((1,), 500, jnp.int32)
    ci = {"type": "image", "c": c}
    xi = {"type": "image", "x": x0}
    h_mid, hs = model.apply_model_encoder(params, xi, ts, ci)
    ref = model.apply_model_decoder(params, h_mid, hs, ts, ci)
    n_sh = model.deep_split_skips("image")
    h_deep = model.apply_model_decoder_deep(params, h_mid, hs[n_sh:], ts, ci)
    out = model.apply_model_decoder_shallow(params, h_deep, hs[:n_sh], ts, ci)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_encoder_shallow_matches_full_encoder_prefix():
    params, sampler, tables, c, x0 = _setup()
    model = sampler.model
    ts = jnp.full((1,), 500, jnp.int32)
    ci = {"type": "image", "c": c}
    xi = {"type": "image", "x": x0}
    _, hs = model.apply_model_encoder(params, xi, ts, ci)
    n_sh = model.deep_split_skips("image")
    hs_sh = model.apply_model_encoder_shallow(params, xi, ts, ci)
    assert len(hs_sh) == n_sh
    for a, b in zip(hs_sh, hs[:n_sh]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("enc_interval", [1, 2])
def test_deepcache_sampler_runs_and_changes_output(enc_interval):
    params, sampler, tables, c, x0 = _setup()
    exact, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                                 _ci(c, 2.0), tables)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables,
                               encoder_interval=enc_interval,
                               cfg_interval=2, deep_interval=2)
    out = np.asarray(out)
    assert out.shape == exact.shape
    assert np.isfinite(out).all()
    # caching is output-changing by design (stale deep features)
    assert not np.allclose(out, np.asarray(exact), atol=1e-5)
    # ...but it must stay a small perturbation of the exact trajectory at
    # this tiny operating point, not a divergent one
    rel = np.linalg.norm(out - np.asarray(exact)) / np.linalg.norm(exact)
    assert rel < 0.5, f"deepcache trajectory diverged: rel err {rel:.3f}"


def test_deepcache_requires_matching_cfg_interval():
    params, sampler, tables, c, x0 = _setup()
    with pytest.raises(ValueError, match="deep_interval"):
        sampler.sample_fn(params, jax.random.PRNGKey(2), x0, _ci(c, 2.0),
                          tables, deep_interval=2)


@pytest.mark.parametrize("k", [3, 4, 5])
def test_deepcache_trailing_partial_group(k):
    # 8 steps / k=3,5 exercise the unrolled trailing group with deep
    # caches (8 % 3 == 2, 8 % 5 == 3); k=4 divides evenly.
    params, sampler, tables, c, x0 = _setup()
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, encoder_interval=k,
                               cfg_interval=k, deep_interval=k)
    assert np.isfinite(np.asarray(out)).all()
