"""CFG-delta reuse sampling (diffusion/ddim.py sample_fn cfg_interval).

The sharp correctness handle: at guidance scale 1.0 the extrapolation term
(scale-1)*delta vanishes and every reuse step's e_t equals the plain
conditional epsilon — so cfg_interval=2 must reproduce the exact sampler's
trajectory (the full/reuse steps differ only in model batch, 2n vs n, which
is numerically batch-separable). At scale != 1 the mode is output-changing
by design (SSIM-gated on TPU, docs/PARITY.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu.diffusion.ddim import DDIMSampler
from tests import ref_utils
from tests.test_training import make_model


def _setup(steps=8):
    model = make_model()
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    sampler = DDIMSampler(model)
    tables = sampler.make_tables(steps, 0.0)
    c = jnp.asarray(np.random.default_rng(3).standard_normal((1, 9, 64)),
                    jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4), jnp.float32)
    return params, sampler, tables, c, x0


def _ci(c, scale):
    return {"conditioning": c, "unconditional_conditioning": jnp.zeros_like(c),
            "unconditional_guidance_scale": scale}


@pytest.mark.parametrize("k", [2, 3, 4, 5])
def test_cfg_reuse_scale1_exact(k):
    # k=3/k=5 with 8 steps also exercise the trailing partial group
    # (8 % 3 == 2, 8 % 5 == 3); k=4 divides evenly.
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 1.0), tables)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 1.0), tables, cfg_interval=k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("k", [2, 3, 4, 5])
def test_cfg_reuse_scale1_exact_with_encoder_cache(k):
    """Composed with encoder propagation at the same interval, scale 1 must
    match encoder propagation ALONE (the delta term vanishes; reuse steps
    decode the cached conditional half)."""
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 1.0), tables, encoder_interval=k)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 1.0), tables, encoder_interval=k,
                               cfg_interval=k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_cfg_reuse_lead_in_remainder():
    """n_steps not divisible by the interval: the remainder runs as unrolled
    full-CFG lead-in steps. At scale 1 the whole trajectory is still exact."""
    params, sampler, tables, c, x0 = _setup(steps=5)
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 1.0), tables)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 1.0), tables, cfg_interval=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_cfg_reuse_guided_ballpark():
    """scale=2: output-changing but distributionally sane, and pred_x0 is
    returned from the last (reuse) step."""
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables)
    out, extra = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                                   _ci(c, 2.0), tables, cfg_interval=2)
    a, r = np.asarray(out), np.asarray(ref)
    assert np.isfinite(a).all()
    assert extra["pred_x0"].shape == x0.shape
    assert not np.allclose(a, r)
    assert abs(a.std() - r.std()) < 1.0


def test_cfg_reuse_mismatched_encoder_interval_rejected():
    params, sampler, tables, c, x0 = _setup()
    with pytest.raises(ValueError, match="cfg_interval"):
        sampler.sample_fn(params, jax.random.PRNGKey(2), x0, _ci(c, 2.0),
                          tables, encoder_interval=3, cfg_interval=2)


def test_cfg_reuse_no_cfg_falls_through():
    """Without unconditional conditioning the flag is inert (the plain path
    runs, including the reference's no-uncond scale quirk)."""
    params, sampler, tables, c, x0 = _setup()
    ci = {"conditioning": c, "unconditional_conditioning": None,
          "unconditional_guidance_scale": 1.0}
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0, ci, tables)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0, ci, tables,
                               cfg_interval=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("k", [2, 3, 5])
def test_cfg_reuse_linear_extrapolation_scale1_exact(k):
    """cfg_extrapolate='linear' keeps the scale-1 exactness (the whole delta
    term — constant or extrapolated — is multiplied by scale-1 == 0). k=5
    exercises the trailing partial group with a live slope carry."""
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 1.0), tables)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 1.0), tables, cfg_interval=k,
                               cfg_extrapolate="linear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_cfg_reuse_linear_differs_from_const_when_guided():
    """At scale 2 the first-order extrapolation actually changes reuse
    steps (slope term live from the second group on) but stays finite and
    distributionally sane."""
    params, sampler, tables, c, x0 = _setup()
    con, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, cfg_interval=2)
    lin, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, cfg_interval=2,
                               cfg_extrapolate="linear")
    a, b = np.asarray(lin), np.asarray(con)
    assert np.isfinite(a).all()
    assert not np.allclose(a, b)
    assert abs(a.std() - b.std()) < 1.0


def test_cfg_reuse_linear_first_group_matches_const():
    """With a single group (n_steps == k) there is no previous delta, so the
    slope is zero and linear ≡ const — the valid-flag init in the carry."""
    params, sampler, tables, c, x0 = _setup(steps=2)
    con, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, cfg_interval=2)
    lin, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, cfg_interval=2,
                               cfg_extrapolate="linear")
    np.testing.assert_allclose(np.asarray(lin), np.asarray(con),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("k", [3, 5])
def test_cfg_reuse_linear_scale1_exact_full_composition(k):
    """linear extrapolation composed with encoder propagation AND DeepCache
    at the same interval, scale 1: must equal encoder propagation alone
    composed with DeepCache (the delta term still vanishes). k=5 with 8
    steps exercises the trailing partial group inside the composition."""
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 1.0), tables, encoder_interval=k,
                               cfg_interval=k, deep_interval=k)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 1.0), tables, encoder_interval=k,
                               cfg_interval=k, deep_interval=k,
                               cfg_extrapolate="linear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_cfg_reuse_linear_guided_composition_finite():
    """Guided (scale 2) linear + turbo + deep composition stays finite and
    differs from the const composition (the slope term is live)."""
    params, sampler, tables, c, x0 = _setup()
    con, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, encoder_interval=2,
                               cfg_interval=2, deep_interval=2)
    lin, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, encoder_interval=2,
                               cfg_interval=2, deep_interval=2,
                               cfg_extrapolate="linear")
    a, b = np.asarray(lin), np.asarray(con)
    assert np.isfinite(a).all()
    assert not np.allclose(a, b)
