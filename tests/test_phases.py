"""Phased turbo schedules (diffusion/ddim.py sample_fn phases=...).

The sharp correctness handle: a phase boundary is always a group boundary,
and caches/deltas never cross groups — so splitting a uniform maximal-turbo
schedule at a group boundary ([(4,2),(4,2)] vs encoder=cfg=deep=2 over 8
steps) must be bit-identical under const extrapolation. Non-uniform phases
are output-changing by design (SSIM-gated on TPU, docs/PARITY.md).
"""

import numpy as np
import jax
import pytest

from tests.test_cfg_reuse import _setup, _ci


def test_phases_const_group_boundary_identity():
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, encoder_interval=2,
                               cfg_interval=2, deep_interval=2)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, phases=[(4, 2), (4, 2)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_phases_three_way_split_identity():
    """[(2,2),(4,2),(2,2)] is the same group sequence as uniform k=2."""
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, encoder_interval=2,
                               cfg_interval=2, deep_interval=2)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables,
                               phases=[(2, 2), (4, 2), (2, 2)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_phases_exact_head_matches_manual_composition():
    """A k=1 head phase runs the exact sampler; the turbo tail must then be
    independent of HOW the head was computed — [(8,1)] == plain sampler."""
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, phases=[(8, 1)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_phases_dense_early_sparse_late_finite_and_deterministic():
    params, sampler, tables, c, x0 = _setup()
    kw = dict(phases=[(2, 1), (6, 3)])
    a, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                             _ci(c, 2.0), tables, **kw)
    b, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                             _ci(c, 2.0), tables, **kw)
    u, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                             _ci(c, 2.0), tables, encoder_interval=2,
                             cfg_interval=2, deep_interval=2)
    an = np.asarray(a)
    assert np.isfinite(an).all()
    np.testing.assert_array_equal(an, np.asarray(b))
    assert not np.allclose(an, np.asarray(u))


def test_phases_linear_slope_resets_per_phase():
    """Linear extrapolation with a phase split differs from the uniform
    linear run (the second phase's first group extrapolates with zero
    slope), but stays finite; the const split stays identical."""
    params, sampler, tables, c, x0 = _setup()
    uni, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, encoder_interval=2,
                               cfg_interval=2, deep_interval=2,
                               cfg_extrapolate="linear")
    ph, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                              _ci(c, 2.0), tables, phases=[(4, 2), (4, 2)],
                              cfg_extrapolate="linear")
    a = np.asarray(ph)
    assert np.isfinite(a).all()
    assert not np.allclose(a, np.asarray(uni))


def test_phases_trailing_partial_group_inside_phase():
    """A phase whose length is not a multiple of its interval uses the same
    trailing-partial-group schedule as the uniform path: [(8,3)] == uniform
    k=3 maximal turbo (8 % 3 == 2)."""
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, encoder_interval=3,
                               cfg_interval=3, deep_interval=3)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, phases=[(8, 3)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_phases_single_tail_group():
    """The ph10x2_40x40 shape at test scale: the whole tail phase is ONE
    reuse group. [(8,8)] must equal uniform k=8 (group-boundary identity
    with a single group); [(2,1),(6,6)] must be finite + deterministic."""
    params, sampler, tables, c, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, encoder_interval=8,
                               cfg_interval=8, deep_interval=8)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, 2.0), tables, phases=[(8, 8)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)
    kw = dict(phases=[(2, 1), (6, 6)])
    a, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                             _ci(c, 2.0), tables, **kw)
    b, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                             _ci(c, 2.0), tables, **kw)
    an = np.asarray(a)
    assert np.isfinite(an).all()
    np.testing.assert_array_equal(an, np.asarray(b))


def test_phases_validation_errors():
    params, sampler, tables, c, x0 = _setup()
    with pytest.raises(ValueError):  # wrong total
        sampler.sample_fn(params, jax.random.PRNGKey(2), x0, _ci(c, 2.0),
                          tables, phases=[(4, 2), (3, 2)])
    with pytest.raises(ValueError):  # uniform intervals must stay 1
        sampler.sample_fn(params, jax.random.PRNGKey(2), x0, _ci(c, 2.0),
                          tables, phases=[(8, 2)], cfg_interval=2)
    with pytest.raises(ValueError):  # phases require CFG
        sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                          {"conditioning": c,
                           "unconditional_conditioning": None,
                           "unconditional_guidance_scale": 1.0},
                          tables, phases=[(8, 2)])
