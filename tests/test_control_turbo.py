"""ControlNet composed with the turbo samplers (encoder propagation +
CFG-delta reuse).

The control residuals are pre-added into the encoder cache
(models/unet.py apply_encoder: hs+ccs, h+mid_cc — reference pop-order
pfd.py:515-519), so decoder-only reuse steps are exactly as consistent as
the gated no-control case: stale control residuals ride the same cache as
stale skips. Correctness handles mirror tests/test_cfg_reuse.py: at
guidance scale 1.0 every composition must reproduce its non-reuse
counterpart bit-for-bit (up to batch-separability tolerance).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu import registry
from pfd_tpu.diffusion.ddim import DDIMSampler
from tests import ref_utils
from tests.test_training import TINY_UNET

TINY_CTL = {"type": "controlnet",
            "args": dict(in_channels=4, hint_channels=3, model_channels=32,
                         attention_resolutions=[1, 2], num_res_blocks=1,
                         channel_mult=[1, 2], num_heads=8, context_dim=64)}


def _setup(steps=8):
    model = registry.get("pfd_with_control")(
        vae_cfg_list=[], ctx_cfg_list=[],
        diffuser_cfg_list=[["image", TINY_UNET]], ctl_cfg=TINY_CTL,
        beta_linear_start=0.00085, beta_linear_end=0.012, timesteps=1000)
    params = ref_utils.dezero_pytree(model.init(jax.random.PRNGKey(0)))
    sampler = DDIMSampler(model)
    tables = sampler.make_tables(steps, 0.0)
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.standard_normal((1, 9, 64)), jnp.float32)
    hint = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4), jnp.float32)
    return params, sampler, tables, c, hint, x0


def _ci(c, hint, scale):
    return {"conditioning": c, "unconditional_conditioning": jnp.zeros_like(c),
            "unconditional_guidance_scale": scale, "control": hint}


@pytest.mark.parametrize("k", [2, 3])
def test_control_cfg_reuse_scale1_exact(k):
    """CFG-delta reuse with a live ControlNet: at scale 1 the reuse steps
    (ControlNet + UNet on the conditional half only) must reproduce the
    exact sampler."""
    params, sampler, tables, c, hint, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, hint, 1.0), tables)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, hint, 1.0), tables, cfg_interval=k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_control_encoder_propagation_composes_with_cfg_reuse():
    """Composed turbos with control at scale 1 == encoder propagation alone
    with control (the cached conditional half carries the pre-added control
    residuals)."""
    params, sampler, tables, c, hint, x0 = _setup()
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, hint, 1.0), tables, encoder_interval=2)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, hint, 1.0), tables, encoder_interval=2,
                               cfg_interval=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_control_encoder_propagation_guided_ballpark():
    """scale 2, interval 2: output-changing (ControlNet skipped on non-key
    steps via the cache) but finite and distributionally sane; the hint
    still steers — different hints give different outputs."""
    params, sampler, tables, c, hint, x0 = _setup()
    exact, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                                 _ci(c, hint, 2.0), tables)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, hint, 2.0), tables, encoder_interval=2,
                               cfg_interval=2)
    a, r = np.asarray(out), np.asarray(exact)
    assert np.isfinite(a).all()
    assert not np.allclose(a, r)
    assert abs(a.std() - r.std()) < 1.0
    out2, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                                _ci(c, hint * 0.0, 2.0), tables,
                                encoder_interval=2, cfg_interval=2)
    assert not np.allclose(np.asarray(out2), a)


def test_control_phased_scale1_exact():
    """Phased schedules with a live ControlNet: a single (8, 2) phase must
    reproduce the uniform turbo2+cfg2+deep2 composition (phases ride the
    cfg-reuse group scan WITH the encoder+deep caches; control residuals
    ride the encoder cache) — backs the ctl_int8_ph* gate rows
    (GATE_SET=control quant_gate)."""
    params, sampler, tables, c, hint, x0 = _setup(steps=8)
    ref, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, hint, 1.0), tables, encoder_interval=2,
                               cfg_interval=2, deep_interval=2)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, hint, 1.0), tables,
                               phases=[(8, 2)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_control_phased_guided_runs():
    """Guided phased control (the ctl_ph10x2_40x8-shaped schedule scaled to
    8 steps): finite, hint-sensitive, output-changing vs exact."""
    params, sampler, tables, c, hint, x0 = _setup(steps=8)
    exact, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                                 _ci(c, hint, 2.0), tables)
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                               _ci(c, hint, 2.0), tables,
                               phases=[(2, 1), (6, 3)])
    a = np.asarray(out)
    assert np.isfinite(a).all()
    assert not np.allclose(a, np.asarray(exact))
    out2, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                                _ci(c, hint * 0.0, 2.0), tables,
                                phases=[(2, 1), (6, 3)])
    assert not np.allclose(np.asarray(out2), a)


def test_control_mask_zero_equals_no_hint():
    """control_mask 0 must reproduce the no-control trajectory exactly (the
    reference's ccs_zeros pops 0, pfd.py:475-478) and mask 1 the with-hint
    one — the per-request gating contract behind ZooServer mixed batches,
    here at the sampler level with a 2-request batch (one on, one off)."""
    params, sampler, tables, c, hint, x0 = _setup()
    b2 = lambda t: jnp.concatenate([t, t], axis=0)
    ci = _ci(b2(c), b2(hint), 2.0)
    ci["control_mask"] = jnp.asarray([1.0, 0.0])
    out, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), b2(x0), ci,
                               tables)
    with_hint, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                                     _ci(c, hint, 2.0), tables)
    no_hint_ci = _ci(c, hint, 2.0)
    del no_hint_ci["control"]
    no_hint, _ = sampler.sample_fn(params, jax.random.PRNGKey(2), x0,
                                   no_hint_ci, tables)
    # batch-2 vs batch-1 accumulation differences (XLA fuses per batch
    # shape) leave ~1e-5 float noise — the batch-separability tolerance
    np.testing.assert_allclose(np.asarray(out)[:1], np.asarray(with_hint),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out)[1:], np.asarray(no_hint),
                               rtol=2e-4, atol=2e-5)
