"""Unit-registry parity vs the reference's get_unit (common/utils.py:41-292).

The registry is dead code in the reference (re-exported, never called —
docs/PARITY.md), but its units define math worth pinning: lrelu_agc,
SpatialEncoding ('se'), RFFEncoding ('rffe'), and the spec-string grammar.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pfd_tpu.ops import units
from tests import ref_utils


@pytest.fixture(scope="module")
def ref():
    ref_utils.load_reference()
    from lib.model_zoo.common import utils as ref_units
    return ref_units


def test_spec_string_grammar(ref):
    # bare name -> the unit itself; args -> partial with parsed kwargs
    spec = "lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=256)"
    got = units.get_unit(spec)
    want = ref.get_unit()(spec)
    assert got.keywords == want.keywords
    assert units.get_unit("none") is None
    assert units.get_unit(None) is None
    # uniform instantiate-then-call contract: function units resolve to a
    # zero-arg factory, like the reference's class registrations
    assert units.get_unit("relusine")() is units.relusine
    assert units.get_unit("lrelu")()(jnp.asarray(-1.0)) == -0.01
    # tuple/list/bool values through the grammar
    kw = units.get_unit("se(in_dim=2, out_dim=8, cat_input=False)").keywords
    assert kw == {"in_dim": 2, "out_dim": 8, "cat_input": False}
    # a tuple value in FINAL position keeps its closing paren (one-layer slice)
    kw = units.get_unit("se(in_dim=2, out_dim=8, k=(1,2))").keywords
    assert kw["k"] == (1, 2)


def test_lrelu_agc_parity(ref):
    import torch
    x = np.random.default_rng(0).standard_normal((4, 8)).astype(np.float32)
    for spec in ["lrelu_agc(alpha=0.2, gain=sqrt_2, clamp=1.5)",
                 "lrelu_agc(alpha=0.1, gain=2)",
                 "lrelu_agc"]:
        got = units.get_unit(spec)()(jnp.asarray(x), gain=0.7)
        want = ref.get_unit()(spec)()(torch.from_numpy(x.copy()), gain=0.7)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-6, atol=1e-6)


def test_spatial_encoding_parity(ref):
    import torch
    x = np.random.default_rng(1).random((5, 2)).astype(np.float32)
    got_unit = units.get_unit("se(in_dim=2, out_dim=16, sigma=4)")()
    want_unit = ref.get_unit()("se(in_dim=2, out_dim=16, sigma=4)")()
    got = got_unit(jnp.asarray(x))
    want = want_unit(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    # feature-map format: reference takes NCHW, pfd_tpu takes NHWC
    fm = np.random.default_rng(2).random((2, 3, 3, 2)).astype(np.float32)
    got = got_unit(jnp.asarray(fm), format="[bs x c x 2D]")
    want = want_unit(torch.from_numpy(fm.transpose(0, 3, 1, 2)),
                     format="[bs x c x 2D]").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_rffe_shape_and_distribution():
    # the reference draws from global NumPy state (unseedable contract);
    # pin shape/spread instead, plus the sin/cos/cat structure via se's path
    unit = units.get_unit("rffe(in_dim=2, out_dim=32, sigma=6)")()
    x = jnp.asarray(np.random.default_rng(3).random((7, 2)), jnp.float32)
    z = unit(x)
    assert z.shape == (7, 2 + 32)
    assert np.isfinite(np.asarray(z)).all()
    assert 2.0 < float(jnp.std(unit.emb)) < 10.0  # ~N(0, 6)


def test_sine_and_relusine(ref):
    import torch
    x = np.linspace(-2, 2, 11, dtype=np.float32)
    got = units.get_unit("sine(freq=3, gain=2)")()(jnp.asarray(x))
    want = ref.get_unit()("sine(freq=3, gain=2)")()(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-6)
    got = units.relusine(jnp.asarray(x))
    want = ref.ReLUSine()(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-6,
                               atol=1e-6)
