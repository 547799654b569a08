"""Fused GN+SiLU+conv3x3 Pallas kernel vs the plain ops.nn composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfd_tpu.ops import nn
from pfd_tpu.ops import fused_conv as fc
from tests.ref_utils import assert_close


def plain(x, norm_p, conv_p, *, groups, eps, shift=None, residual=None):
    if shift is not None:
        x = x + shift[:, None, None, :].astype(x.dtype)
    h = nn.group_norm(x, norm_p, groups=groups, eps=eps)
    h = nn.silu(h)
    h = nn.conv2d(h, conv_p, padding=1)
    if residual is not None:
        h = h + residual
    return h


@pytest.mark.parametrize("shape,cout,groups", [
    ((2, 16, 16, 64), 64, 32),
    ((1, 8, 24, 32), 48, 16),   # non-square, cin != cout
    ((2, 32, 8, 64), 32, 32),   # multiple row tiles
])
def test_fused_matches_plain(shape, cout, groups):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    b, h, w, cin = shape
    x = jax.random.normal(ks[0], shape, jnp.float32)
    norm_p = {"scale": jax.random.normal(ks[1], (cin,)) * 0.2 + 1.0,
              "bias": jax.random.normal(ks[2], (cin,)) * 0.1}
    conv_p = nn.init_conv(ks[3], 3, 3, cin, cout, jnp.float32)
    res = jax.random.normal(ks[4], (b, h, w, cout), jnp.float32)

    want = plain(x, norm_p, conv_p, groups=groups, eps=1e-5, residual=res)
    got = fc.gn_silu_conv3x3(x, norm_p, conv_p, groups=groups, eps=1e-5,
                             residual=res, interpret=True)
    assert_close(got, want, rtol=2e-4, atol=2e-4, name="fused gn-silu-conv")


def test_fused_shift_fold():
    """The time-embedding shift folded into the affine == materialized add."""
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 5)
    b, h, w, cin, cout = 2, 16, 16, 64, 64
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
    shift = jax.random.normal(ks[1], (b, cin), jnp.float32)
    norm_p = {"scale": jnp.ones((cin,)) * 1.3, "bias": jnp.ones((cin,)) * 0.05}
    conv_p = nn.init_conv(ks[2], 3, 3, cin, cout, jnp.float32)

    want = plain(x, norm_p, conv_p, groups=32, eps=1e-5, shift=shift)
    got = fc.gn_silu_conv3x3(x, norm_p, conv_p, groups=32, eps=1e-5,
                             shift=shift, interpret=True)
    assert_close(got, want, rtol=2e-4, atol=2e-4, name="fused shift fold")


def test_fused_bf16():
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 4)
    b, h, w, cin, cout = 1, 16, 16, 64, 64
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.bfloat16)
    norm_p = {"scale": jnp.ones((cin,), jnp.bfloat16),
              "bias": jnp.zeros((cin,), jnp.bfloat16)}
    conv_p = nn.init_conv(ks[1], 3, 3, cin, cout, jnp.bfloat16)
    want = plain(x, norm_p, conv_p, groups=32, eps=1e-5)
    got = fc.gn_silu_conv3x3(x, norm_p, conv_p, groups=32, eps=1e-5,
                             interpret=True)
    assert_close(np.asarray(got, np.float32), np.asarray(want, np.float32),
                 rtol=3e-2, atol=3e-2, name="fused bf16")
