"""Random-init annotator nets (nets/_specs.py + init_from_spec): every heavy
annotator must run shape-correct WITHOUT its pretrained checkpoint, so the
preprocess stack can be timed (bench #4) and smoke-driven anywhere. The spec
strings are mechanically dumped from the reference architectures; the parity
tests (test_annotators/test_openpose) remain the weight-level evidence.
"""

import numpy as np
import jax
import pytest

from pfd_tpu import annotators


def test_hed_random_init_forward():
    from pfd_tpu.annotators.nets import hed
    p = hed.init_params(jax.random.PRNGKey(0))
    img = np.random.default_rng(0).random((40, 48, 3), np.float32)
    out = annotators.preprocess(img, method="hed", size=(40, 48), params=p)
    assert out.shape == (40, 48, 3) and np.isfinite(out).all()


def test_pidinet_random_init_forward():
    from pfd_tpu.annotators.nets import pidinet
    p = pidinet.init_params(jax.random.PRNGKey(1))
    img = np.random.default_rng(1).random((32, 32, 3), np.float32)
    out = annotators.preprocess(img, method="scribble", size=(32, 32),
                                params=p)
    assert out.shape == (32, 32, 3) and np.isfinite(out).all()


def test_mlsd_random_init_forward():
    from pfd_tpu.annotators.nets import mlsd
    p = mlsd.init_params(jax.random.PRNGKey(2))
    img = np.random.default_rng(2).random((64, 64, 3), np.float32)
    out = annotators.preprocess(img, method="mlsd", size=(64, 64), params=p)
    assert out.shape == (64, 64, 3) and np.isfinite(out).all()


def test_midas_random_init_forward():
    from pfd_tpu.annotators.nets import midas
    p = midas.init_params(jax.random.PRNGKey(3))
    img = np.random.default_rng(3).random((64, 64, 3), np.float32)
    out = annotators.preprocess(img, method="depth", size=(64, 64), params=p)
    assert out.shape == (64, 64, 3) and np.isfinite(out).all()


@pytest.mark.slow  # body+hand+face forwards at the 368-box protocol sizes
def test_openpose_random_init_forward():
    from pfd_tpu.annotators.nets import openpose
    p = openpose.init_detector_params(jax.random.PRNGKey(4))
    img = np.random.default_rng(4).random((64, 64, 3), np.float32)
    out = annotators.preprocess(img, method="openpose", size=(64, 64),
                                params=p)
    assert out.shape == (64, 64, 3) and np.isfinite(out).all()
