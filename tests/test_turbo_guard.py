"""ControlNet requests must sample exactly even when the pipeline's
encoder-propagation turbo is on (pipeline.py _sample_decode_fn guard):
under interval>1 the cached encoder skips would hold stale control
residuals on non-key steps — an ungated approximation. The plain path's
interval>1 mode is the SSIM-gated serving default (docs/PARITY.md)."""

import numpy as np

from pfd_tpu.pipeline import PromptFreeDiffusionPipeline
from tests import ref_utils
from tests.test_pipeline_hotswap import TINY_PFD


def _pipe(tmp_path, interval, **kw):
    pipe = PromptFreeDiffusionPipeline(
        fp16=False, config_override=TINY_PFD, pretrained_root=str(tmp_path),
        tag_ctx="SeeCoder", tag_diffuser="SD-v1.5", tag_ctl="canny",
        encoder_interval=interval, **kw)
    pipe.ddim_steps = 2
    pipe.params = ref_utils.dezero_pytree(pipe.params, key=3)
    return pipe

def test_control_exact_plain_turbo(tmp_path):
    rng = np.random.default_rng(0)
    ref = rng.random((64, 64, 3), dtype=np.float32)
    ctl = np.zeros((64, 64, 3), np.float32)
    ctl[16:48, 16:48] = 1.0  # white square -> clean canny edges

    exact = _pipe(tmp_path, interval=1)
    turbo = _pipe(tmp_path, interval=2)
    turbo.params = exact.params  # identical weights

    # control requests: the guard forces exact sampling -> identical output
    a1 = exact.action_inference(ref, ctl, "canny", True, 64, 64, 2.0, 5)
    a2 = turbo.action_inference(ref, ctl, "canny", True, 64, 64, 2.0, 5)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))

    # plain requests: interval-2 is live -> output actually changes
    p1 = exact.action_inference(ref, None, "none", False, 64, 64, 2.0, 5)
    p2 = turbo.action_inference(ref, None, "none", False, 64, 64, 2.0, 5)
    assert np.isfinite(np.asarray(p2[0])).all()
    assert np.abs(np.asarray(p1[0]) - np.asarray(p2[0])).max() > 1e-6


def test_control_exact_under_cfg_and_deep_turbo(tmp_path):
    """The guard covers every output-changing interval: cfg_interval and
    deep_interval must also fall back to exact sampling on control requests
    (pipeline.py sets all three to 1 when a control hint is present)."""
    rng = np.random.default_rng(0)
    ref = rng.random((64, 64, 3), dtype=np.float32)
    ctl = np.zeros((64, 64, 3), np.float32)
    ctl[16:48, 16:48] = 1.0

    exact = _pipe(tmp_path, interval=1)
    turbo = _pipe(tmp_path, interval=2, cfg_interval=2, deep_interval=2)
    turbo.ddim_steps = 4  # an even step count so k=2 groups are exercised
    exact.ddim_steps = 4
    turbo.params = exact.params

    a1 = exact.action_inference(ref, ctl, "canny", True, 64, 64, 2.0, 5)
    a2 = turbo.action_inference(ref, ctl, "canny", True, 64, 64, 2.0, 5)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))

    p1 = exact.action_inference(ref, None, "none", False, 64, 64, 2.0, 5)
    p2 = turbo.action_inference(ref, None, "none", False, 64, 64, 2.0, 5)
    assert np.isfinite(np.asarray(p2[0])).all()
    assert np.abs(np.asarray(p1[0]) - np.asarray(p2[0])).max() > 1e-6


def test_control_turbo_opt_in(tmp_path):
    """control_turbo=True lifts the guard: control requests then sample with
    the configured intervals (output-changing vs exact — the opt-in is gated
    by the GATE_SET=control SSIM rows, docs/PARITY.md)."""
    rng = np.random.default_rng(0)
    ref = rng.random((64, 64, 3), dtype=np.float32)
    ctl = np.zeros((64, 64, 3), np.float32)
    ctl[16:48, 16:48] = 1.0

    exact = _pipe(tmp_path, interval=1)
    opted = _pipe(tmp_path, interval=2, cfg_interval=2, deep_interval=2,
                  control_turbo=True)
    exact.ddim_steps = 4
    opted.ddim_steps = 4
    opted.params = exact.params

    a1 = exact.action_inference(ref, ctl, "canny", True, 64, 64, 2.0, 5)
    a2 = opted.action_inference(ref, ctl, "canny", True, 64, 64, 2.0, 5)
    assert np.isfinite(np.asarray(a2[0])).all()
    assert np.abs(np.asarray(a1[0]) - np.asarray(a2[0])).max() > 1e-6


def test_control_exact_under_phases(tmp_path):
    """phases=... is output-changing too: control requests must ignore it
    (pipeline.py passes phases=None when a control hint is present), while
    plain requests run the phased schedule."""
    rng = np.random.default_rng(0)
    ref = rng.random((64, 64, 3), dtype=np.float32)
    ctl = np.zeros((64, 64, 3), np.float32)
    ctl[16:48, 16:48] = 1.0

    exact = _pipe(tmp_path, interval=1)
    phased = _pipe(tmp_path, interval=1, phases=[(2, 1), (2, 2)])
    exact.ddim_steps = 4
    phased.ddim_steps = 4
    phased.params = exact.params

    a1 = exact.action_inference(ref, ctl, "canny", True, 64, 64, 2.0, 5)
    a2 = phased.action_inference(ref, ctl, "canny", True, 64, 64, 2.0, 5)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))

    p1 = exact.action_inference(ref, None, "none", False, 64, 64, 2.0, 5)
    p2 = phased.action_inference(ref, None, "none", False, 64, 64, 2.0, 5)
    assert np.isfinite(np.asarray(p2[0])).all()
    assert np.abs(np.asarray(p1[0]) - np.asarray(p2[0])).max() > 1e-6


def test_control_exact_under_kv_pool(tmp_path):
    """kv_pool (ops/kvpool.py reuse-step attention) is output-changing too:
    control requests must fall back to exact sampling (pipeline.py passes
    reuse_self_attn_fn=None under the exact-control guard), while plain
    requests run the pooled reuse attention."""
    rng = np.random.default_rng(0)
    ref = rng.random((64, 64, 3), dtype=np.float32)
    ctl = np.zeros((64, 64, 3), np.float32)
    ctl[16:48, 16:48] = 1.0

    exact = _pipe(tmp_path, interval=1)
    pooled = _pipe(tmp_path, interval=1, phases=[(2, 1), (2, 2)],
                   kv_pool=2, kv_min_s=1)
    plain_phased = _pipe(tmp_path, interval=1, phases=[(2, 1), (2, 2)])
    exact.ddim_steps = 4
    pooled.ddim_steps = 4
    plain_phased.ddim_steps = 4
    pooled.params = exact.params
    plain_phased.params = exact.params

    # control request: guard forces exact sampling despite kv_pool+phases
    a1 = exact.action_inference(ref, ctl, "canny", True, 64, 64, 2.0, 5)
    a2 = pooled.action_inference(ref, ctl, "canny", True, 64, 64, 2.0, 5)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))

    # plain request: kv_pool is live — differs from the unpooled phased run
    p1 = plain_phased.action_inference(ref, None, "none", False, 64, 64,
                                       2.0, 5)
    p2 = pooled.action_inference(ref, None, "none", False, 64, 64, 2.0, 5)
    assert np.isfinite(np.asarray(p2[0])).all()
    assert np.abs(np.asarray(p1[0]) - np.asarray(p2[0])).max() > 1e-6
