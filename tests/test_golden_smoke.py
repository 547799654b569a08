"""Golden-example harness smoke: the record/compare/SSIM plumbing must run
end-to-end in CI (tiny random-weight models), since the published checkpoints
it normally gates on (app.py:284-355 cached examples) are unavailable here."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfd_tpu.tools import golden_examples


def test_tiny_smoke_record_then_compare(tmp_path):
    goldens = str(tmp_path / "goldens")
    rec = golden_examples.run(None, str(tmp_path), goldens, record=True,
                              tiny_smoke=True, cases=[0, 7])
    assert rec == {0: {"recorded": True}, 7: {"recorded": True}}

    res = golden_examples.run(None, str(tmp_path), goldens, record=False,
                              tiny_smoke=True, cases=[0, 7])
    assert set(res) == {0, 7}
    for i, r in res.items():
        assert r["pass"], f"example {i} SSIM {r['ssim']} below gate"
        assert r["ssim"] == pytest.approx(1.0, abs=1e-5)


def test_anime_negative_context(tmp_path):
    """tag_ctx == 'SeeCoder-Anime' must auto-load assets/anime_ug.pth under
    pretrained_root as the zero-padded negative context (app.py:236-241)."""
    import torch

    from pfd_tpu.pipeline import PromptFreeDiffusionPipeline

    root = tmp_path / "store"
    (root / "assets").mkdir(parents=True)
    ug = np.random.default_rng(0).standard_normal((6, 768)).astype(np.float32)
    torch.save(torch.from_numpy(ug), str(root / "assets" / "anime_ug.pth"))

    pipe = PromptFreeDiffusionPipeline(
        fp16=False, config_override=golden_examples._smoke_config(),
        pretrained_root=str(root), tag_ctx="SeeCoder-Anime",
        tag_diffuser="Anything-v4", tag_ctl="none")

    c = jnp.zeros((2, 20, 768), jnp.float32)
    u = np.asarray(pipe.negative_context(c))
    assert u.shape == (2, 20, 768)
    np.testing.assert_allclose(u[0, :6], ug, rtol=1e-6)
    np.testing.assert_allclose(u[1, :6], ug, rtol=1e-6)
    assert np.all(u[:, 6:] == 0), "padding rows must be zero"

    # non-anime ctx: plain zeros even when the asset exists
    pipe.tag_ctx = "SeeCoder"
    assert np.all(np.asarray(pipe.negative_context(c)) == 0)
