"""SeeCoder parity: Swin / Decoder / QueryTransformer / PPE vs reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from pfd_tpu import config, registry
from pfd_tpu.io.convert import torch_sd_to_pytree
from tests import ref_utils
from tests.ref_utils import assert_close


def nchw(x):
    return x.transpose(0, 3, 1, 2)


def nhwc(x):
    return x.transpose(0, 2, 3, 1)


def test_tiny_swin_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.swin import SwinTransformer as RefSwin

    ref_utils.seed_all(0)
    kw = dict(embed_dim=8, depths=[2, 2, 2, 2], num_heads=[1, 2, 4, 8],
              window_size=4, ape=False, drop_path_rate=0.0, patch_norm=True)
    ref = RefSwin(**kw).eval()
    ours = registry.get("swin")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    # 72x64 exercises both pad-to-window and shifted masks (swin.py:269-273)
    x = np.random.rand(2, 72, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(nchw(x)))
    got = ours.apply(params, jnp.asarray(x))
    for tag in ["res2", "res3", "res4", "res5"]:
        assert_close(got[tag], nhwc(ref_utils.t2n(want[tag])),
                     rtol=2e-3, atol=2e-4, name=f"swin {tag}")


def test_tiny_decoder_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.seecoder import Decoder as RefDecoder

    ref_utils.seed_all(1)
    kw = dict(inchannels={"res3": 8, "res4": 16, "res5": 32},
              trans_input_tags=["res3", "res4", "res5"],
              trans_num_layers=2, trans_dim=64, trans_nheads=4,
              trans_dropout=0.0, trans_feedforward_dim=32)
    ref = RefDecoder(**kw).eval()
    ours = registry.get("seecoder_decoder")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    feats = {"res3": np.random.randn(1, 8, 8, 8).astype(np.float32),
             "res4": np.random.randn(1, 4, 4, 16).astype(np.float32),
             "res5": np.random.randn(1, 2, 2, 32).astype(np.float32)}
    with torch.no_grad():
        want = ref({k: torch.from_numpy(nchw(v)) for k, v in feats.items()})
    got = ours.apply(params, {k: jnp.asarray(v) for k, v in feats.items()})
    for tag in feats:
        assert_close(got[tag], nhwc(ref_utils.t2n(want[tag])),
                     rtol=2e-3, atol=2e-4, name=f"decoder {tag}")


def test_decoder_fpn_path_parity():
    """res2 as a non-trans (FPN) tag exercises the top-down path
    (seecoder.py:416-426, dormant in the live config)."""
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.seecoder import Decoder as RefDecoder

    ref_utils.seed_all(4)
    kw = dict(inchannels={"res2": 4, "res3": 8, "res4": 16, "res5": 32},
              trans_input_tags=["res3", "res4", "res5"],
              trans_num_layers=1, trans_dim=64, trans_nheads=4,
              trans_dropout=0.0, trans_feedforward_dim=32)
    ref = RefDecoder(**kw).eval()
    ours = registry.get("seecoder_decoder")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    feats = {"res2": np.random.randn(1, 16, 16, 4).astype(np.float32),
             "res3": np.random.randn(1, 8, 8, 8).astype(np.float32),
             "res4": np.random.randn(1, 4, 4, 16).astype(np.float32),
             "res5": np.random.randn(1, 2, 2, 32).astype(np.float32)}
    with torch.no_grad():
        want = ref({k: torch.from_numpy(nchw(v)) for k, v in feats.items()})
    got = ours.apply(params, {k: jnp.asarray(v) for k, v in feats.items()})
    for tag in feats:
        assert_close(got[tag], nhwc(ref_utils.t2n(want[tag])),
                     rtol=2e-3, atol=2e-4, name=f"decoder fpn {tag}")


@pytest.mark.parametrize("with_pos", [False, True])
def test_tiny_query_transformer_parity(with_pos):
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.seecoder import QueryTransformer as RefQT

    ref_utils.seed_all(2)
    kw = dict(in_channels=64, hidden_dim=64, num_queries=[2, 4], nheads=4,
              num_layers=3, feedforward_dim=32, pre_norm=False,
              num_feature_levels=3, enforce_input_project=False,
              with_fea2d_pos=with_pos)
    ref = RefQT(**kw).eval()
    ours = registry.get("seecoder_query_transformer")(**kw)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    feats = [np.random.randn(1, 8, 8, 64).astype(np.float32),
             np.random.randn(1, 4, 4, 64).astype(np.float32),
             np.random.randn(1, 2, 2, 64).astype(np.float32)]
    with torch.no_grad():
        want = ref([torch.from_numpy(nchw(f)) for f in feats])
    got = ours.apply(params, [jnp.asarray(f) for f in feats])
    assert_close(got, ref_utils.t2n(want), rtol=2e-3, atol=2e-4,
                 name=f"qtransformer pos={with_pos}")


@pytest.mark.slow
def test_full_seecoder_parity():
    ref_utils.load_reference()
    import torch
    from lib.model_zoo.seecoder import SemanticContextEncoder as RefSC

    ref_utils.seed_all(3)
    cfg = config.model_cfg("seecoder")

    class AttrDict(dict):
        """reference get_model expects easydict-style attr access."""

        def __getattr__(self, k):
            if k.startswith("__"):
                raise AttributeError(k)
            v = self[k]
            return AttrDict(v) if isinstance(v, dict) else v

        def get(self, k, default=None):
            v = super().get(k, default)
            return AttrDict(v) if isinstance(v, dict) else v

    ref = RefSC(imencoder_cfg=AttrDict(cfg["args"]["imencoder_cfg"]),
                imdecoder_cfg=AttrDict(cfg["args"]["imdecoder_cfg"]),
                qtransformer_cfg=AttrDict(cfg["args"]["qtransformer_cfg"])).eval()
    ours = registry.build_model(cfg)
    params = torch_sd_to_pytree(ref_utils.sd_numpy(ref))

    x = np.random.rand(1, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        want = ref.encode(torch.from_numpy(nchw(x)))
    got = ours.encode(params, jnp.asarray(x))
    assert got.shape == (1, 148, 768)
    assert_close(got, ref_utils.t2n(want), rtol=5e-3, atol=1e-3,
                 name="seecoder tokens")
