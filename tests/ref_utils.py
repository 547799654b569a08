"""Helpers for parity tests against the PyTorch reference at /root/reference.

We run the reference's *own code* (CPU, fp32, random weights) to produce golden
tensors, convert the identical weights into pfd_tpu pytrees, and compare
outputs. This tests bit-level weight-conversion correctness and math parity
without copying any reference code into this repo.
"""

from __future__ import annotations

import sys
import types

import numpy as np

_loaded = False


def load_reference():
    """Make /root/reference importable (stubbing torchvision, absent here)."""
    global _loaded
    if _loaded:
        return
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.VGG16_Weights = object()
        tvm.vgg16 = lambda *a, **k: None
        tvt = types.ModuleType("torchvision.transforms")
        tvt.ToTensor = lambda *a, **k: None
        tvt.ToPILImage = lambda *a, **k: None
        tvt.Compose = lambda *a, **k: None  # midas/api.py transforms
        tv.models = tvm
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.transforms"] = tvt
    if "skimage" not in sys.modules:
        try:
            import skimage  # noqa: F401
        except ImportError:
            from scipy import ndimage as _ndi

            sk = types.ModuleType("skimage")
            skm = types.ModuleType("skimage.measure")

            def _label(binary, return_num=False, connectivity=None):
                lbl, n = _ndi.label(binary)
                return (lbl, n) if return_num else lbl

            skm.label = _label
            sk.measure = skm
            sys.modules["skimage"] = sk
            sys.modules["skimage.measure"] = skm
    if "matplotlib" not in sys.modules:
        try:
            import matplotlib  # noqa: F401
        except ImportError:
            import colorsys

            mpl = types.ModuleType("matplotlib")
            mcolors = types.ModuleType("matplotlib.colors")
            mcolors.hsv_to_rgb = lambda hsv: __import__("numpy").array(
                colorsys.hsv_to_rgb(*hsv))
            mpl.colors = mcolors
            mplt = types.ModuleType("matplotlib.pyplot")
            mpl.pyplot = mplt
            sys.modules["matplotlib"] = mpl
            sys.modules["matplotlib.colors"] = mcolors
            sys.modules["matplotlib.pyplot"] = mplt
    if "cv2" not in sys.modules:
        # reference annotator modules import cv2 at module level; tests only
        # instantiate the torch nets, never the cv2 code paths.
        cv2 = types.ModuleType("cv2")
        cv2.Canny = None
        cv2.resize = None
        cv2.INTER_LINEAR = 1
        cv2.INTER_AREA = 3
        cv2.GaussianBlur = None
        cv2.dilate = None
        cv2.line = None
        sys.modules["cv2"] = cv2
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        oc.listconfig = lc
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # reference sync.py rank helpers divide by torch.cuda.device_count()
    # (== 0 on CPU, sync.py:31-41); neutralize for CPU test runs.
    import lib.sync as ref_sync

    ref_sync.get_rank = lambda type="local": (0, 0, 0) if type == "all" else 0
    ref_sync.get_world_size = lambda type="local": (1, 1, 1) if type == "all" else 1
    _loaded = True


def sd_numpy(module) -> dict[str, np.ndarray]:
    """torch module state_dict -> {name: float32 numpy}."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def t2n(t) -> np.ndarray:
    return t.detach().cpu().numpy()


def randomize_params(net, scale=0.05, seed=None):
    """Set EVERY parameter (incl. zero-init convs) to random values.

    Diffusion UNets zero-init their output convs (zero_module) — with fresh
    init both implementations output exact zeros and a parity test passes
    vacuously. Randomizing everything makes the whole graph observable."""
    import torch

    if seed is not None:
        torch.manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn_like(p) * scale)
    return net


def dezero_pytree(params, key=0, scale=0.05):
    """Replace all-zero leaves of a pfd_tpu pytree with random values (same
    rationale as randomize_params, for jax-side-only tests)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(key)

    def fix(x):
        x = np.asarray(x)
        if x.size and not np.any(x):
            return jnp.asarray(rng.standard_normal(x.shape).astype(x.dtype) * scale)
        return jnp.asarray(x)

    return jax.tree.map(fix, params)


def seed_all(seed=0):
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)


def assert_close(a, b, rtol=1e-4, atol=1e-4, name=""):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    err = np.max(np.abs(a - b)) if a.size else 0.0
    denom = np.maximum(np.abs(b), 1e-6)
    rel = np.max(np.abs(a - b) / denom) if a.size else 0.0
    ok = np.allclose(a, b, rtol=rtol, atol=atol)
    assert ok, f"{name}: max abs err {err:.3e}, max rel err {rel:.3e}"
