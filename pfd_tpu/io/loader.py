"""Checkpoint file loading: .safetensors / .pth / .ckpt -> numpy state dicts,
and composite-model state dicts -> pfd_tpu parameter pytrees.

Honors the reference's weight-name contract (app.py:82-92 load_sd_from_file;
hot-swap merge semantics app.py:137-162; the pfd key layout defined by
tools/model_conversion.py).
"""

from __future__ import annotations

import os

import numpy as np

from pfd_tpu.io.convert import torch_sd_to_pytree

# DDPM schedule buffers registered on the composite model (pfd.py:110-168) —
# recomputed in fp64 on our side, never loaded.
SCHEDULE_BUFFERS = (
    "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_variance", "posterior_log_variance_clipped",
    "posterior_mean_coef1", "posterior_mean_coef2", "lvlb_weights",
)


def load_sd_file(path: str) -> dict[str, np.ndarray]:
    """Load a torch-format checkpoint into {key: numpy} (app.py:82-92)."""
    ext = os.path.splitext(path)[-1]
    if ext == ".safetensors":
        from safetensors.numpy import load_file
        return dict(load_file(path))
    if ext in (".pth", ".ckpt"):
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if ext == ".ckpt":
            sd = sd["state_dict"]
        return {k: v.float().numpy() if v.dtype == torch.float16 else v.numpy()
                for k, v in sd.items()}
    raise ValueError(f"file type must be .ckpt/.pth/.safetensors, got {path}")


def load_tensor_file(path: str) -> np.ndarray:
    """Load a raw-tensor .pth (e.g. assets/anime_ug.pth, the anime negative
    context the reference torch.loads at app.py:237) -> numpy array."""
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    return t.float().numpy()


def _strip_schedule(sd: dict) -> dict:
    return {k: v for k, v in sd.items() if not (
        k in SCHEDULE_BUFFERS or any(k == f"{b}" for b in SCHEDULE_BUFFERS))}


def composite_sd_to_params(sd: dict[str, np.ndarray], dtype=None) -> dict:
    """Full pfd(-with-control) state dict -> params pytree with top-level
    groups vae/ctx/diffuser/ctl."""
    sd = _strip_schedule(sd)
    return torch_sd_to_pytree(sd, dtype=dtype)


def diffuser_sd_to_params(sd: dict[str, np.ndarray], dtype=None) -> dict:
    """A diffuser zoo checkpoint ('diffuser.image.*' keys, possibly with
    'diffuser.text.context_blocks.*' that must be renamed — app.py:148-152)."""
    rename = [(r"^diffuser\.text\.context_blocks\.", "diffuser.image.context_blocks.")]
    tree = torch_sd_to_pytree(sd, rename=rename, dtype=dtype)
    return tree["diffuser"]


def ctx_sd_to_params(sd: dict[str, np.ndarray], dtype=None) -> dict:
    """A seecoder zoo checkpoint ('ctx.image.*' keys)."""
    tree = torch_sd_to_pytree(sd, dtype=dtype)
    return tree["ctx"]


def ctl_sd_to_params(sd: dict[str, np.ndarray], dtype=None) -> dict:
    """A slimmed controlnet checkpoint (bare keys, control_model. prefix
    already stripped by tools/get_controlnet.py)."""
    return torch_sd_to_pytree(sd, dtype=dtype)


def vae_sd_to_params(sd: dict[str, np.ndarray], dtype=None) -> dict:
    return torch_sd_to_pytree(sd, dtype=dtype)
