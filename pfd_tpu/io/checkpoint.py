"""Checkpoint save/load — orbax for training state, safetensors for interop.

The working equivalent of the reference's persistence (utils.py:326-370
torch.save of state_dict named {expid}_{symbol}_{iter|best|last}.pth; resume
via cfg flags, cfg_helper.py:354-369). Improvements over the reference: the
optimizer state IS persisted (the reference accepts it but drops it,
utils.py:326-334), checkpoints are async-capable orbax, and export back to
the pfd torch key layout is supported for zoo interchange.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from pfd_tpu.io.convert import pytree_to_torch_sd


def save_train_state(ckpt_dir: str, state, step: int | None = None):
    """Save a TrainState (params/opt_state/step pytree) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(path) as mgr:
        step = int(state.step) if step is None else step
        mgr.save(step, args=ocp.args.StandardSave(_to_saveable(state)))
        mgr.wait_until_finished()
    return path


def restore_train_state(ckpt_dir: str, template_state, step: int | None = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(_to_saveable(template_state)))
    return type(template_state)(**restored)


def _to_saveable(state):
    return {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}


def save_params_safetensors(path: str, params, prefix: str = ""):
    """Export a params pytree to the pfd torch key layout as safetensors —
    directly loadable by the reference app (app.py:137-162)."""
    from safetensors.numpy import save_file

    sd = pytree_to_torch_sd(params, prefix=prefix)
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, path)
    return path


def save_params_npz(path: str, params):
    flat = {"/".join(str(p.key) if hasattr(p, "key") else str(p) for p in kp): np.asarray(v)
            for kp, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(path, **flat)
    return path
