"""LoRA adapters for linear/packed-attention params.

The working equivalent of the reference's `from .lora import ...`
(clip.py:625-641) — a module that does not exist in the reference repo (its
LoRA fine-tuning path is dead code there). Functional formulation: adapters
live in a separate pytree; ``merge`` folds W' = W + (alpha/r)·A@B into the
base params for inference, and ``apply_linear`` computes the low-rank bypass
explicitly for training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_adapter(key, cin, cout, rank, dtype=jnp.float32):
    k1, _ = jax.random.split(key)
    return {
        "lora_A": jax.random.normal(k1, (cin, rank), dtype) * (1.0 / rank),
        "lora_B": jnp.zeros((rank, cout), dtype),  # zero-init: no-op at start
    }


def delta(adapter, alpha=1.0):
    r = adapter["lora_A"].shape[1]
    return (alpha / r) * (adapter["lora_A"] @ adapter["lora_B"])


def apply_linear(x, base_kernel, adapter, alpha=1.0):
    """x @ (W + ΔW) computed as x@W + scale·(x@A)@B (training-friendly)."""
    r = adapter["lora_A"].shape[1]
    y = x @ base_kernel
    return y + (alpha / r) * ((x @ adapter["lora_A"]) @ adapter["lora_B"])


def init_for_kernels(key, params, match, rank, dtype=jnp.float32):
    """Build an adapter pytree for every 'kernel' leaf whose path satisfies
    ``match(path_names)``. Returns {joined_path: adapter}."""
    from jax.tree_util import tree_flatten_with_path, DictKey

    adapters = {}
    flat, _ = tree_flatten_with_path(params)
    keys = iter(jax.random.split(key, len(flat) + 1))
    for path, leaf in flat:
        names = tuple(p.key if isinstance(p, DictKey) else str(p) for p in path)
        if names[-1] == "kernel" and leaf.ndim == 2 and match(names):
            adapters["/".join(names[:-1])] = init_adapter(
                next(keys), leaf.shape[0], leaf.shape[1], rank, dtype)
    return adapters


def merge(params, adapters, alpha=1.0):
    """Fold all adapters into a copy of the base params (inference path)."""
    from jax.tree_util import tree_map_with_path, DictKey

    def maybe(path, leaf):
        names = tuple(p.key if isinstance(p, DictKey) else str(p) for p in path)
        key = "/".join(names[:-1])
        if names[-1] == "kernel" and key in adapters:
            return leaf + delta(adapters[key], alpha).astype(leaf.dtype)
        return leaf

    return tree_map_with_path(maybe, params)
