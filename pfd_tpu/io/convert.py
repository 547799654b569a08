"""torch state-dict ⇄ pfd_tpu parameter-pytree conversion.

pfd_tpu pytrees mirror the reference torch module hierarchy name-for-name
(nested dicts keyed by the dot-path segments), so conversion is a generic,
mechanical walk; only the *tensor layout* changes:

- conv weights: torch OIHW  ->  HWIO (TPU-native)
- linear weights: torch (out, in) -> (in, out)
- 1-D ``weight`` of norms -> ``scale``
- embedding-like 2-D tables (position tables, learned queries) stay untouched

This module is the working equivalent of the reference's weight-name contract
(tools/model_conversion.py defines the pfd key layout this loader honors).
"""

from __future__ import annotations

import re
from typing import Any, Iterable

import numpy as np

# 2-D tensors whose layout must NOT be transposed (lookup tables, learned
# queries/embeddings — identified by leaf name, matching reference modules:
# swin.py relative_position_bias_table, seecoder.py init_query/query_pos_embedding,
# nn.Embedding weights named `*_embed.weight` handled via KEEP_RAW_PARENTS).
KEEP_RAW_LEAVES = {
    "relative_position_bias_table",
    "relative_position_index",
    "attn_mask",
    "init_query",
    "query_pos_embedding",
    "absolute_pos_embed",
    "positional_embedding",
}

# parent module names whose `weight` is an embedding table (num, dim), not a matmul
KEEP_RAW_PARENTS = {
    "level_embed",
    "query_embed",
    "init_query",
    "query_pos_embedding",
    "token_embedding",
    "position_embedding",
}

# registered buffers that are recomputed statically on the TPU side and must
# not enter the parameter pytree (swin.py:166 relative_position_index, etc.)
DROP_LEAVES = {
    "relative_position_index",
    "attn_mask",
    "num_batches_tracked",
}


def _transform_leaf(path: tuple[str, ...], arr: np.ndarray):
    """Return (new_leaf_name, transformed_array)."""
    leaf = path[-1]
    parent = path[-2] if len(path) > 1 else ""

    if leaf in KEEP_RAW_LEAVES:
        return leaf, arr
    if leaf == "in_proj_weight":
        return ("in_proj", "kernel"), arr.T
    if leaf == "in_proj_bias":
        return ("in_proj", "bias"), arr
    if leaf == "weight":
        if parent in KEEP_RAW_PARENTS:
            return "weight", arr
        if arr.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 3:  # conv1d OIW -> WIO
            return "kernel", arr.transpose(2, 1, 0)
        if arr.ndim == 2:  # linear (out,in) -> (in,out)
            return "kernel", arr.T
        return "scale", arr  # norm gain
    return leaf, arr


def torch_sd_to_pytree(sd: dict[str, np.ndarray], *, prefix: str = "",
                       rename: Iterable[tuple[str, str]] = (),
                       dtype=None) -> dict:
    """Convert a flat torch state_dict (numpy values) into a nested pytree.

    prefix: only keys under this prefix are taken (prefix stripped).
    rename: regex (pattern, replacement) pairs applied to keys first.
    """
    tree: dict[str, Any] = {}
    for key, arr in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        for pat, rep in rename:
            key = re.sub(pat, rep, key)
        path = tuple(key.split("."))
        if path[-1] in DROP_LEAVES:
            continue
        new_leaf, arr = _transform_leaf(path, np.asarray(arr))
        if isinstance(new_leaf, tuple):
            path = path[:-1] + new_leaf
        else:
            path = path[:-1] + (new_leaf,)
        if dtype is not None and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(dtype)
        node = tree
        for seg in path[:-1]:
            node = node.setdefault(seg, {})
        node[path[-1]] = arr
    return tree


def clip_text_sd_to_params(sd: dict[str, np.ndarray], *, dtype=None) -> dict:
    """torch ``transformers`` CLIPTextModel/CLIPModel state dict -> HF *Flax*
    CLIP parameter pytree (the tree ``models/clip.py`` encoders consume).

    The generic walk handles projections (transpose) and LayerNorms
    (weight->scale); the only CLIP-specific quirk is that Flax nn.Embed stores
    its table under 'embedding' where torch nn.Embedding uses 'weight'
    (reference conditioning path: clip.py:23-146).
    """
    rename = [
        (r"embeddings\.token_embedding\.weight$",
         "embeddings.token_embedding.embedding"),
        (r"embeddings\.position_embedding\.weight$",
         "embeddings.position_embedding.embedding"),
    ]
    sd = {k: v for k, v in sd.items()
          if k != "text_model.embeddings.position_ids"
          and not k.startswith("vision_model.embeddings.position_ids")}
    return torch_sd_to_pytree(sd, rename=rename, dtype=dtype)


def pytree_to_torch_sd(tree: dict, *, prefix: str = "") -> dict[str, np.ndarray]:
    """Inverse walk (for exporting checkpoints back to the pfd torch layout)."""
    out: dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        arr = np.asarray(node)
        leaf = path[-1]
        parent = path[-2] if len(path) > 1 else ""
        if parent == "in_proj":
            key = path[:-2] + (f"in_proj_{'weight' if leaf == 'kernel' else 'bias'}",)
            arr = arr.T if leaf == "kernel" else arr
        elif leaf == "kernel":
            if arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 3:
                arr = arr.transpose(2, 1, 0)
            else:
                arr = arr.T
            key = path[:-1] + ("weight",)
        elif leaf == "scale":
            key = path[:-1] + ("weight",)
        else:
            key = path
        out[prefix + ".".join(key)] = arr

    walk(tree, ())
    return out
