"""Parameter sharding rules (Megatron-style tensor parallelism for the UNet).

Column-parallel: attention q/k/v projections and the GEGLU up-projection shard
their *output* features over 'model'; row-parallel: attention out-projection
and the FF down-projection shard their *input* features, so XLA inserts a
single all-reduce per attention/FF block over ICI. Everything else (convs,
norms, time-embed) is replicated — conv channels are interleaved with
GroupNorm group statistics, where channel sharding would buy collectives, not
FLOPs (the MXU is already saturated by the batch dimension).

The GEGLU split (attention.py:44-52: chunk(2, dim=-1)) stays shard-aligned
because the hidden dim (4*dim per half) is a multiple of any power-of-two
'model' axis we deploy.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import tree_map_with_path, DictKey


def _path_names(path) -> tuple[str, ...]:
    return tuple(p.key if isinstance(p, DictKey) else str(p) for p in path)


def spec_for_param(path_names: tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter, by its pytree path."""
    n = path_names
    leaf_name = n[-1]
    joined = "/".join(n)

    # column-parallel (output features over 'model')
    if leaf_name == "kernel" and len(n) >= 2 and n[-2] in ("to_q", "to_k", "to_v"):
        return P(None, "model")
    if "ff/net/0/proj" in joined:
        return P(None, "model") if leaf_name == "kernel" else P("model")
    # row-parallel (input features over 'model')
    if "to_out" in joined and leaf_name == "kernel":
        return P("model", None)
    if "ff/net/2" in joined and leaf_name == "kernel":
        return P("model", None)
    return P()  # replicated


def param_specs(params) -> dict:
    """Pytree of PartitionSpec matching ``params``."""
    return tree_map_with_path(lambda p, x: spec_for_param(_path_names(p), x), params)


def param_shardings(params, mesh: Mesh):
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        param_specs(params),
                        is_leaf=lambda x: isinstance(x, P))


def place_params(params, mesh: Mesh):
    """Device-put params onto the mesh per the TP rules."""
    return jax.tree.map(jax.device_put, params, param_shardings(params, mesh))
