"""Device mesh construction for SPMD serving and training.

Replaces the reference's torch.distributed/NCCL/DDP + shm side-channel stack
(lib/utils.py:460-465, lib/sync.py:62-239) with single-controller JAX SPMD:
a ``Mesh(('data', 'model'))`` over which params/batches are sharded via
NamedSharding; XLA inserts the ICI collectives.

Axes:
- 'data'  — batch data-parallelism (the BASELINE.json serving axis; 8-way on v5e-8)
- 'seq'   — spatial/sequence parallelism: activations sharded over the latent
  H dim; XLA partitions convs with halo exchanges and attention with
  collective gathers over ICI (enable with sp>1)
- 'model' — tensor-parallelism over attention heads / FFN hidden dims

Pipeline/expert parallelism are intentionally absent: the model is a
single-path conv UNet with no MoE — sharding axes that don't pay for their
collectives are not TPU-first design (SURVEY §5).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp=None, tp=1, sp=1) -> Mesh:
    """Build a ('data'[, 'seq'], 'model') mesh. Default: all devices
    data-parallel; sp>1 adds the spatial axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp)
    assert dp * tp * sp == n, f"dp({dp}) * sp({sp}) * tp({tp}) != {n} devices"
    if sp > 1:
        arr = np.asarray(devices).reshape(dp, sp, tp)
        return Mesh(arr, ("data", "seq", "model"))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over 'data' (+ latent H over 'seq' when present)."""
    if "seq" in mesh.shape:
        return NamedSharding(mesh, P("data", "seq"))
    return NamedSharding(mesh, P("data"))


def batch_only_sharding(mesh: Mesh) -> NamedSharding:
    """Batch over 'data' only (for rank<4 leaves like t or tokens)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
