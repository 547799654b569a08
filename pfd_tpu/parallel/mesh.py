"""Device mesh construction for SPMD serving and training.

Replaces the reference's torch.distributed/NCCL/DDP + shm side-channel stack
(lib/utils.py:460-465, lib/sync.py:62-239) with single-controller JAX SPMD:
a ``Mesh(('data', 'model'))`` over which params/batches are sharded via
NamedSharding; XLA inserts the ICI collectives.

Axes:
- 'data'  — batch data-parallelism (the BASELINE.json serving axis; 8-way on v5e-8)
- 'model' — tensor-parallelism over attention heads / FFN hidden dims

Pipeline/sequence/expert parallelism are intentionally absent: the model is a
single-path conv UNet with no MoE, and max spatial sequence (36,864 tokens
@1536²) fits one chip with flash attention (SURVEY §5 "long-context" note) —
sharding axes that don't pay for their collectives are not TPU-first design.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp=None, tp=1) -> Mesh:
    """Build a ('data', 'model') mesh. Default: all devices data-parallel."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded over 'data', replicated over 'model'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
