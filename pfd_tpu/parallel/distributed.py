"""Multi-host initialization — the working replacement for the reference's
distributed bring-up stack.

Reference: torch.distributed.init_process_group over tcp:// with NCCL/Gloo
(utils.py:460-465, cfg_helper.py:376-387 multi-node CLI) plus a hand-rolled
POSIX shared-memory barrier/broadcast side-channel (sync.py:62-239).

Under single-controller JAX all of that collapses to
``jax.distributed.initialize`` (coordinator address + process id) — the SPMD
runtime provides rendezvous, and collectives are compiled into the programs.
The shm broadcast channel (sync.py:207-230, used to share python objects
across local ranks) is unnecessary: one python process drives all local chips.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None):
    """Bring up multi-host JAX. No-op on a single host (the common case:
    one process drives all chips of a slice)."""
    if coordinator_address is None:
        return  # single-controller, single-host
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_rank0() -> bool:
    return jax.process_index() == 0


def world_size() -> int:
    return jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()
