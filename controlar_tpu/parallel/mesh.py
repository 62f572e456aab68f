"""Device mesh construction for (data, fsdp, tp) SPMD.

Replaces the reference's NCCL process-group machinery (ref:
utils/distributed.py:20-58 DDP init, train_c2i_fsdp.py:41-59 FSDP wrapping,
serve/worker.py:282-319 TP groups + custom all-reduce): under jax SPMD the
whole program is one jitted computation over a Mesh, and XLA inserts the
collectives (psum for DP grads, all-gather/reduce-scatter for FSDP params,
matmul collectives for TP) — riding ICI within a slice.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "tp")


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, fsdp, tp) mesh. data=-1 absorbs the remaining devices.

    TP should map to the innermost (fastest-ICI) axis, which is the trailing
    mesh dimension in jax's default device ordering.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (fsdp * tp) == 0, (n, fsdp, tp)
        data = n // (fsdp * tp)
    assert data * fsdp * tp == n, f"mesh {data}x{fsdp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(data, fsdp, tp)
    return Mesh(arr, AXES)


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)
