"""Multi-host initialization (replaces the reference's torch.distributed
env://-or-SLURM rendezvous, ref utils/distributed.py:20-58).

Under jax SPMD there is no communicator management: call `init()` once per
process (TPU pods auto-discover coordinates; explicit args cover DCN/GPU
setups), then build the global mesh — collectives ride ICI within a slice
and DCN across slices automatically.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the jax distributed runtime when running multi-host.

    No-ops for single-process runs. On TPU pods all arguments are
    auto-detected; SLURM users can rely on jax's built-in SLURM detection
    (the equivalent of the reference's SLURM_PROCID branch).
    """
    if num_processes is None and "COORDINATOR_ADDRESS" not in os.environ \
            and coordinator_address is None:
        in_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        )
        if not in_pod:
            return  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # pod-looking env vars without a derivable coordinator (e.g. a
        # single tunneled chip that still exports TPU_WORKER_HOSTNAMES), or
        # an already-initialized runtime: proceed single-host
        import warnings

        warnings.warn(f"jax.distributed.initialize skipped: {e}")


def is_main_process() -> bool:
    return jax.process_index() == 0
