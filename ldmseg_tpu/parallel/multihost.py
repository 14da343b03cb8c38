"""Multi-host launch helpers.

Replaces the reference's process-spawning launchers (mp.spawn in
tools/main_ldm.py:70, SLURM env parsing in tools/main_ldm_slurm.py:52-58,
tcp/env:// NCCL rendezvous): on TPU pods each host runs the same SPMD
program once; ``jax.distributed.initialize`` wires the cluster and the
mesh spans all global devices automatically.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed from explicit args, SLURM variables
    (SLURM_NTASKS/SLURM_PROCID/SLURM_NODELIST — the launcher's env
    contract, main_ldm_slurm.py:52-58), or TPU-pod auto-detection.

    Safe to call single-host (no-op). Returns a summary dict.
    """
    if jax.process_count() > 1:
        pass  # already initialized
    elif coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    elif "SLURM_NTASKS" in os.environ and \
            int(os.environ["SLURM_NTASKS"]) > 1:
        # jax's SLURM cluster-detection handles the rendezvous details
        jax.distributed.initialize()
    elif os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        jax.distributed.initialize()

    return {
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_main_process() -> bool:
    """Reference ldmseg/utils/utils.py:52-81 dist helpers equivalent."""
    return jax.process_index() == 0


def world_size() -> int:
    return jax.process_count()


def all_gather_host(values) -> list:
    """Gather per-host python/numpy records (the detectron2
    ``comm.gather`` of eval predictions, panoptic_evaluation.py:97-100)."""
    if jax.process_count() == 1:
        return [values]
    from jax.experimental import multihost_utils
    return list(multihost_utils.process_allgather(values))
