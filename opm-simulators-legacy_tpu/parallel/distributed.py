"""Multi-host bring-up: the reference's setupParallelism analogue.

The reference initializes MPI ranks in FlowMain::setupParallelism
(/root/reference/opm/autodiff/FlowMain.hpp:252-284: MPI_Init via
Dune::MPIHelper, rank/size into the parameter group). The TPU-native
equivalent is `jax.distributed.initialize`: every process joins a
coordinator, after which `jax.devices()` spans ALL hosts' chips and
single-program global-view sharding (pjit over a global Mesh) replaces
rank-explicit SPMD — collectives ride ICI within a slice and DCN across
slices without any NCCL/MPI plumbing in user code.

Tested without a cluster the same way the reference tests MPI without one
(mpirun-on-one-box, tests/test_parallel_linearsolver.cpp): N local
processes with CPU devices and gloo collectives (tests/test_distributed.py).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids=None):
    """Join (or auto-detect) a multi-process jax run. On managed TPU pods
    every argument auto-detects from the environment; for manual bring-up
    (or the multi-process-per-host test harness) pass them explicitly, or
    set OPM_TPU_COORDINATOR / OPM_TPU_NUM_PROCS / OPM_TPU_PROC_ID.

    Returns (process_id, num_processes). Safe to call in single-process
    runs: with no coordinator configured it is a no-op returning (0, 1).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "OPM_TPU_COORDINATOR")
    if num_processes is None and "OPM_TPU_NUM_PROCS" in os.environ:
        num_processes = int(os.environ["OPM_TPU_NUM_PROCS"])
    if process_id is None and "OPM_TPU_PROC_ID" in os.environ:
        process_id = int(os.environ["OPM_TPU_PROC_ID"])

    if coordinator_address is None and num_processes is None:
        # single-process (or fully auto-detecting TPU pod) run
        try:
            jax.distributed.initialize()
        except Exception:
            return 0, 1           # nothing to join — single process
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            local_device_ids=local_device_ids)
    return jax.process_index(), jax.process_count()


def global_cell_mesh(axis_name: str = "cells"):
    """1-D mesh over every device of every process — the cell-axis
    domain-decomposition layout (SURVEY.md §2.K). Call after
    initialize_distributed."""
    import jax
    from jax.sharding import Mesh

    return Mesh(jax.devices(), (axis_name,))
