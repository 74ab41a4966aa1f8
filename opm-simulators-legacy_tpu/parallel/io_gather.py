"""Gather distributed state to the IO host (ParallelDebugOutput role).

The reference collects the distributed SimulationDataContainer and well
state to the IO rank with a hand-built point-to-point communicator and
global-index mapping (/root/reference/opm/autodiff/
ParallelDebugOutput.hpp:43-660: DistributeIndexMapping, pack/unpack).

JAX-native equivalent: under single-process global-view sharding,
`device_get` of a NamedSharding array already assembles the global value;
across processes (multi-host), `multihost_utils.process_allgather`
performs the gather. Cells are contiguous per shard by construction
(parallel/partition.py), so no index remapping is needed."""

from __future__ import annotations

import jax
import numpy as np


def gather_to_host(tree):
    """Pytree of (possibly sharded) arrays -> host numpy pytree with
    GLOBAL values on every process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        tree = multihost_utils.process_allgather(tree)
    return jax.tree.map(np.asarray, tree)


def host_value(x):
    """Host numpy value of a possibly-GLOBAL array (the DistributeIndexMapping
    pack/unpack role): plain np.asarray when fully addressable; the local
    replica for fully-replicated global arrays; a COLLECTIVE
    process_allgather(tiled) for cross-process sharded arrays — so every
    call site must execute on ALL processes (the reference's gather is
    collective the same way)."""
    if x is None or not isinstance(x, jax.Array):
        return None if x is None else np.asarray(x)
    if x.is_fully_addressable:
        return np.asarray(x)
    if x.sharding.is_fully_replicated:
        return np.asarray(x.addressable_data(0))
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x, tiled=True)


def host_tree(tree):
    """host_value over a pytree."""
    return jax.tree.map(host_value, tree)


def is_io_process() -> bool:
    """True on the process that should write output (rank-0 analogue)."""
    return jax.process_index() == 0
