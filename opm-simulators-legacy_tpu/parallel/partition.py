"""Cell-domain partitioning for multi-chip runs.

Plays the role of the reference's load-balancing entry points: CpGrid
loadBalance (Zoltan graph partition, /root/reference/opm/autodiff/
FlowMain.hpp:733-745 distributeData) and the serial partitioners in
/root/reference/opm/core/grid/cpgpreprocess + msmfem/partition.c (cartesian
block partition + connected-component splitting). The TPU layout wants
contiguous, equal-size shards of a renumbered cell axis: cells are sorted in
slabs along the grid axis with the most layers, split into equal blocks, and
renumbered so every shard is a contiguous range — cross-shard faces then
connect only adjacent shards (a 1-D halo pattern riding ICI neighbors).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Partition:
    n_shards: int
    perm: np.ndarray        # new_id -> old active-cell id
    inv_perm: np.ndarray    # old -> new
    shard_size: int         # cells per shard (last shard may be padded)
    owner: np.ndarray       # (nc_padded,) shard of each new cell id
    nc: int                 # true number of cells
    nc_padded: int


def slab_partition(grid, n_shards: int) -> Partition:
    """Sort active cells by (slab axis, remaining ijk) and cut into equal
    contiguous blocks; pad the tail so every shard has the same size."""
    nx, ny, nz = grid.dims
    g = grid.global_cell
    i = g % nx
    j = (g // nx) % ny
    k = g // (nx * ny)
    # choose the axis with most entries as the slab axis for minimal
    # interface area (simple heuristic; Zoltan's graph cut analogue)
    extents = {0: nx, 1: ny, 2: nz}
    axis = max(extents, key=lambda a: extents[a])
    keys = {0: (i, k, j), 1: (j, k, i), 2: (k, j, i)}[axis]
    perm = np.lexsort(keys[::-1]).astype(np.int32)
    nc = grid.nc
    shard = -(-nc // n_shards)
    nc_pad = shard * n_shards
    inv = np.empty(nc, dtype=np.int32)
    inv[perm] = np.arange(nc, dtype=np.int32)
    owner = np.arange(nc_pad, dtype=np.int32) // shard
    return Partition(n_shards=n_shards, perm=perm, inv_perm=inv,
                     shard_size=shard, owner=owner, nc=nc, nc_padded=nc_pad)


def renumber_faces(part: Partition, face_cells: np.ndarray):
    """Map face cell pairs to the new numbering; orient cross-shard faces so
    cell1's shard <= cell2's shard. Returns (faces_new, is_cross)."""
    f = part.inv_perm[face_cells]
    o1 = part.owner[f[:, 0]]
    o2 = part.owner[f[:, 1]]
    swap = o1 > o2
    f_new = f.copy()
    f_new[swap] = f[swap][:, ::-1]
    is_cross = o1 != o2
    span = np.abs(o1.astype(int) - o2.astype(int))
    if is_cross.any():
        assert span.max() <= 1, \
            "slab partition must only produce adjacent-shard faces"
    return f_new, is_cross
