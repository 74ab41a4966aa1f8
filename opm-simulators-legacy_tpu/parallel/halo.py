"""Explicit halo-exchange kernels via shard_map + ppermute.

TPU-native counterpart of the reference's overlapping-Schwarz machinery:
Dune::OwnerOverlapCopyCommunication's copyOwnerToAll halo updates inside
Krylov iterations (/root/reference/opm/autodiff/ISTLSolver.hpp:283-340) and
the owner-masked global reductions of ParallelISTLInformation
(BlackoilModelBase_impl.hpp:1651-1689). Cells are sharded as contiguous
slabs (parallel/partition.py); each SpMV ppermutes one boundary layer to the
two ICI neighbors, computes locally, and reductions psum over the mesh.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opm_tpu.parallel.partition import Partition, renumber_faces


@dataclass
class HaloSpmvData:
    """Static per-shard structure for a scalar TPFA SpMV (device pytree;
    leading axis = shard)."""

    n_shards: int
    shard_size: int
    # interior faces, local indices, padded to the max per shard
    int_c1: jnp.ndarray      # (P, F_int)
    int_c2: jnp.ndarray
    int_mask: jnp.ndarray    # (P, F_int) 0/1
    # cross faces to the RIGHT neighbor: local cell (this shard, near the
    # right edge) <-> remote cell (next shard, near its left edge)
    # send buffers: local indices whose values the LEFT face-partner needs
    send_left_idx: jnp.ndarray   # (P, H) local cells adjacent to shard p-1
    send_right_idx: jnp.ndarray  # (P, H) local cells adjacent to shard p+1
    # cross-face lists: (local_cell, ghost_slot into the recv buffer)
    crossL_cell: jnp.ndarray     # (P, C) faces to the left neighbor
    crossL_slot: jnp.ndarray
    crossL_mask: jnp.ndarray
    crossR_cell: jnp.ndarray
    crossR_slot: jnp.ndarray
    crossR_mask: jnp.ndarray


def build_halo_spmv(part: Partition, face_cells: np.ndarray):
    """Host-side setup: classify faces, build send/ghost index tables.
    Face values must later be supplied split as (interior_vals, crossL_vals,
    crossR_vals) matching the returned reorderings — use `split_face_values`
    with the returned index arrays."""
    Pn = part.n_shards
    m = part.shard_size
    f_new, is_cross = renumber_faces(part, face_cells)
    owner1 = part.owner[f_new[:, 0]]

    # interior faces per shard
    int_faces = [[] for _ in range(Pn)]
    for fi in np.nonzero(~is_cross)[0]:
        int_faces[owner1[fi]].append(fi)
    F_int = max((len(v) for v in int_faces), default=1) or 1

    # cross faces: owner1 < owner2 (oriented in renumber_faces); the face
    # belongs to BOTH shards' matvecs: shard p (右 side) and p+1 (left side)
    crossR = [[] for _ in range(Pn)]   # faces between p and p+1, seen by p
    for fi in np.nonzero(is_cross)[0]:
        crossR[owner1[fi]].append(fi)
    C = max((len(v) for v in crossR), default=1) or 1

    # send sets: shard p+1 must send its cells adjacent to p (the face's
    # cell2) to p; shard p must send its cell1s to p+1
    send_right = [[] for _ in range(Pn)]  # cells of p needed by p+1
    send_left = [[] for _ in range(Pn)]   # cells of p needed by p-1
    slotR = {}
    slotL = {}
    for p in range(Pn):
        seenR = {}
        seenL = {}
        for fi in crossR[p]:
            c1 = int(f_new[fi, 0])  # in shard p
            c2 = int(f_new[fi, 1])  # in shard p+1
            lc1 = c1 - p * m
            lc2 = c2 - (p + 1) * m
            if lc1 not in seenR:
                seenR[lc1] = len(send_right[p])
                send_right[p].append(lc1)
            if lc2 not in seenL:
                seenL[lc2] = len(send_left[p + 1])
                send_left[p + 1].append(lc2)
            slotR[fi] = seenR[lc1]      # slot in p's send_right == ghost
            slotL[fi] = seenL[lc2]      # slot of c2 in (p+1)'s send_left
    H = max(max((len(v) for v in send_right), default=1),
            max((len(v) for v in send_left), default=1), 1)

    def pad2(lists, fill=0):
        out = np.full((Pn, max(1, max((len(v) for v in lists), default=1))),
                      fill, dtype=np.int32)
        for p, v in enumerate(lists):
            out[p, :len(v)] = v
        return out

    int_c1 = np.zeros((Pn, F_int), dtype=np.int32)
    int_c2 = np.zeros((Pn, F_int), dtype=np.int32)
    int_mask = np.zeros((Pn, F_int))
    int_face_ids = np.zeros((Pn, F_int), dtype=np.int64)
    for p, faces in enumerate(int_faces):
        for k, fi in enumerate(faces):
            int_c1[p, k] = f_new[fi, 0] - p * m
            int_c2[p, k] = f_new[fi, 1] - p * m
            int_mask[p, k] = 1.0
            int_face_ids[p, k] = fi

    # cross-face views from both sides
    crossR_cell = np.zeros((Pn, C), dtype=np.int32)
    crossR_slot = np.zeros((Pn, C), dtype=np.int32)
    crossR_mask = np.zeros((Pn, C))
    crossR_ids = np.zeros((Pn, C), dtype=np.int64)
    crossL_cell = np.zeros((Pn, C), dtype=np.int32)
    crossL_slot = np.zeros((Pn, C), dtype=np.int32)
    crossL_mask = np.zeros((Pn, C))
    crossL_ids = np.zeros((Pn, C), dtype=np.int64)
    for p in range(Pn):
        for k, fi in enumerate(crossR[p]):
            # side of shard p: local cell c1, ghost = c2 (sent by p+1's
            # send_left, arriving in p's recv-from-right buffer)
            crossR_cell[p, k] = f_new[fi, 0] - p * m
            crossR_slot[p, k] = slotL[fi]
            crossR_mask[p, k] = 1.0
            crossR_ids[p, k] = fi
            # side of shard p+1: local cell c2, ghost = c1 (sent by p's
            # send_right, arriving in (p+1)'s recv-from-left buffer)
            crossL_cell[p + 1, k] = f_new[fi, 1] - (p + 1) * m
            crossL_slot[p + 1, k] = slotR[fi]
            crossL_mask[p + 1, k] = 1.0
            crossL_ids[p + 1, k] = fi

    send_right_idx = pad2(send_right)
    send_left_idx = pad2(send_left)
    if send_right_idx.shape[1] < H:
        send_right_idx = np.pad(send_right_idx,
                                ((0, 0), (0, H - send_right_idx.shape[1])))
    if send_left_idx.shape[1] < H:
        send_left_idx = np.pad(send_left_idx,
                               ((0, 0), (0, H - send_left_idx.shape[1])))

    data = HaloSpmvData(
        n_shards=Pn, shard_size=m,
        int_c1=jnp.asarray(int_c1), int_c2=jnp.asarray(int_c2),
        int_mask=jnp.asarray(int_mask),
        send_left_idx=jnp.asarray(send_left_idx),
        send_right_idx=jnp.asarray(send_right_idx),
        crossL_cell=jnp.asarray(crossL_cell),
        crossL_slot=jnp.asarray(crossL_slot),
        crossL_mask=jnp.asarray(crossL_mask),
        crossR_cell=jnp.asarray(crossR_cell),
        crossR_slot=jnp.asarray(crossR_slot),
        crossR_mask=jnp.asarray(crossR_mask))
    maps = dict(int_face_ids=int_face_ids, crossR_ids=crossR_ids,
                crossL_ids=crossL_ids)
    return data, maps


def split_face_values(vals_global: np.ndarray, maps) -> tuple:
    """Reorder global per-face values (in the ORIGINAL face ordering) into
    the per-shard (interior, crossR, crossL) layouts."""
    return (jnp.asarray(vals_global[maps["int_face_ids"]]),
            jnp.asarray(vals_global[maps["crossR_ids"]]),
            jnp.asarray(vals_global[maps["crossL_ids"]]))


def make_halo_spmv(mesh: Mesh, axis: str, data: HaloSpmvData):
    """Returns spmv(diag_sharded, int_vals, crossR_vals, crossL_vals, x)
    with every array sharded on the leading axis over `axis`.

    Shapes inside the shard (leading mesh axis stripped by shard_map):
      diag, x: (m,); int_vals: (F_int,); cross vals: (C,).
    """
    Pn = data.n_shards

    def local_spmv(diag, int_c1, int_c2, int_mask, int_vals,
                   sl_idx, sr_idx, cl_cell, cl_slot, cl_mask, cl_vals,
                   cr_cell, cr_slot, cr_mask, cr_vals, x):
        # one boundary layer to each ICI neighbor
        send_r = x[sr_idx[0]]
        send_l = x[sl_idx[0]]
        recv_from_left = jax.lax.ppermute(
            send_r, axis, [(i, i + 1) for i in range(Pn - 1)])
        recv_from_right = jax.lax.ppermute(
            send_l, axis, [(i + 1, i) for i in range(Pn - 1)])
        y = diag[0] * x
        v = int_vals[0] * int_mask[0]
        y = y.at[int_c1[0]].add(v * x[int_c2[0]])
        y = y.at[int_c2[0]].add(v * x[int_c1[0]])
        vr = cr_vals[0] * cr_mask[0]
        y = y.at[cr_cell[0]].add(vr * recv_from_right[cr_slot[0]])
        vl = cl_vals[0] * cl_mask[0]
        y = y.at[cl_cell[0]].add(vl * recv_from_left[cl_slot[0]])
        return y

    spec1 = P(axis)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(spec1,) * 16, out_specs=spec1)
    def spmv(diag, int_c1, int_c2, int_mask, int_vals, sl_idx, sr_idx,
             cl_cell, cl_slot, cl_mask, cl_vals, cr_cell, cr_slot, cr_mask,
             cr_vals, x):
        xl = x.reshape(-1)
        y = local_spmv(diag, int_c1, int_c2, int_mask, int_vals,
                       sl_idx, sr_idx, cl_cell, cl_slot, cl_mask, cl_vals,
                       cr_cell, cr_slot, cr_mask, cr_vals, xl)
        return y.reshape(1, -1)

    def apply(diag_flat, int_vals, crossR_vals, crossL_vals, x_flat):
        d = data
        return spmv(diag_flat.reshape(Pn, -1),
                    d.int_c1, d.int_c2, d.int_mask, int_vals,
                    d.send_left_idx, d.send_right_idx,
                    d.crossL_cell, d.crossL_slot, d.crossL_mask, crossL_vals,
                    d.crossR_cell, d.crossR_slot, d.crossR_mask, crossR_vals,
                    x_flat.reshape(Pn, -1)).reshape(-1)

    return apply


def psum_all(x, axis):
    """Owner-masked global reduction (ParallelISTLInformation analogue)."""
    return jax.lax.psum(x, axis)
