"""Shard-local CPR pressure preconditioning: additive-Schwarz GMG.

The reference's distributed CPR applies its AMG/ILU preconditioner on
owner+ghost rows per MPI rank (overlapping Schwarz:
Dune::OverlappingSchwarzOperator + ParallelOverlappingILU0,
/root/reference/opm/autodiff/ISTLSolver.hpp:195-340,
NewtonIterationBlackoilCPR.cpp:141-156) so each preconditioner apply is
rank-local; only Krylov matvecs and dot products communicate.

TPU-native counterpart: cells are slab-partitioned along z (the slowest
axis of the structured layout, so shards are contiguous), and each shard
runs the structured semicoarsened GMG V-cycle (linalg/gmg.py) on its LOCAL
slab inside `shard_map` — zero collectives per preconditioner apply.
Cross-slab z-couplings are dropped from the local hierarchies (Dirichlet
interfaces, block-Jacobi Schwarz); the global diagonal keeps their
contribution, so the local problems stay SPD-ish and the outer Krylov
absorbs the interface error. Under global-view sharding XLA would instead
insert all-gather/halo collectives inside every smoother and transfer of
the V-cycle; here the only remaining collectives in a CPR solve are the
BiCGStab dots (psum) and the matvec halos.

The level structure is shared across shards (required: shard_map traces one
program) by choosing coarsening axes from the shard-averaged coupling
strength.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from opm_tpu.linalg.gmg import StructuredGmg


class SchwarzGmg:
    """Drop-in for StructuredGmg/DeviceAmg (coarsen_values / vcycle) whose
    V-cycles run shard-local under shard_map."""

    wants_canonical_faces = True

    def __init__(self, dims, mesh, axis_name, trans=None, *, coarsest=256):
        nx, ny, nz = dims
        self.dims = dims
        nsh = int(mesh.shape[axis_name])
        self.n_shards = nsh
        # non-divisible nz: pad with zero-coupled ghost layers (identity
        # diagonal rows) appended after the last layer so shard_map sees
        # equal slabs; b is zero-padded per apply and the pad correction
        # sliced away
        self.nzl = -(-nz // nsh)
        self.nzp = self.nzl * nsh
        self.pad_layers = self.nzp - nz
        self.mesh = mesh
        self.axis = axis_name
        self.nc = nx * ny * nz

        # shared level structure from shard-averaged strength
        strength = None
        if trans is not None:
            st = StructuredGmg._host_strength(dims, np.asarray(trans))
            stz, sty, stx = st
            nzl = self.nzl
            nzp = self.nzp
            stz_p = np.concatenate(
                [stz, np.zeros((1 + self.pad_layers, ny, nx))],
                axis=0).reshape(nsh, nzl, ny, nx)[:, : nzl - 1]
            sty_p = np.concatenate(
                [sty, np.zeros((self.pad_layers, max(ny - 1, 0), nx))],
                axis=0)
            stx_p = np.concatenate(
                [stx, np.zeros((self.pad_layers, ny, max(nx - 1, 0)))],
                axis=0)
            strength = [stz_p.mean(axis=0),
                        sty_p.reshape(nsh, nzl, max(ny - 1, 0), nx).mean(0),
                        stx_p.reshape(nsh, nzl, ny, max(nx - 1, 0)).mean(0)]
        self.local = StructuredGmg((nx, ny, self.nzl), coarsest=coarsest,
                                   strength=strength)

        # ---- block coarse space (two-level Schwarz, generalized) -------
        # one coarse DOF per (slab x areal tile) instead of one per slab:
        # a ~16x16-cell tiling gives a coarse operator that carries the
        # long-range pressure modes a channelized field needs (measured:
        # slab-only coarse left Schwarz-CPR at ~3x the global-GMG Krylov
        # iterations; block coarse recovers most of it). All coarse work
        # is global-view (segment-sum + tiny dense solve) — XLA inserts
        # the small collectives.
        bx = max(1, nx // 16)
        by = max(1, ny // 16)
        self.ncoarse = nsh * by * bx
        ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny),
                                 np.arange(nz), indexing="ij")
        bi = np.minimum(ii * bx // nx, bx - 1)
        bj = np.minimum(jj * by // ny, by - 1)
        bs = kk // self.nzl
        bid3 = (bs * by + bj) * bx + bi          # [i, j, k] order
        self.cell_bid = jnp.asarray(
            np.transpose(bid3, (2, 1, 0)).ravel(), dtype=jnp.int32)
        # face-endpoint block ids in the canonical [x | y | z] face order
        bid_g = np.transpose(bid3, (2, 1, 0))     # (nz, ny, nx)
        fb1 = np.concatenate([
            bid_g[:, :, :-1].ravel(), bid_g[:, :-1, :].ravel(),
            bid_g[:-1, :, :].ravel()])
        fb2 = np.concatenate([
            bid_g[:, :, 1:].ravel(), bid_g[:, 1:, :].ravel(),
            bid_g[1:, :, :].ravel()])
        self.face_bid1 = jnp.asarray(fb1, dtype=jnp.int32)
        self.face_bid2 = jnp.asarray(fb2, dtype=jnp.int32)

        spec = P(axis_name)

        def _sq(a):
            return a.reshape(a.shape[1:])

        @partial(jax.shard_map, mesh=mesh, in_specs=(spec,) * 7,
                 out_specs=spec)
        def _coarsen(diag_b, xL, xR, yL, yR, zL, zR):
            nzl = self.nzl
            # drop the cross-slab z face (last padded row)
            zLl = _sq(zL)[: nzl - 1]
            zRl = _sq(zR)[: nzl - 1]
            aL = jnp.concatenate([_sq(xL).ravel(), _sq(yL).ravel(),
                                  zLl.ravel()])
            aR = jnp.concatenate([_sq(xR).ravel(), _sq(yR).ravel(),
                                  zRl.ravel()])
            vals = self.local.coarsen_values(_sq(diag_b).ravel(),
                                             jnp.concatenate([aL, aR]))
            return jax.tree.map(lambda a: a[None], vals)

        @partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec),
                 out_specs=spec)
        def _vcycle(vals, b_b):
            vals_l = jax.tree.map(_sq, vals)
            x = self.local.vcycle(vals_l, b_b.ravel())
            return x[None]

        self._coarsen_sm = _coarsen
        self._vcycle_sm = _vcycle

    def coarsen_values(self, diag0, off0):
        """Same signature as StructuredGmg.coarsen_values: diag0 (nc,),
        off0 (2*nf,) = [aLR | aRL] in grid face order. The returned pytree
        carries the per-shard local hierarchies plus the two-level coarse
        operator (one DOF per slab — the Nicolaides-style coarse space of
        two-level additive Schwarz, arXiv:1401.7227): A_c = R A R^T with R
        the slab indicator, which re-inserts exactly the cross-slab
        couplings the local hierarchies drop."""
        nx, ny, nz0 = self.dims
        nzl = self.nzl
        nsh = self.n_shards
        nfx0 = (nx - 1) * ny * nz0
        nfy0 = nx * (ny - 1) * nz0
        nf = nfx0 + nfy0 + nx * ny * (nz0 - 1)
        aL0, aR0 = off0[:nf], off0[nf:]
        diag_unpadded = diag0
        pad = self.pad_layers
        nz = self.nzp

        def pad_faces(v):
            x = jnp.concatenate([
                v[:nfx0].reshape(nz0, -1),
                jnp.zeros((pad, (nx - 1) * ny), v.dtype)]).ravel()
            y = jnp.concatenate([
                v[nfx0:nfx0 + nfy0].reshape(nz0, -1),
                jnp.zeros((pad, nx * (ny - 1)), v.dtype)]).ravel()
            z = jnp.concatenate([
                v[nfx0 + nfy0:].reshape(nz0 - 1, -1),
                jnp.zeros((pad, nx * ny), v.dtype)]).ravel()
            return jnp.concatenate([x, y, z])

        if pad:
            diag0 = jnp.concatenate([
                diag0, jnp.ones(pad * ny * nx, diag0.dtype)])
            aL = pad_faces(aL0)
            aR = pad_faces(aR0)
        else:
            aL, aR = aL0, aR0
        nfx = (nx - 1) * ny * nz
        nfy = nx * (ny - 1) * nz

        # ---- block coarse operator A_c = R A R^T (R = block indicator
        # over slab x areal tiles) — scatter-add of the UNPADDED entries
        ncoar = self.ncoarse
        Ac = jnp.zeros((ncoar, ncoar), diag_unpadded.dtype)
        Ac = Ac.at[self.cell_bid, self.cell_bid].add(diag_unpadded)
        Ac = Ac.at[self.face_bid1, self.face_bid2].add(aL0)
        Ac = Ac.at[self.face_bid2, self.face_bid1].add(aR0)
        # regularize (near-singular for pure-Neumann pressure systems)
        Ac = Ac + jnp.eye(ncoar, dtype=Ac.dtype) * (
            1e-12 * jnp.max(jnp.abs(jnp.diagonal(Ac))))
        coarse_inv = jnp.linalg.inv(Ac)

        def blocks(v):
            x = v[:nfx].reshape(nsh, nzl, ny, max(nx - 1, 0))
            y = v[nfx:nfx + nfy].reshape(nsh, nzl, max(ny - 1, 0), nx)
            z = v[nfx + nfy:].reshape(max(nz - 1, 0), ny, nx)
            # pad one zero row so that row k = face below layer k exists
            # for every k; the last row per slab is the cross face
            z = jnp.concatenate([z, jnp.zeros((1, ny, nx), v.dtype)],
                                axis=0).reshape(nsh, nzl, ny, nx)
            return x, y, z

        xLb, yLb, zLb = blocks(aL)
        xRb, yRb, zRb = blocks(aR)
        diag_b = diag0.reshape(nsh, nzl, ny, nx)
        local_vals = self._coarsen_sm(diag_b, xLb, xRb, yLb, yRb, zLb, zRb)
        return (local_vals, coarse_inv)

    def vcycle(self, vals, b, **_):
        local_vals, coarse_inv = vals
        b0 = b
        if self.pad_layers:
            nx, ny, _ = self.dims
            b = jnp.concatenate([
                b, jnp.zeros(self.pad_layers * ny * nx, b.dtype)])
        b2 = b.reshape(self.n_shards, -1)
        out = self._vcycle_sm(local_vals, b2).reshape(-1)
        if self.pad_layers:
            out = out[: self.nc]
        # additive coarse correction x += R^T A_c^{-1} R r over the block
        # coarse space — a segment-sum + tiny dense product per apply
        # (two-level additive Schwarz; block tiles carry the long-range
        # pressure modes a slab-only coarse space misses)
        rc = jnp.zeros(self.ncoarse, b0.dtype).at[self.cell_bid].add(b0)
        ec = coarse_inv @ rc
        return out + ec[self.cell_bid]
