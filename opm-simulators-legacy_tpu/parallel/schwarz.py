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

    def __init__(self, dims, mesh, axis_name, trans=None, *, coarsest=256):
        nx, ny, nz = dims
        self.dims = dims
        nsh = int(mesh.shape[axis_name])
        if nz % nsh != 0:
            raise ValueError(
                f"nz={nz} must be divisible by the {axis_name!r} mesh axis "
                f"({nsh}) for slab Schwarz")
        self.n_shards = nsh
        self.nzl = nz // nsh
        self.mesh = mesh
        self.axis = axis_name
        self.nc = nx * ny * nz

        # shared level structure from shard-averaged strength
        strength = None
        if trans is not None:
            st = StructuredGmg._host_strength(dims, np.asarray(trans))
            stz, sty, stx = st
            nzl = self.nzl
            stz_p = np.concatenate(
                [stz, np.zeros((1, ny, nx))], axis=0).reshape(
                    nsh, nzl, ny, nx)[:, : nzl - 1]
            strength = [stz_p.mean(axis=0),
                        sty.reshape(nsh, nzl, max(ny - 1, 0), nx).mean(0),
                        stx.reshape(nsh, nzl, ny, max(nx - 1, 0)).mean(0)]
        self.local = StructuredGmg((nx, ny, self.nzl), coarsest=coarsest,
                                   strength=strength)

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
        nx, ny, nz = self.dims
        nzl = self.nzl
        nsh = self.n_shards
        nfx = (nx - 1) * ny * nz
        nfy = nx * (ny - 1) * nz
        nf = nfx + nfy + nx * ny * (nz - 1)
        aL, aR = off0[:nf], off0[nf:]

        # ---- two-level coarse operator over slabs: A_c = R A R^T ------
        zL = aL[nfx + nfy:].reshape(max(nz - 1, 0), ny, nx)
        zR = aR[nfx + nfy:].reshape(max(nz - 1, 0), ny, nx)
        diag_slab = diag0.reshape(nsh, -1).sum(axis=1)
        # per-layer x/y off sums (both orientations) fold into the slab
        # diagonal entirely (those faces never cross slabs)
        xy_layer = (aL[:nfx].reshape(nz, -1).sum(axis=1)
                    + aR[:nfx].reshape(nz, -1).sum(axis=1)
                    + aL[nfx:nfx + nfy].reshape(nz, -1).sum(axis=1)
                    + aR[nfx:nfx + nfy].reshape(nz, -1).sum(axis=1))
        xy_slab = xy_layer.reshape(nsh, nzl).sum(axis=1)
        # z faces: within-slab rows fold into the diagonal, the row at the
        # slab boundary couples p <-> p+1
        zpad = jnp.concatenate([zL + zR,
                                jnp.zeros((1, ny, nx), diag0.dtype)])
        z_in_slab = zpad.reshape(nsh, nzl, ny, nx)[:, : nzl - 1] \
            .reshape(nsh, -1).sum(axis=1)
        Ac = jnp.diag(diag_slab + xy_slab + z_in_slab)
        if nsh > 1:
            cross_rows = jnp.arange(nzl - 1, nz - 1, nzl)
            idx = jnp.arange(nsh - 1)
            Ac = Ac.at[idx, idx + 1].add(
                zL[cross_rows].reshape(nsh - 1, -1).sum(axis=1))
            Ac = Ac.at[idx + 1, idx].add(
                zR[cross_rows].reshape(nsh - 1, -1).sum(axis=1))
        # regularize (near-singular for pure-Neumann pressure systems)
        Ac = Ac + jnp.eye(nsh, dtype=Ac.dtype) * (
            1e-12 * jnp.max(jnp.abs(jnp.diagonal(Ac))))
        coarse_inv = jnp.linalg.inv(
            Ac if Ac.dtype != jnp.float64 else Ac)

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
        b2 = b.reshape(self.n_shards, -1)
        out = self._vcycle_sm(local_vals, b2).reshape(-1)
        # additive coarse correction: x += R^T A_c^{-1} R r — one tiny
        # global reduce per apply restores slab-count-independent
        # convergence (two-level additive Schwarz)
        rc = b2.sum(axis=1)
        ec = coarse_inv @ rc
        return out + jnp.repeat(ec, b2.shape[1])
