"""Shard-local CPR pressure preconditioning: restricted additive Schwarz GMG.

The reference's distributed CPR applies its AMG/ILU preconditioner on
owner+ghost rows per MPI rank (overlapping Schwarz:
Dune::OverlappingSchwarzOperator + ParallelOverlappingILU0,
/root/reference/opm/autodiff/ISTLSolver.hpp:195-340,
NewtonIterationBlackoilCPR.cpp:141-156) so each preconditioner apply is
rank-local; only Krylov matvecs and dot products communicate.

TPU-native counterpart: cells are slab-partitioned along z (the slowest
axis of the structured layout, so shards are contiguous), and each shard
runs the structured semicoarsened GMG V-cycle (linalg/gmg.py) on its LOCAL
slab EXTENDED by `overlap` ghost layers from each z-neighbor (restricted
additive Schwarz: solve on the overlapping subdomain, keep only the owned
rows of the correction). The halo exchange is one small ppermute pair per
apply (2*o*ny*nx values); the V-cycle itself stays collective-free inside
`shard_map`. Overlap matters: measured on an 8-shard heterogeneous TPFA
system (32x32x40), zero overlap costs 2.1x the Krylov iterations of the
global hierarchy (17 vs 8) while ONE ghost layer recovers most of it
(10 vs 8); wider overlaps measured no better (o2=11, o4=10), so the
default is OPM_TPU_SCHWARZ_OVERLAP=1.
Under global-view sharding XLA would instead insert all-gather/halo
collectives inside every smoother and transfer of the V-cycle; here the
only remaining collectives in a CPR solve are the BiCGStab dots (psum),
the matvec halos, and the per-apply ghost-layer ppermute.

The level structure is shared across shards (required: shard_map traces one
program) by choosing coarsening axes from the shard-averaged coupling
strength over the EXTENDED windows.
"""

from __future__ import annotations

import os
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

    def __init__(self, dims, mesh, axis_name, trans=None, *, coarsest=256,
                 overlap=None):
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
        if overlap is None:
            overlap = int(os.environ.get("OPM_TPU_SCHWARZ_OVERLAP", "1"))
        # ghost layers cannot exceed the neighbor slab
        self.overlap = o = max(0, min(int(overlap), self.nzl))
        self.nzl_ext = self.nzl + 2 * o

        # shared level structure from shard-averaged strength over the
        # extended (owned + ghost) windows
        strength = None
        if trans is not None:
            stz, sty, stx = StructuredGmg._host_strength(
                dims, np.asarray(trans))
            nzl, nzp = self.nzl, self.nzp

            def embed(a, rows, off):
                out = np.zeros((rows,) + a.shape[1:])
                out[off:off + a.shape[0]] = a
                return out

            vz = embed(stz, nzp - 1 + 2 * o, o)
            vy = embed(sty, nzp + 2 * o, o)
            vx = embed(stx, nzp + 2 * o, o)
            strength = [
                np.mean([vz[s * nzl: s * nzl + nzl + 2 * o - 1]
                         for s in range(nsh)], axis=0),
                np.mean([vy[s * nzl: s * nzl + nzl + 2 * o]
                         for s in range(nsh)], axis=0),
                np.mean([vx[s * nzl: s * nzl + nzl + 2 * o]
                         for s in range(nsh)], axis=0)]
        self.local = StructuredGmg((nx, ny, self.nzl_ext), coarsest=coarsest,
                                   strength=strength)

        # ---- block coarse space (two-level Schwarz, generalized) -------
        # one coarse DOF per (slab z-block x areal tile) instead of one
        # per slab: a ~4x4-cell areal tiling with z-resolved blocks gives
        # a coarse operator that carries the long-range pressure modes a
        # channelized field needs.  Measured on the REAL 102k CPR system
        # (tools/schwarz_cpr_ab.py, round 3): with the PRE-coarse hybrid
        # ordering (see vcycle) the well-dominated t=0 full-CPR solve is
        # 1 iteration (global GMG: 1) and the production-like state is
        # 3 vs 2 — the TPFA proxy (tools/schwarz_ab.py) understated the
        # coarse-ordering effect.  All coarse work is global-view
        # (segment-sum + tiny dense solve) — XLA inserts the small
        # collectives.
        tile = int(os.environ.get("OPM_TPU_SCHWARZ_TILE", "4"))
        bx = max(1, nx // tile)
        by = max(1, ny // tile)
        # z-blocks per slab (coarse z resolution inside each shard)
        zb = int(os.environ.get("OPM_TPU_SCHWARZ_ZB", "4"))
        zb = max(1, min(zb, self.nzl))
        self.ncoarse = nsh * zb * by * bx
        ii, jj, kk = np.meshgrid(np.arange(nx), np.arange(ny),
                                 np.arange(nz), indexing="ij")
        bi = np.minimum(ii * bx // nx, bx - 1)
        bj = np.minimum(jj * by // ny, by - 1)
        kk_local = kk % self.nzl
        bs = (kk // self.nzl) * zb + np.minimum(
            kk_local * zb // self.nzl, zb - 1)
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
        nzl = self.nzl

        def _sq(a):
            return a.reshape(a.shape[1:])

        def _halo_up(a, n):
            """The PREVIOUS shard's last n rows (zeros on shard 0)."""
            if n == 0:
                return a[:0]
            return jax.lax.ppermute(
                a[-n:], axis_name, [(i, i + 1) for i in range(nsh - 1)])

        def _halo_dn(a, n):
            """The NEXT shard's first n rows (zeros on the last shard)."""
            if n == 0:
                return a[:0]
            return jax.lax.ppermute(
                a[:n], axis_name, [(i + 1, i) for i in range(nsh - 1)])

        def _extend(a, n):
            if n == 0:
                return a
            return jnp.concatenate([_halo_up(a, n), a, _halo_dn(a, n)])

        @partial(jax.shard_map, mesh=mesh, in_specs=(spec,) * 7,
                 out_specs=spec)
        def _coarsen(diag_b, xL, xR, yL, yR, zL, zR):
            d = _extend(_sq(diag_b), o)
            # boundary-ghost rows arrive as zeros: make them identity rows
            d = jnp.where(d == 0.0, 1.0, d)
            xLe, xRe, yLe, yRe = (_extend(_sq(a), o)
                                  for a in (xL, xR, yL, yR))
            if o == 0:
                # drop the cross-slab z face (last padded row)
                zLe = _sq(zL)[: nzl - 1]
                zRe = _sq(zR)[: nzl - 1]
            else:
                # local z rows 0..nzl-1 cover faces below each owned layer
                # incl. the cross face into the next slab (now interior to
                # the extended domain); prepend the previous shard's last o
                # rows, append the next shard's first o-1 rows
                zLe = jnp.concatenate([
                    _halo_up(_sq(zL), o), _sq(zL), _halo_dn(_sq(zL), o - 1)])
                zRe = jnp.concatenate([
                    _halo_up(_sq(zR), o), _sq(zR), _halo_dn(_sq(zR), o - 1)])
            aL = jnp.concatenate([xLe.ravel(), yLe.ravel(), zLe.ravel()])
            aR = jnp.concatenate([xRe.ravel(), yRe.ravel(), zRe.ravel()])
            vals = self.local.coarsen_values(d.ravel(),
                                             jnp.concatenate([aL, aR]))
            return jax.tree.map(lambda a: a[None], vals)

        @partial(jax.shard_map, mesh=mesh, in_specs=(spec, spec),
                 out_specs=spec)
        def _vcycle(vals, b_b):
            vals_l = jax.tree.map(_sq, vals)
            b3 = _sq(b_b).reshape(nzl, ny, nx)
            b_ext = _extend(b3, o)
            x = self.local.vcycle(vals_l, b_ext.ravel())
            # restricted additive Schwarz: keep only the owned rows
            x_own = x.reshape(self.nzl_ext, ny, nx)[o: o + nzl]
            return x_own.reshape(1, -1)

        self._coarsen_sm = _coarsen
        self._vcycle_sm = _vcycle

    def coarsen_values(self, diag0, off0):
        """Same signature as StructuredGmg.coarsen_values: diag0 (nc,),
        off0 (2*nf,) = [aLR | aRL] in grid face order. The returned pytree
        carries the per-shard local hierarchies (over the overlap-extended
        slabs) plus the two-level coarse operator (one DOF per slab x areal
        tile — the Nicolaides-style coarse space of two-level additive
        Schwarz, arXiv:1401.7227): A_c = R A R^T with R the block
        indicator, which re-inserts the long-range coupling the local
        hierarchies cannot carry."""
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

        # global 7-point stencil (internal z,y,x order, like gmg.py) for
        # the multiplicative coarse step's one residual matvec per apply
        def split(v):
            return (v[nfx0 + nfy0:].reshape(max(nz0 - 1, 0), ny, nx),
                    v[nfx0:nfx0 + nfy0].reshape(nz0, max(ny - 1, 0), nx),
                    v[:nfx0].reshape(nz0, ny, max(nx - 1, 0)))

        aLz, aLy, aLx = split(aL0)
        aRz, aRy, aRx = split(aR0)
        stencil = (diag_unpadded.reshape(nz0, ny, nx),
                   ((aLz, aRz), (aLy, aRy), (aLx, aRx)))
        return (local_vals, coarse_inv, stencil)

    def _local(self, local_vals, b):
        """One RAS sweep of shard-local V-cycles (pad/unpad around the
        shard_map program)."""
        nx, ny, _ = self.dims
        if self.pad_layers:
            b = jnp.concatenate([
                b, jnp.zeros(self.pad_layers * ny * nx, b.dtype)])
        out = self._vcycle_sm(local_vals, b.reshape(self.n_shards, -1))
        out = out.reshape(-1)
        return out[: self.nc] if self.pad_layers else out

    def _coarse(self, coarse_inv, r):
        rc = jnp.zeros(self.ncoarse, r.dtype).at[self.cell_bid].add(r)
        return (coarse_inv @ rc)[self.cell_bid]

    def vcycle(self, vals, b, **_):
        local_vals, coarse_inv, stencil = vals
        nx, ny, nz0 = self.dims
        diag3, offs = stencil

        def resid(x):
            Ax = StructuredGmg._matvec(diag3, offs,
                                       x.reshape(nz0, ny, nx)).reshape(-1)
            return b - Ax

        # Hybrid two-level Schwarz (Smith/Bjorstad/Gropp ch.2). Mode knob
        # OPM_TPU_SCHWARZ_COARSE:
        #   pre  (default): coarse solve FIRST, local V-cycles on the
        #        corrected residual — the local sweeps smooth away the
        #        blocky (piecewise-constant) coarse correction, so no
        #        high-frequency error survives the apply.  Measured on the
        #        REAL 102k CPR system (tools/schwarz_cpr_ab) the old
        #        post-coarse order left full-system BiCGStab at 48 its on
        #        the well-dominated t=0 state (global GMG: 1) because the
        #        coarse blockiness was the LAST thing written; pre-coarse
        #        recovers near-global counts.
        #   post: local first, coarse on the post-local residual
        #   add : additive (coarse + local on the same residual)
        #   off : local only (debugging)
        # Each multiplicative mode costs one global 7-point stencil apply
        # (XLA halo collectives) + segment-sum + tiny dense product.
        mode = os.environ.get("OPM_TPU_SCHWARZ_COARSE", "pre")
        if mode == "off":
            return self._local(local_vals, b)
        if mode == "add":
            return self._local(local_vals, b) + self._coarse(coarse_inv, b)
        if mode == "post":
            out = self._local(local_vals, b)
            return out + self._coarse(coarse_inv, resid(out))
        ec = self._coarse(coarse_inv, b)
        return ec + self._local(local_vals, resid(ec))
