"""Compressible two-phase flow: nonlinear TPFA pressure + reordered transport.

Re-implements the `sim_2p_comp_reorder` stack:

* CompressibleTpfa (/root/reference/opm/core/pressure/CompressibleTpfa.cpp:
  118-185 Newton loop over the C kernel cfs_tpfa_residual.c): here the
  pressure equation is the same total-volume-discrepancy form the kernel
  assembles, written as a pure function and Newton-solved in one
  `lax.while_loop`:

      r_i = pv(p_i) - sum_a [ pv0_i z0_a,i + dt (q^s_a,i - div F^s_a|_i) ]
                      / b_a(p_i)

  with surface-volume face fluxes F^s_a = b_a,up mob_a,up T dphi_a,
  dphi_a = dp - rho_a g dz (phase-potential upwinding). The TPFA-stencil
  scalar Jacobian comes from jacfwd of the same local face/cell functions
  (the models/linearize.py discipline) and each Newton increment is solved
  by AMG-preconditioned BiCGStab over the static trans hierarchy.

* TransportSolverCompressibleTwophaseReorder (/root/reference/opm/core/
  transport/reorder/TransportSolverCompressibleTwophaseReorder.cpp:126-202):
  the per-cell implicit residual

      r(s) = s - B_i z0_w,i + s (pv_i - pv0_i)/pv0_i
                 + dt/pv0_i (outflux f_i(s) + influx)

  (B_i = 1/b_w(p_i), influx/outflux from the fixed total Darcy flux with
  upstream b f) solved for all cells at once by vmapped bracketed bisection,
  wavefront-swept over the upwind DAG instead of the reference's serial
  reordered cell loop.

Rock compressibility (the comprock variant, cfs_tpfa_res_comprock_assemble)
enters through an optional pore-volume multiplier pv_mult(p).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.linalg.amg import build_hierarchy
from opm_tpu.linalg.krylov import bicgstab
from opm_tpu.models import gravity as gravmod
from opm_tpu.native.graph import upwind_levels


class CompTwophaseState(NamedTuple):
    pressure: jnp.ndarray
    sw: jnp.ndarray
    z: jnp.ndarray          # (2, nc) surface-volume densities (b_a s_a)
    flux: jnp.ndarray       # total Darcy face flux (nf,)


class CompressibleTwophaseModel:
    def __init__(self, grid, props, *, gravity_on=True, rock=None,
                 pin_cell=None, pin_val=0.0):
        self.grid = grid
        self.props = props
        self.rock = rock                  # optional RockPVT (pv_mult)
        self.nc = grid.nc
        f = jnp.asarray
        self.face_cells = f(grid.face_cells)
        self.trans = f(grid.trans)
        self.pv_ref = f(grid.pore_volume)
        self.depth = f(grid.depth)
        self.half_dz = f(grid.dz) * 0.5
        self.gravity = grid.gravity if gravity_on else 0.0
        self._amg = build_hierarchy(grid.nc, grid.face_cells,
                                    grid.trans).device()
        self._psolve = jax.jit(self._pressure_newton)
        self._tsolve = jax.jit(self._transport_sweeps,
                               static_argnames=("sweeps",))
        self._columns = None
        # near-incompressible closed systems are singular up to a constant
        # pressure shift; the reference kernel detects and adjusts
        # (cfs_tpfa_res_assemble 'was_adjusted', CompressibleTpfa.cpp:535-545)
        # — here an optional penalty pin on one cell
        self.pin_cell = pin_cell
        self.pin_val = pin_val

    # -- pore volume --------------------------------------------------------
    def pore_volume(self, p):
        if self.rock is not None:
            return self.pv_ref * self.rock.pv_mult(p)
        return self.pv_ref

    # -- local physics ------------------------------------------------------
    def _face_surface_fluxes(self, pL, pR, sL, sR, dz, wfL=1.0, wfR=1.0):
        """(F_w^s, F_o^s, v_total) through one face, shape-generic. wfL/wfR
        are water-mobility multipliers (polymer effects; 1 for plain
        two-phase — CompressibleTpfaPolymer's modified total mobility)."""
        props = self.props
        rw_L, ro_L = props.density(pL)
        rw_R, ro_R = props.density(pR)
        krwL, kroL = props.relperm(sL)
        krwR, kroR = props.relperm(sR)
        mobs = ((wfL * krwL / props.mu_w(pL), wfR * krwR / props.mu_w(pR),
                 props.b_w, 0.5 * (rw_L + rw_R)),
                (kroL / props.mu_o(pL), kroR / props.mu_o(pR),
                 props.b_o, 0.5 * (ro_L + ro_R)))
        out, vtot = [], 0.0
        for mobL, mobR, bfun, rho_f in mobs:
            dphi = (pL - pR) - rho_f * self.gravity * dz
            up = dphi >= 0.0
            mob_up = jnp.where(up, mobL, mobR)
            b_up = jnp.where(up, bfun(pL), bfun(pR))
            vf = mob_up * dphi              # times trans by the caller
            out.append(b_up * vf)
            vtot = vtot + vf
        return out[0], out[1], vtot

    def _cell_surface_sources(self, p, s, src, wf=1.0):
        """Surface-volume phase rates from the reservoir-volume source
        `src` (positive = water injection, negative = total production
        split by fractional flow — the examples' convention)."""
        props = self.props
        krw, kro = props.relperm(s)
        mw = wf * krw / props.mu_w(p)
        mo = kro / props.mu_o(p)
        fw = mw / jnp.maximum(mw + mo, 1e-30)
        q_w_res = jnp.maximum(src, 0.0) + jnp.minimum(src, 0.0) * fw
        q_o_res = jnp.minimum(src, 0.0) * (1.0 - fw)
        return props.b_w(p) * q_w_res, props.b_o(p) * q_o_res

    # -- pressure Newton ----------------------------------------------------
    def _pressure_residual(self, p, sw0, z0, pv0, src, dt, wf):
        """Volume-discrepancy residual (units m3)."""
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        dz = self.depth[c1] - self.depth[c2]
        fw, fo, _ = self._face_surface_fluxes(p[c1], p[c2], sw0[c1], sw0[c2],
                                              dz, wf[c1], wf[c2])
        fw = self.trans * fw
        fo = self.trans * fo
        div_w = jnp.zeros(self.nc).at[c1].add(fw).at[c2].add(-fw)
        div_o = jnp.zeros(self.nc).at[c1].add(fo).at[c2].add(-fo)
        qw, qo = self._cell_surface_sources(p, sw0, src, wf)
        mass_w = pv0 * z0[0] + dt * (qw - div_w)
        mass_o = pv0 * z0[1] + dt * (qo - div_o)
        return (self.pore_volume(p) - mass_w / self.props.b_w(p)
                - mass_o / self.props.b_o(p))

    def _pressure_jacobian_stencil(self, p, sw0, z0, pv0, src, dt, wf):
        """Exact scalar TPFA-stencil Jacobian (diag, off) via jacfwd of the
        shared local functions."""
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        dz = self.depth[c1] - self.depth[c2]
        bw = self.props.b_w(p)
        bo = self.props.b_o(p)

        def face_masses(pLv, pRv, sLv, sRv, dzv, bwLv, boLv, bwRv, boRv,
                        wfLv, wfRv):
            fwv, fov, _ = self._face_surface_fluxes(pLv, pRv, sLv, sRv, dzv,
                                                    wfLv, wfRv)
            # contribution of this face to (r_L, r_R): -dt*(+-F)/b(cell)
            rL = dt * (fwv / bwLv + fov / boLv)
            rR = -dt * (fwv / bwRv + fov / boRv)
            return jnp.stack([rL, rR])

        dface = jax.vmap(jax.jacfwd(face_masses, argnums=(0, 1)))(
            p[c1], p[c2], sw0[c1], sw0[c2], dz, bw[c1], bo[c1], bw[c2],
            bo[c2], wf[c1], wf[c2])
        dL, dR = dface                     # each (nf, 2)
        dL = dL * self.trans[:, None]
        dR = dR * self.trans[:, None]

        def cell_local(pi, pv_refi, sw0i, z0wi, z0oi, pv0i, srci, divwi,
                       divoi, wfi):
            qwi, qoi = self._cell_surface_sources(pi, sw0i, srci, wfi)
            mass_w = pv0i * z0wi + dt * (qwi - divwi)
            mass_o = pv0i * z0oi + dt * (qoi - divoi)
            pvi = pv_refi * (self.rock.pv_mult(pi) if self.rock is not None
                             else 1.0)
            return (pvi - mass_w / self.props.b_w(pi)
                    - mass_o / self.props.b_o(pi))

        # div terms frozen for the diagonal-cell derivative (their own p
        # dependence is already in dface)
        fw, fo, _ = self._face_surface_fluxes(p[c1], p[c2], sw0[c1], sw0[c2],
                                              dz, wf[c1], wf[c2])
        fw = self.trans * fw
        fo = self.trans * fo
        div_w = jnp.zeros(self.nc).at[c1].add(fw).at[c2].add(-fw)
        div_o = jnp.zeros(self.nc).at[c1].add(fo).at[c2].add(-fo)
        dcell = jax.vmap(jax.jacfwd(cell_local))(
            p, self.pv_ref, sw0, z0[0], z0[1], pv0, src, div_w, div_o, wf)

        diag = dcell
        diag = diag.at[c1].add(dL[:, 0])
        diag = diag.at[c2].add(dR[:, 1])
        off_LR = dR[:, 0]                  # row c1, col c2
        off_RL = dL[:, 1]                  # row c2, col c1
        return diag, off_RL, off_LR

    def _pressure_newton(self, p0, sw0, z0, src, dt, wf, tol=1e-8,
                         maxiter=25):
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        pv0 = self.pore_volume(p0)

        def rfun(p):
            return self._pressure_residual(p, sw0, z0, pv0, src, dt, wf)

        # volume-discrepancy residual measured relative to pore volume
        # (tol 1e-8 => max |r| below 1e-8 * max pv, far below any physical
        # volume change per step)
        scale = jnp.max(self.pv_ref)

        def body(carry):
            p, it, _, lin = carry
            r = rfun(p)
            diag, off_RL, off_LR = self._pressure_jacobian_stencil(
                p, sw0, z0, pv0, src, dt, wf)
            if self.pin_cell is not None:
                pen = 1e3 * jnp.max(jnp.abs(diag))
                r = r.at[self.pin_cell].add(
                    pen * (p[self.pin_cell] - self.pin_val))
                diag = diag.at[self.pin_cell].add(pen)

            def matvec(x):
                y = diag * x
                y = y.at[c1].add(off_LR * x[c2])
                y = y.at[c2].add(off_RL * x[c1])
                return y

            off = jnp.concatenate([off_LR, off_RL])
            vals = self._amg.coarsen_values(diag, off)
            res = bicgstab(matvec, r,
                           precond=lambda v: self._amg.vcycle(vals, v),
                           tol=1e-10, maxiter=200)
            p_new = p - res.x
            rn = jnp.max(jnp.abs(rfun(p_new))) / scale
            return (p_new, it + 1, rn, lin + res.iterations)

        def cond(carry):
            _, it, rn, _ = carry
            return (rn > tol) & (it < maxiter)

        r0 = jnp.max(jnp.abs(rfun(p0))) / scale
        p, iters, rn, lin = jax.lax.while_loop(
            cond, body, (p0, jnp.asarray(0), r0, jnp.asarray(0)))

        # total Darcy flux for the transport stage
        dz = self.depth[c1] - self.depth[c2]
        _, _, vtot = self._face_surface_fluxes(p[c1], p[c2], sw0[c1],
                                               sw0[c2], dz, wf[c1], wf[c2])
        return p, self.trans * vtot, iters, rn, lin

    def pressure_solve(self, p0, sw0, z0, src, dt, wf=None):
        """Newton on the pressure equation; returns
        (p, total_flux, newton_iters, final_scaled_residual, linear_iters).
        wf: optional per-cell water-mobility multiplier (polymer)."""
        if wf is None:
            wf = jnp.ones(self.nc)
        return self._psolve(jnp.asarray(p0), jnp.asarray(sw0),
                            jnp.asarray(z0), jnp.asarray(src),
                            jnp.asarray(dt), jnp.asarray(wf))

    # -- transport ----------------------------------------------------------
    def _transport_sweeps(self, s_init, p, z0, pv0, pv, flux, src, dt,
                          sweeps):
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        props = self.props
        bw = props.b_w(p)
        B = 1.0 / bw
        mu_w = props.mu_w(p)
        mu_o = props.mu_o(p)
        comp_term = (pv - pv0) / pv0
        dtpv = dt / pv0

        absf = jnp.abs(flux)
        pos = flux >= 0
        upcell = jnp.where(pos, c1, c2)
        downcell = jnp.where(pos, c2, c1)
        outflux = jnp.zeros(self.nc).at[upcell].add(absf)
        # source split (reference Residual ctor :155-162): inflow enters
        # influx scaled by B_cell, outflow adds to outflux
        src_flux = -src
        influx_src = B * jnp.minimum(src_flux, 0.0)
        outflux = outflux + jnp.maximum(src_flux, 0.0)

        def frac_flow(s, muw, muo):
            krw, kro = props.relperm(s)
            mw = krw / muw
            mo = kro / muo
            return mw / jnp.maximum(mw + mo, 1e-30)

        def one_sweep(s):
            f_up = frac_flow(s[upcell], mu_w[upcell], mu_o[upcell])
            influx = influx_src + (jnp.zeros(self.nc)
                                   .at[downcell].add(
                                       -B[downcell] * bw[upcell] * absf
                                       * f_up))

            def res(sv):
                return (sv - B * z0[0] + sv * comp_term
                        + dtpv * (outflux * frac_flow(sv, mu_w, mu_o)
                                  + influx))

            lo = jnp.zeros(self.nc)
            hi = jnp.ones(self.nc)

            def bis(_, lohi):
                lo, hi = lohi
                mid = 0.5 * (lo + hi)
                rm = res(mid)
                lo = jnp.where(rm < 0, mid, lo)
                hi = jnp.where(rm < 0, hi, mid)
                return (lo, hi)

            lo, hi = jax.lax.fori_loop(0, 60, bis, (lo, hi))
            s_new = 0.5 * (lo + hi)
            return s_new, jnp.max(jnp.abs(s_new - s))

        def cond(carry):
            _, k, ds = carry
            return (k < sweeps) & (ds > 1e-10)

        def body(carry):
            s, k, _ = carry
            s_new, ds = one_sweep(s)
            return (s_new, k + 1, ds)

        s, k, _ = jax.lax.while_loop(
            cond, body, (s_init, jnp.asarray(0), jnp.asarray(jnp.inf)))
        # surface volumes from the immiscible A matrix (computeSurfacevol)
        z = jnp.stack([bw * s, props.b_o(p) * (1.0 - s)])
        return s, z, k

    def transport(self, s0, p_old, p_new, z0, flux, src, dt):
        """Saturation transport with the pressure stage's total flux."""
        sched = upwind_levels(self.nc, np.asarray(self.face_cells),
                              np.asarray(flux))
        budget = sched.nlevels + (20 if sched.max_scc > 1 else 1)
        pv0 = self.pore_volume(jnp.asarray(p_old))
        pv = self.pore_volume(jnp.asarray(p_new))
        return self._tsolve(jnp.asarray(s0), jnp.asarray(p_new),
                            jnp.asarray(z0), pv0, pv, jnp.asarray(flux),
                            jnp.asarray(src), jnp.asarray(dt),
                            sweeps=int(budget))

    # -- gravity segregation -------------------------------------------------
    def gravity_segregation(self, s, p, dt):
        """Column-wise counter-current segregation
        (TransportSolverCompressibleTwophaseReorder::solveGravity)."""
        if self.gravity == 0.0:
            return s, 0
        if self._columns is None:
            self._columns = gravmod.build_columns(self.grid)
        cols = self._columns
        p = jnp.asarray(p)
        rho_w, rho_o = self.props.density(p)
        dtpv = jnp.asarray(dt) / self.pore_volume(p)
        s_new, sweeps = gravmod.segregate(
            jnp.asarray(cols.cells), jnp.asarray(cols.faces), self.trans,
            self.depth, self.half_dz, jnp.asarray(s), dtpv,
            self.props.mu_w(p), self.props.mu_o(p), rho_w, rho_o,
            jnp.asarray(self.gravity), self.props.relperm)
        return s_new, int(sweeps)
