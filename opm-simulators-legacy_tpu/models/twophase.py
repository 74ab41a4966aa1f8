"""Incompressible two-phase flow: TPFA pressure + implicit transport.

Re-implements the `sim_2p_incomp_ad` stack:
  * IncompTpfa (/root/reference/opm/core/pressure/IncompTpfa.{hpp,cpp} over
    the C kernel ifs_tpfa.c): assemble the incompressible TPFA pressure
    system  -div( lambda_t T grad p ) = q + gravity divergence  and solve it
    with CG/BiCGStab + aggregation AMG (instead of LinearSolverFactory's
    ISTL/UMFPACK backends).
  * TransportSolverTwophaseAd (/root/reference/opm/autodiff/
    TransportSolverTwophaseAd.cpp:163-250): implicit Newton on s_w with the
    total face flux fixed from the pressure stage:
       r = s - s0 + (dt/pv) (div F_w(s) - q_w)
       F_w = fw_up * F_t + (fw * mob_o)_upg * T g (rho_w - rho_o) dz
    with upwind fractional flow. The scalar TPFA-stencil Jacobian is
    assembled from a vmapped jacfwd of the SAME local face function the
    residual uses (the discipline of models/linearize.py), and solved with
    Jacobi-preconditioned BiCGStab.

Sources are per-cell volumetric rates `src` (m3/s, positive injection —
the reference examples' src vector, examples/sim_2p_incomp_ad.cpp:93-210);
injected fluid is water.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from opm_tpu.linalg.amg import build_hierarchy
from opm_tpu.linalg.krylov import bicgstab
from opm_tpu.models.bc import assemble_bc_arrays


class TwophaseState(NamedTuple):
    pressure: jnp.ndarray
    sw: jnp.ndarray
    flux: jnp.ndarray   # total face flux (nf,)


class TwophaseModel:
    def __init__(self, grid, props, *, gravity_on=True, bcs=None):
        self.grid = grid
        self.props = props
        self.nc = grid.nc
        f = jnp.asarray
        self.face_cells = f(grid.face_cells)
        self.trans = f(grid.trans)
        self.pv = f(grid.pore_volume)
        self.depth = f(grid.depth)
        self.gravity = grid.gravity if gravity_on else 0.0
        # boundary conditions (FlowBCManager role, models/bc.py); default
        # all-noflow
        pc, pvl, qf = assemble_bc_arrays(bcs, grid.nc)
        self.bc_p_coef = f(pc)
        self.bc_p_val = f(pvl)
        self.bc_q = f(qf)
        self.has_pressure_bc = bool((pc != 0).any())
        self._amg = build_hierarchy(grid.nc, grid.face_cells,
                                    grid.trans).device()
        self._psolve = jax.jit(self._pressure_solve)
        self._tsolve = jax.jit(self._transport_newton)

    # -- shared local physics ----------------------------------------------
    def _face_water_flux(self, swL, swR, f_total, g_flux):
        """Water flux through one face (shape-generic). f_total: total
        volumetric flux L->R; g_flux = T g (rho_w - rho_o) dz (water
        buoyancy driver)."""
        mwL, moL = self.props.mobility(swL)
        mwR, moR = self.props.mobility(swR)
        # viscous: upwind by total-flux direction
        up_v = f_total >= 0
        mw_v = jnp.where(up_v, mwL, mwR)
        mo_v = jnp.where(up_v, moL, moR)
        fw = mw_v / jnp.maximum(mw_v + mo_v, 1e-30)
        # gravity: water-phase driver g_flux; water upwind by its sign,
        # counter-current oil by the opposite
        up_g = g_flux >= 0
        mw_g = jnp.where(up_g, mwL, mwR)
        mo_g = jnp.where(up_g, moR, moL)
        lam = (mw_g * mo_g) / jnp.maximum(mw_g + mo_g, 1e-30)
        return fw * f_total + lam * g_flux

    def _g_flux(self):
        """Water buoyancy driver per face: from Darcy with downward z,
        F_w = fw F_t + (lam_w lam_o / lam_t) T g dz (rho_o - rho_w) — heavy
        water sinks (positive = c1 -> c2 = downward for a z-face)."""
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        rho_w, rho_o = self.props.density
        dz = self.depth[c1] - self.depth[c2]
        return self.trans * self.gravity * (rho_o - rho_w) * dz

    # -- pressure ------------------------------------------------------------
    def _pressure_solve(self, sw, src, p_fix_cell, p_fix_val, wf):
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        mw, mo = self.props.mobility(sw)
        mw = mw * wf            # polymer water-mobility factor (1 = none)
        mt = mw + mo
        mt_f = 0.5 * (mt[c1] + mt[c2])
        a_off = self.trans * mt_f
        diag = jnp.zeros(self.nc).at[c1].add(a_off).at[c2].add(a_off)
        # Dirichlet-pressure boundary faces: T_b lam_t (p - p_bc)
        bc_coef = self.bc_p_coef * mt
        diag = diag + bc_coef
        # gravity drive: total gravity flux through faces -> rhs divergence
        rho_w, rho_o = self.props.density
        gm = mw * rho_w + mo * rho_o
        gm_f = 0.5 * (gm[c1] + gm[c2])
        dz = self.depth[c1] - self.depth[c2]
        # Darcy with downward z: F = T lam_t dp - T (lam.rho)_f g dz
        grav_flux = -self.trans * gm_f * self.gravity * dz
        rhs = jnp.asarray(src) + bc_coef * self.bc_p_val + self.bc_q
        rhs = rhs.at[c1].add(-grav_flux).at[c2].add(grav_flux)
        if not self.has_pressure_bc:
            # pure-Neumann singularity: pin one cell with a diagonal penalty
            pen = 1e3 * jnp.max(diag)
            diag = diag.at[p_fix_cell].add(pen)
            rhs = rhs.at[p_fix_cell].add(pen * p_fix_val)

        def matvec(x):
            y = diag * x
            y = y.at[c1].add(-a_off * x[c2])
            y = y.at[c2].add(-a_off * x[c1])
            return y

        off = jnp.concatenate([-a_off, -a_off])
        vals = self._amg.coarsen_values(diag, off)
        res = bicgstab(matvec, rhs,
                       precond=lambda r: self._amg.vcycle(vals, r),
                       tol=1e-10, maxiter=300)
        p = res.x
        flux = a_off * (p[c1] - p[c2]) + grav_flux
        # realized boundary influx per cell (positive = into the domain)
        q_bc = bc_coef * (self.bc_p_val - p) + self.bc_q
        return p, flux, q_bc, res.iterations

    def pressure_solve(self, sw, src, *, p_fix_cell=0, p_fix_val=1e7,
                       wf=None):
        if wf is None:
            wf = jnp.ones(self.nc)
        return self._psolve(jnp.asarray(sw), jnp.asarray(src),
                            jnp.asarray(p_fix_cell), jnp.asarray(p_fix_val),
                            jnp.asarray(wf))

    # -- transport -------------------------------------------------------------
    def _transport_residual(self, sw, sw0, flux, src, dtpv, g_flux):
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        fw_face = self._face_water_flux(sw[c1], sw[c2], flux, g_flux)
        div = jnp.zeros(self.nc).at[c1].add(fw_face).at[c2].add(-fw_face)
        q_w = jnp.maximum(src, 0.0) + jnp.minimum(src, 0.0) * \
            self.props.fractional_flow(sw)
        return sw - sw0 + dtpv * (div - q_w)

    def _transport_jacobian(self, sw, src, flux, dtpv, g_flux):
        """Exact scalar TPFA-stencil Jacobian via jacfwd of the shared local
        functions. Returns (diag, off_RL, off_LR) where matvec is
           y = diag*x ; y[c1] += off_LR * x[c2] ; y[c2] += off_RL * x[c1]."""
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        dL, dR = jax.vmap(jax.jacfwd(self._face_water_flux,
                                     argnums=(0, 1)))(sw[c1], sw[c2], flux,
                                                      g_flux)

        def cell_local(s, srci):
            q_w = jnp.maximum(srci, 0.0) + jnp.minimum(srci, 0.0) * \
                self.props.fractional_flow(s)
            return -q_w

        dcell = jax.vmap(jax.jacfwd(cell_local))(sw, src)
        diag = 1.0 + dtpv * dcell
        diag = diag.at[c1].add(dtpv[c1] * dL)
        diag = diag.at[c2].add(-dtpv[c2] * dR)
        off_LR = dtpv[c1] * dR          # row c1, col c2
        off_RL = -dtpv[c2] * dL         # row c2, col c1
        return diag, off_RL, off_LR

    def _transport_newton(self, sw0, flux, src, dtpv, max_iter=60):
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        g_flux = self._g_flux()

        def rfun(sw):
            return self._transport_residual(sw, sw0, flux, src, dtpv, g_flux)

        def body(carry):
            sw, it, _ = carry
            r = rfun(sw)
            diag, off_RL, off_LR = self._transport_jacobian(
                sw, src, flux, dtpv, g_flux)

            def matvec(x):
                y = diag * x
                y = y.at[c1].add(off_LR * x[c2])
                y = y.at[c2].add(off_RL * x[c1])
                return y

            res = bicgstab(matvec, r, precond=lambda v: v / diag,
                           tol=1e-10, maxiter=300)
            # Appleyard-style chop (ds_max = 0.2) — full Newton cycles on the
            # S-shaped fractional-flow curve at CFL >~ 1
            ds = jnp.clip(res.x, -0.2, 0.2)
            sw_new = jnp.clip(sw - ds, 0.0, 1.0)
            rn = jnp.max(jnp.abs(rfun(sw_new)))
            return (sw_new, it + 1, rn)

        def cond(carry):
            _, it, rn = carry
            return (rn > 1e-8) & (it < max_iter)

        r0 = jnp.max(jnp.abs(rfun(sw0)))
        sw, iters, rn = jax.lax.while_loop(cond, body,
                                           (sw0, jnp.asarray(0), r0))
        return sw, iters, rn

    def transport_solve(self, sw0, flux, src, dt):
        dtpv = jnp.asarray(dt) / self.pv
        return self._tsolve(jnp.asarray(sw0), flux, jnp.asarray(src), dtpv)
