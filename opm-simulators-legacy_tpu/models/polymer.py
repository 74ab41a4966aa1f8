"""Polymer flooding: coupled (s_w, c) transport + polymer-aware pressure.

Re-implements the capability of the reference polymer stack
(/root/reference/opm/polymer/):
  * IncompTpfaPolymer (IncompTpfaPolymer.hpp:40-112): TPFA pressure with
    polymer-modified water mobility.
  * TransportSolverTwophasePolymer (TransportSolverTwophasePolymer.cpp:
    37-331): reordered single-cell solves of the coupled (s, c) system —
    here a vmapped damped 2x2 Newton over all cells, swept wavefront-style
    (the level-scheduled redesign of the reference's reorder loop), with the
    polymer equation
      d/dt[(1-dps) s c + rho_r (1-phi)/phi ads(c)] + div(c m(c) F_w) = q_c
    (Todd-Longstaff velocity factor m(c), adsorption, dead pore volume).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.models import gravity as gravmod
from opm_tpu.models.twophase import TwophaseModel
from opm_tpu.native.graph import upwind_levels
from opm_tpu.props.polymer import PolymerProperties


class PolymerState(NamedTuple):
    pressure: jnp.ndarray
    sw: jnp.ndarray
    c: jnp.ndarray        # polymer concentration in water [kg/m3]
    cmax: jnp.ndarray     # historical maximum (no-desorption isotherm)
    flux: jnp.ndarray


class PolymerTwophaseModel(TwophaseModel):
    """Two-phase incompressible flow with polymer in the water phase."""

    def __init__(self, grid, props, poly: PolymerProperties, **kw):
        super().__init__(grid, props, **kw)
        self.poly = poly
        self.porosity = jnp.asarray(grid.poro)
        self.volume = jnp.asarray(grid.volume)
        self._ptsolve = jax.jit(self._polymer_transport,
                                static_argnames=("sweeps",))
        self._columns = None
        # stable closures for segregate_polymer's static function args
        # (fresh lambdas per call would retrace every step)
        poly_, props_ = self.poly, self.props
        mu_w_, mu_o_ = props_.viscosity

        def _gseg_water_mob(s_, c_, cmax_, cell_sel):
            krw, _ = props_.relperm(s_)
            return krw / mu_w_ * poly_.water_mob_factor(c_, mu_w_, cmax_)

        def _gseg_oil_mob(s_, cell_sel):
            _, kro = props_.relperm(s_)
            return kro / mu_o_

        def _gseg_mc(c_, cell_sel):
            return c_ * poly_.polymer_frac_in_water(c_, mu_w_)

        def _gseg_ads(c_, cmax_):
            return poly_.adsorption(c_, cmax_)

        self._gseg_fns = (_gseg_water_mob, _gseg_oil_mob, _gseg_mc,
                          _gseg_ads)

    # -- pressure with polymer-modified mobility ---------------------------
    def polymer_mobility(self, sw, c, cmax):
        krw, kro = self.props.relperm(sw)
        mu_w, mu_o = self.props.viscosity
        fac = self.poly.water_mob_factor(c, mu_w, cmax)
        return krw / mu_w * fac, kro / mu_o

    def pressure_solve_polymer(self, sw, c, cmax, src, **kw):
        """IncompTpfaPolymer: the polymer water-mobility factor enters the
        TPFA solve as a traced per-cell multiplier. (The previous
        props-patching approach baked the FIRST call's concentration into
        the jitted trace as a constant — every later pressure solve used
        stale polymer viscosities.)"""
        mu_w = self.props.viscosity[0]
        wf = self.poly.water_mob_factor(jnp.asarray(c), mu_w,
                                        jnp.asarray(cmax))
        return self.pressure_solve(sw, src, wf=wf, **kw)

    # -- coupled (s, c) transport -------------------------------------------
    def _polymer_residual(self, s, c, s0, c0, cmax0, influx_w, influx_c,
                          outflux, src, src_c, dtpv, rock, v_w=None):
        """(r_s, r_c), shape-generic (whole grid or one cell); `rock` is
        rho_rock (1-phi)/phi for the matching cells; `v_w` optional water
        velocity for PLYSHLOG shear thinning."""
        poly = self.poly
        mu_w, mu_o = self.props.viscosity
        krw, kro = self.props.relperm(s)
        mob_w = krw / mu_w * poly.water_mob_factor(c, mu_w, cmax0, v_w=v_w)
        mob_o = kro / mu_o
        fw = mob_w / jnp.maximum(mob_w + mob_o, 1e-30)
        q_w = jnp.maximum(src, 0.0) + jnp.minimum(src, 0.0) * fw
        r_s = s - s0 + dtpv * (outflux * fw - influx_w - q_w)
        # polymer: accumulation incl. dead pore volume + rock adsorption
        dps = poly.dead_pore_vol
        acc = (1.0 - dps) * s * c + rock * poly.adsorption(c, cmax0)
        acc0 = (1.0 - dps) * s0 * c0 + rock * poly.adsorption(c0, cmax0)
        mc = poly.polymer_frac_in_water(c, mu_w)
        q_c = jnp.maximum(src_c, 0.0) + jnp.minimum(src, 0.0) * fw * c * mc
        r_c = acc - acc0 + dtpv * (outflux * fw * c * mc - influx_c - q_c)
        return r_s, r_c

    # -- implicit (global Newton) transport ------------------------------
    def implicit_transport(self, s0, c0, cmax0, flux, src, src_c, dt,
                           *, max_iter=25, tol=1e-10):
        """SinglePointUpwindTwoPhasePolymer / ImplicitTransport framework
        role (/root/reference/opm/polymer/SinglePointUpwindTwoPhasePolymer
        .hpp): the coupled (s, c) transport solved as ONE global Newton
        with single-point-upwind fluxes — the implicit alternative to the
        wavefront-reordered sweeps (_polymer_transport). Dense jacfwd
        Jacobian: a framework-parity demonstrator for moderate grids; the
        production path remains the reorder solver."""
        import jax

        nc = self.nc
        poly = self.poly
        mu_w, mu_o = self.props.viscosity
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        pos = flux >= 0
        upcell = jnp.where(pos, c1, c2)
        absf = jnp.abs(flux)
        dtpv = dt / (self.porosity * self.volume)
        rock = poly.rock_density * (1.0 - self.porosity) / self.porosity
        s0 = jnp.asarray(s0)
        c0 = jnp.asarray(c0)
        cmax0 = jnp.asarray(cmax0)

        def residual(u):
            s = u[:nc]
            c = u[nc:]
            krw, kro = self.props.relperm(s)
            mob_w = krw / mu_w * poly.water_mob_factor(c, mu_w, cmax0)
            mob_o = kro / mu_o
            fw = mob_w / jnp.maximum(mob_w + mob_o, 1e-30)
            mc = poly.polymer_frac_in_water(c, mu_w)
            fw_u = fw[upcell]
            cm_u = (c * mc)[upcell]
            div_w = (jnp.zeros(nc).at[upcell].add(fw_u * absf)
                     .at[jnp.where(pos, c2, c1)].add(-fw_u * absf))
            div_c = (jnp.zeros(nc).at[upcell].add(fw_u * cm_u * absf)
                     .at[jnp.where(pos, c2, c1)].add(
                         -fw_u * cm_u * absf))
            q_w = jnp.maximum(src, 0.0) + jnp.minimum(src, 0.0) * fw
            q_c = jnp.maximum(src_c, 0.0) \
                + jnp.minimum(src, 0.0) * fw * c * mc
            r_s = s - s0 + dtpv * (div_w - q_w)
            dps = poly.dead_pore_vol
            acc = (1.0 - dps) * s * c + rock * poly.adsorption(c, cmax0)
            acc0 = (1.0 - dps) * s0 * c0 \
                + rock * poly.adsorption(c0, cmax0)
            r_c = acc - acc0 + dtpv * (div_c - q_c)
            return jnp.concatenate([r_s, r_c])

        def body(carry):
            u, it, rn = carry
            r = residual(u)
            J = jax.jacfwd(residual)(u)
            du = jnp.linalg.solve(J, r)
            # chopped update, then clip to physical ranges
            du = jnp.clip(du, -0.2 * jnp.maximum(poly.c_max, 1.0), None)
            u = u - du
            u = jnp.concatenate([
                jnp.clip(u[:nc], 0.0, 1.0),
                jnp.clip(u[nc:], 0.0, poly.c_max)])
            return (u, it + 1, jnp.linalg.norm(residual(u)))

        def cond(carry):
            u, it, rn = carry
            return (rn > tol) & (it < max_iter) & jnp.isfinite(rn)

        u0 = jnp.concatenate([s0, c0])
        u, it, rn = jax.lax.while_loop(
            cond, body, (u0, jnp.asarray(0),
                         jnp.linalg.norm(residual(u0))))
        s, c = u[:nc], u[nc:]
        return s, c, jnp.maximum(cmax0, c), it, rn

    def _polymer_transport(self, s0, c0, cmax0, flux, src, src_c, dtpv,
                           sweeps):
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        absf = jnp.abs(flux)
        pos = flux >= 0
        upcell = jnp.where(pos, c1, c2)
        downcell = jnp.where(pos, c2, c1)
        outflux = jnp.zeros(self.nc).at[upcell].add(absf)
        mu_w, _ = self.props.viscosity
        poly = self.poly
        # PLYSHLOG shear velocity: interstitial water-ballpark estimate
        # from the fixed total flux (the reference uses the per-connection
        # water velocity; a per-cell estimate at fixed total flux is the
        # same information after the fractional-flow split)
        if poly.shear_table is not None:
            area = jnp.cbrt(self.volume) ** 2
            v_cell = outflux / jnp.maximum(self.porosity * area, 1e-30)
        else:
            v_cell = None

        def one_sweep(sc, _):
            s, c = sc
            # upstream water and polymer influx with current values
            krw_u, kro_u = self.props.relperm(s[upcell])
            mobw_u = krw_u / mu_w * poly.water_mob_factor(
                c[upcell], mu_w, cmax0[upcell],
                v_w=None if v_cell is None else v_cell[upcell])
            mobo_u = kro_u / self.props.viscosity[1]
            fw_u = mobw_u / jnp.maximum(mobw_u + mobo_u, 1e-30)
            mc_u = poly.polymer_frac_in_water(c[upcell], mu_w)
            influx_w = jnp.zeros(self.nc).at[downcell].add(fw_u * absf)
            influx_c = jnp.zeros(self.nc).at[downcell].add(
                fw_u * absf * c[upcell] * mc_u)

            rock_arr = poly.rock_density * (1.0 - self.porosity) / \
                self.porosity

            def newton(i, sc_):
                s_, c_ = sc_
                rs, rc = self._polymer_residual(
                    s_, c_, s0, c0, cmax0, influx_w, influx_c, outflux, src,
                    src_c, dtpv, rock_arr, v_w=v_cell)
                # 2x2 jacobian per cell via jacfwd of the local residual
                def local(pair, idx):
                    si, ci = pair[0], pair[1]
                    rsi, rci = self._polymer_residual(
                        si, ci, s0[idx], c0[idx], cmax0[idx],
                        influx_w[idx], influx_c[idx], outflux[idx],
                        src[idx], src_c[idx], dtpv[idx], rock_arr[idx],
                        v_w=None if v_cell is None else v_cell[idx])
                    return jnp.stack([rsi, rci])

                idxs = jnp.arange(self.nc)
                J = jax.vmap(jax.jacfwd(local))(
                    jnp.stack([s_, c_], axis=1), idxs)     # (nc,2,2)
                r = jnp.stack([rs, rc], axis=1)
                det = (J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0])
                det = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
                ds = (J[:, 1, 1] * r[:, 0] - J[:, 0, 1] * r[:, 1]) / det
                dc = (-J[:, 1, 0] * r[:, 0] + J[:, 0, 0] * r[:, 1]) / det
                s_ = jnp.clip(s_ - jnp.clip(ds, -0.2, 0.2), 0.0, 1.0)
                dc_lim = 0.2 * poly.c_max
                c_ = jnp.clip(c_ - jnp.clip(dc, -dc_lim, dc_lim), 0.0,
                              poly.c_max)
                return (s_, c_)

            s_new, c_new = jax.lax.fori_loop(0, 12, newton, (s, c))
            ds = jnp.maximum(jnp.max(jnp.abs(s_new - s)),
                             jnp.max(jnp.abs(c_new - c)) / poly.c_max)
            return (s_new, c_new), ds

        def cond(carry):
            sc, k, ds = carry
            return (k < sweeps) & (ds > 1e-8)

        def body(carry):
            sc, k, _ = carry
            sc_new, ds = one_sweep(sc, None)
            return (sc_new, k + 1, ds)

        (s, c), k, ds = jax.lax.while_loop(
            cond, body, ((s0, c0), jnp.asarray(0), jnp.asarray(1.0)))
        cmax = jnp.maximum(cmax0, c)
        return s, c, cmax, k, ds

    def transport_solve_polymer(self, s0, c0, cmax0, flux, src, src_c, dt,
                                *, extra_sweeps=20):
        sched = upwind_levels(self.nc, np.asarray(self.face_cells),
                              np.asarray(flux))
        budget = sched.nlevels + (extra_sweeps if sched.max_scc > 1 else 3)
        dtpv = jnp.asarray(dt) / self.pv
        return self._ptsolve(jnp.asarray(s0), jnp.asarray(c0),
                             jnp.asarray(cmax0), jnp.asarray(flux),
                             jnp.asarray(src), jnp.asarray(src_c), dtpv,
                             sweeps=int(budget))

    # -- gravity segregation (GravityColumnSolverPolymer role) -------------
    def gravity_segregation_polymer(self, s, c, cmax, dt):
        """Coupled (s, c) column segregation
        (TransportSolverTwophasePolymer::solveGravity, models/gravity.py
        segregate_polymer)."""
        if self.gravity == 0.0:
            return s, c, 0
        if self._columns is None:
            self._columns = gravmod.build_columns(self.grid)
        cols = self._columns
        poly = self.poly
        rho_w, rho_o = self.props.density
        ones = jnp.ones(self.nc)
        water_mob, oil_mob, mc_fn, ads_fn = self._gseg_fns
        rock = poly.rock_density * (1.0 - self.porosity) / self.porosity
        s_new, c_new, sweeps = gravmod.segregate_polymer(
            jnp.asarray(cols.cells), jnp.asarray(cols.faces),
            jnp.asarray(self.grid.trans), self.depth,
            jnp.asarray(self.grid.dz) * 0.5, jnp.asarray(s),
            jnp.asarray(c), jnp.asarray(cmax), jnp.asarray(dt) / self.pv,
            rho_w * ones, rho_o * ones, jnp.asarray(self.gravity), rock,
            poly.dead_pore_vol, poly.c_max * 1.1, water_mob, oil_mob,
            mc_fn, ads_fn)
        return s_new, c_new, int(sweeps)
