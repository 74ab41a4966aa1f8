"""Compressible polymer flooding: polymer-aware pressure + coupled (s,c)
compressible transport.

Re-implements the reference compressible polymer stack:
  * CompressibleTpfaPolymer (/root/reference/opm/polymer/
    CompressibleTpfaPolymer.{hpp,cpp}): the CompressibleTpfa pressure Newton
    with polymer-modified water mobility (computeTotalMobility with the
    Todd-Longstaff/permeability-reduction factor) — here the `wf` multiplier
    threaded through CompressibleTwophaseModel's pressure path.
  * TransportSolverTwophaseCompressiblePolymer (/root/reference/opm/polymer/
    TransportSolverTwophaseCompressiblePolymer.cpp:355-520): per-cell coupled
    residuals

      r_s = s - (B/B0)(phi0/phi) s0 + dtpv (outflux ff(s,c) + influx)
      r_c = (1-dps) s c - (1-dps)(B/B0)(phi0/phi) s0 c0
            + rhor B/phi ((1-phi) ads(c) - (1-phi0) ads(c0))
            + dtpv (outflux ff(s,c) mc(c) + influx_polymer)

    (B = 1/b_w(p_new), B0 = 1/b_w(p_old), dtpv = dt/pv_new, water influx
    carries upstream b_w — :365-398; polymer influx carries upstream mc)
    solved for all cells at once by a vmapped damped 2x2 Newton with
    jacfwd Jacobians, swept wavefront-style over the upwind DAG instead of
    the reference's serial reorder loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.models.comp_twophase import CompressibleTwophaseModel
from opm_tpu.native.graph import upwind_levels
from opm_tpu.props.polymer import PolymerProperties


class CompPolymerState(NamedTuple):
    pressure: jnp.ndarray
    sw: jnp.ndarray
    c: jnp.ndarray
    cmax: jnp.ndarray
    z: jnp.ndarray
    flux: jnp.ndarray


class CompressiblePolymerModel(CompressibleTwophaseModel):
    def __init__(self, grid, props, poly: PolymerProperties, **kw):
        super().__init__(grid, props, **kw)
        self.poly = poly
        self._ptsolve = jax.jit(self._polymer_transport_comp,
                                static_argnames=("sweeps",))

    # -- pressure with polymer-modified water mobility ---------------------
    def pressure_solve_polymer(self, p0, sw0, c, cmax, z0, src, dt):
        mu_w = self.props.mu_w(jnp.asarray(p0))
        wf = self.poly.water_mob_factor(jnp.asarray(c), mu_w,
                                        jnp.asarray(cmax))
        return self.pressure_solve(p0, sw0, z0, src, dt, wf=wf)

    # -- coupled (s, c) transport ------------------------------------------
    def _frac_flow_poly(self, s, c, cmax0, mu_w, mu_o):
        krw, kro = self.props.relperm(s)
        mw = krw / mu_w * self.poly.water_mob_factor(c, mu_w, cmax0)
        mo = kro / mu_o
        return mw / jnp.maximum(mw + mo, 1e-30)

    def _polymer_transport_comp(self, s0, c0, cmax0, p_new, bw0, flux, src,
                                c_inflow, pv0, pv, dt, sweeps):
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        props = self.props
        poly = self.poly
        bw = props.b_w(p_new)
        B = 1.0 / bw
        B0 = 1.0 / bw0
        mu_w = props.mu_w(p_new)
        mu_o = props.mu_o(p_new)
        phi_ratio = pv0 / pv                 # = porosity0/porosity
        dtpv = dt / pv
        rhor = poly.rock_density
        dps = poly.dead_pore_vol
        poro_ref = jnp.asarray(self.grid.poro)
        poro = poro_ref * pv / self.pv_ref      # end-of-step porosity
        poro0 = poro_ref * pv0 / self.pv_ref
        ads0 = poly.adsorption(c0, cmax0)

        absf = jnp.abs(flux)
        pos = flux >= 0
        upcell = jnp.where(pos, c1, c2)
        downcell = jnp.where(pos, c2, c1)
        outflux = jnp.zeros(self.nc).at[upcell].add(absf)
        # source handling (Residual ctor :361-378)
        src_flux = -jnp.asarray(src)
        influx_src = B * jnp.minimum(src_flux, 0.0)
        outflux = outflux + jnp.maximum(src_flux, 0.0)
        mc_in = c_inflow * poly.polymer_frac_in_water(c_inflow, mu_w)
        influx_poly_src = jnp.minimum(src_flux, 0.0) * mc_in

        def residual_pair(s, c, influx, influx_poly, idx):
            ff = self._frac_flow_poly(s, c, cmax0[idx], mu_w[idx], mu_o[idx])
            mc = c * poly.polymer_frac_in_water(c, mu_w[idx])
            bterm = (B[idx] / B0[idx]) * phi_ratio[idx]
            r_s = s - bterm * s0[idx] + dtpv[idx] * (outflux[idx] * ff
                                                     + influx)
            ads = poly.adsorption(c, cmax0[idx])
            r_c = ((1 - dps) * s * c - (1 - dps) * bterm * s0[idx] * c0[idx]
                   + rhor * B[idx] / poro[idx] * (
                       (1 - poro[idx]) * ads
                       - (1 - poro0[idx]) * ads0[idx])
                   + dtpv[idx] * (outflux[idx] * ff * mc + influx_poly))
            return jnp.stack([r_s, r_c])

        def one_sweep(sc):
            s, c = sc
            ff_up = self._frac_flow_poly(s[upcell], c[upcell], cmax0[upcell],
                                         mu_w[upcell], mu_o[upcell])
            mc_up = c[upcell] * poly.polymer_frac_in_water(c[upcell],
                                                           mu_w[upcell])
            influx = influx_src + (jnp.zeros(self.nc).at[downcell].add(
                -B[downcell] * bw[upcell] * absf * ff_up))
            influx_poly = influx_poly_src + (
                jnp.zeros(self.nc).at[downcell].add(-absf * ff_up * mc_up))

            idxs = jnp.arange(self.nc)

            def newton(_, sc_):
                s_, c_ = sc_

                def local(pair, idx):
                    return residual_pair(pair[0], pair[1], influx[idx],
                                         influx_poly[idx], idx)

                x = jnp.stack([s_, c_], axis=1)
                r = jax.vmap(local)(x, idxs)
                J = jax.vmap(jax.jacfwd(local))(x, idxs)
                det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
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
            _, k, ds = carry
            return (k < sweeps) & (ds > 1e-8)

        def body(carry):
            sc, k, _ = carry
            sc_new, ds = one_sweep(sc)
            return (sc_new, k + 1, ds)

        (s, c), k, _ = jax.lax.while_loop(
            cond, body, ((s0, c0), jnp.asarray(0), jnp.asarray(jnp.inf)))
        cmax = jnp.maximum(cmax0, c)
        z = jnp.stack([bw * s, props.b_o(p_new) * (1.0 - s)])
        return s, c, cmax, z, k

    def transport_polymer(self, s0, c0, cmax0, p_old, p_new, flux, src,
                          c_inflow, dt):
        sched = upwind_levels(self.nc, np.asarray(self.face_cells),
                              np.asarray(flux))
        budget = sched.nlevels + (20 if sched.max_scc > 1 else 3)
        pv0 = self.pore_volume(jnp.asarray(p_old))
        pv = self.pore_volume(jnp.asarray(p_new))
        bw0 = self.props.b_w(jnp.asarray(p_old))
        return self._ptsolve(jnp.asarray(s0), jnp.asarray(c0),
                             jnp.asarray(cmax0), jnp.asarray(p_new), bw0,
                             jnp.asarray(flux), jnp.asarray(src),
                             jnp.asarray(c_inflow), pv0, pv,
                             jnp.asarray(dt), sweeps=int(budget))
