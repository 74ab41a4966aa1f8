"""IMPES on AD: implicit-pressure / explicit-saturation demonstrator.

Counterpart of /root/reference/opm/autodiff/ImpesTPFAAD.cpp:206-302+ (the
reference's ADB-based IMPES pressure solver demonstrator): the pressure
equation is the TOTAL-VOLUME balance — the phase mass-balance residuals of
the fully-implicit model, converted to reservoir volumes (divided by the
inverse FVFs) and summed — assembled with saturations/compositions FROZEN
at the old state, Newton-solved for pressure only via jax.jacfwd over the
pressure argument of the SAME residual functions the FI model uses.
Saturations then update explicitly from the converged fluxes (single-point
upwind), the classic IMPES splitting.

This is deliberately a compact demonstrator (like the reference's): the
production sequential-implicit path is models/sequential.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opm_tpu.models.state import WATER
from opm_tpu.wells import standard as stdwells


class ImpesTpfaAd:
    """model: a BlackoilModel. Pressure Newton + explicit saturations."""

    def __init__(self, model, *, tol=1e-8, max_iter=15):
        self.model = model
        self.tol = tol
        self.max_iter = max_iter
        self._step_jit = jax.jit(self._step)

    # -- device program ---------------------------------------------------
    def _pressure_residual(self, p, state, acc0_vol, dt, wd, cdp):
        """Total-volume residual at frozen (sw, x, hcstate)."""
        model = self.model
        s = state._replace(pressure=p)
        q = model.cell_quantities(s)
        flux = model.face_fluxes(q)               # (3, nf) surface vol
        div = model.divergence(flux)
        cq_s = stdwells.perforation_fluxes(
            wd, model.well_cell_quantities(q), state.bhp, state.qs, cdp,
            allow_crossflow=model.params.allow_crossflow)
        src = jnp.zeros_like(div).at[
            :, wd["perf_cell"].reshape(-1)].add(
            cq_s.reshape(-1, 3).T)
        from opm_tpu.models.blackoil import accumulation_from_q
        acc = accumulation_from_q(q)
        # surface-volume balances -> reservoir volume via 1/b, summed
        binv = 1.0 / jnp.maximum(q.b, 1e-300)
        r = (model.pv / dt) * (acc - acc0_vol) + div - src
        return jnp.sum(r * binv, axis=0)          # (nc,) volume balance

    def _step(self, state, dt, wd, cdp):
        model = self.model
        acc0 = model.accumulation(state)

        def newton_body(carry):
            p, it, rn = carry

            def rfun(pp):
                return self._pressure_residual(pp, state, acc0, dt, wd,
                                               cdp)

            r = rfun(p)
            J = jax.jacfwd(rfun)(p)
            dp = jnp.linalg.solve(J, r)
            p = p - dp
            return (p, it + 1,
                    jnp.linalg.norm(rfun(p)) / jnp.sqrt(1.0 * p.shape[0]))

        def newton_cond(carry):
            p, it, rn = carry
            return (rn > self.tol) & (it < self.max_iter) & jnp.isfinite(rn)

        p0 = state.pressure
        r0 = self._pressure_residual(p0, state, acc0, dt, wd, cdp)
        rn0 = jnp.linalg.norm(r0) / jnp.sqrt(1.0 * p0.shape[0])
        p, iters, rn = jax.lax.while_loop(newton_cond, newton_body,
                                          (p0, jnp.asarray(0), rn0))

        # explicit saturation update from the converged fluxes
        s_p = state._replace(pressure=p)
        q = self.model.cell_quantities(s_p)
        flux = model.face_fluxes(q)
        div = model.divergence(flux)
        cq_s = stdwells.perforation_fluxes(
            wd, model.well_cell_quantities(q), state.bhp, state.qs, cdp,
            allow_crossflow=model.params.allow_crossflow)
        src = jnp.zeros_like(div).at[
            :, wd["perf_cell"].reshape(-1)].add(cq_s.reshape(-1, 3).T)
        # sw_new from the water surface-volume balance: pvMult b_w sw
        # advances by dt/pv * (src_w - div_w); invert through BOTH the
        # new b_w and the rock-compressibility pvMult(p_new) so the
        # update is exactly conservative
        bw = q.b[WATER]
        acc0 = model.accumulation(state)
        bsw_new = acc0[WATER] + dt / model.pv * (src[WATER] - div[WATER])
        sw = jnp.clip(bsw_new / jnp.maximum(q.pv_mult * bw, 1e-300),
                      0.0, 1.0)
        return state._replace(pressure=p, sw=sw), iters, rn

    def step(self, state, dt, wd, cdp=None):
        """One IMPES step. Returns (state, pressure_newton_iters, resid)."""
        if cdp is None:
            q = self.model.cell_quantities(state)
            cdp = stdwells.connection_pressure_offsets(
                wd, self.model.well_cell_quantities(q), state.qs)
        s, it, rn = self._step_jit(state, dt, wd, cdp)
        return s, int(it), float(rn)
