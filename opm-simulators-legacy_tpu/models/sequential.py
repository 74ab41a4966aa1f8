"""Sequential-implicit black-oil: pressure stage + transport stage.

Re-implements the reference's sequential family:
  * BlackoilPressureModel (/root/reference/opm/autodiff/
    BlackoilPressureModel.hpp:41-120): Newton on (p, bhp, q_s) with
    saturations/rs/rv frozen, on the volume-weighted sum of the mass-balance
    equations (sum_a B_a R_a), storing total face fluxes and perforation
    volumetric rates for the transport stage.
  * BlackoilTransportModel (BlackoilTransportModel.hpp:99-123,346): Newton
    on (s_w, x) at FIXED total volumetric flux, with the phase split in
    fractional-flow form
        v_a = f_a (F_t + T sum_b lam_b (dphi_a - dphi_b))
    where the phase-potential differences (gravity/capillary) and upwind
    directions are frozen at the pressure-stage solution (the reference
    refreshes upwind with connectionMultiPhaseUpwind, multiPhaseUpwind.cpp —
    an upgrade slot). Because sum_a f_a = 1 and the segregation terms cancel
    pairwise, total volume is conserved exactly, which is what makes the
    splitting well-posed for compressible black-oil.
  * BlackoilSequentialModel (BlackoilSequentialModel.hpp:130-230): outer
    loop, optionally iterating the pair to full implicitness.

Both stages use restricted dense jacfwd Newton (SPE1-scale; the
block-sparse/CPR restriction plugs in where the fully-implicit path does).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.models.blackoil import BlackoilModel, compute_cell_quantities
from opm_tpu.models.state import (GAS, OIL, WATER, BlackoilState)
from opm_tpu.solver.newton import (NumericalIssue, TooManyIterations,
                                   dense_solve)
from opm_tpu.solver.update import update_state
from opm_tpu.wells import standard as stdwells


@dataclass
class SequentialParams:
    pressure_tol: float = 1e-6      # relative residual reduction
    max_pressure_iter: int = 30     # backtracked steps need headroom
    max_transport_iter: int = 20
    transport_cnv_tol: float = 1e-4
    iterate_to_fully_implicit: bool = False
    max_outer_iter: int = 8
    # 'newton' (BlackoilTransportModel) or 'reorder'
    # (BlackoilReorderingTransportModel / flow_reorder)
    transport: str = "newton"


class PressureStageData(NamedTuple):
    """Frozen quantities handed from the pressure to the transport stage."""
    f_total: jnp.ndarray    # (nf,) total volumetric face flux
    dphi: jnp.ndarray       # (3, nf) phase potential drops at solution
    up: jnp.ndarray         # (3, nf) bool upwind-is-c1 per phase
    perf_qr: jnp.ndarray    # (nw, mp) total volumetric perforation rate
                            # (positive = injection into cell)


class BlackoilSequentialModel:
    def __init__(self, model: BlackoilModel,
                 params: Optional[SequentialParams] = None):
        self.model = model
        self.params = params or SequentialParams()
        self._pressure_jit = jax.jit(self._pressure_newton)
        self._transport_jit = jax.jit(self._transport_newton)
        self._reorder = None
        if self.params.transport == "reorder":
            from opm_tpu.models.reorder_blackoil import \
                BlackoilReorderingTransport
            self._reorder = BlackoilReorderingTransport(self)

    # -- helpers --------------------------------------------------------------
    def _phase_potentials(self, q):
        """dphi (3,nf) and upwind flags (3,nf) at a given state."""
        m = self.model
        c1 = m.face_cells[:, 0]
        c2 = m.face_cells[:, 1]
        dz = m.depth[c1] - m.depth[c2]
        p_ph = (q.pw, q.po, q.pg)
        dphi = []
        for ph in range(3):
            rho_face = 0.5 * (q.rho[ph, c1] + q.rho[ph, c2])
            dphi.append((p_ph[ph][c1] - p_ph[ph][c2])
                        - rho_face * m.gravity * dz)
        dphi = jnp.stack(dphi, axis=0)
        return dphi, dphi >= 0.0

    # -- pressure stage ---------------------------------------------------------
    def _pressure_residual(self, state, acc0, dt, wd, cdp):
        res = self.model.residual(state, acc0, dt, wd, cdp)
        B = 1.0 / jnp.maximum(res.b, 1e-30)
        r_p = jnp.sum(res.cell * B, axis=0)          # volume balance
        return jnp.concatenate([r_p, res.well_flux.reshape(-1),
                                res.well_ctrl])

    def _pressure_newton(self, state, acc0, dt, wd, cdp):
        model = self.model
        nc = model.nc
        nw = state.bhp.shape[0]

        def pack(s):
            return jnp.concatenate([s.pressure, s.bhp, s.qs.reshape(-1)])

        def unpack(u, tmpl):
            return tmpl._replace(pressure=u[:nc], bhp=u[nc:nc + nw],
                                 qs=u[nc + nw:].reshape(nw, 3))

        def rfun(u):
            return self._pressure_residual(unpack(u, state), acc0, dt, wd,
                                           cdp)

        def body(carry):
            s, it, rn, rn0 = carry
            u = pack(s)
            r = rfun(u)
            J = jax.jacfwd(rfun)(u)
            du = dense_solve(J, r)

            def stepped(alpha):
                dua = du * alpha
                dp = jnp.clip(dua[:nc],
                              -model.params.dp_max_rel
                              * jnp.abs(s.pressure),
                              model.params.dp_max_rel * jnp.abs(s.pressure))
                dbhp = jnp.clip(dua[nc:nc + nw],
                                -model.params.dp_max_rel * jnp.abs(s.bhp),
                                model.params.dp_max_rel * jnp.abs(s.bhp))
                return s._replace(pressure=s.pressure - dp,
                                  bhp=s.bhp - dbhp,
                                  qs=s.qs - dua[nc + nw:].reshape(nw, 3))

            # backtracking safeguard: the well-flux equations are strongly
            # nonlinear in the rates once free gas reaches a producer —
            # a full clipped-Newton step can diverge (SPE1 day ~700).
            # Take the best of {1, 1/2, 1/4, 1/8} steps by residual norm.
            best_s = stepped(1.0)
            best_rn = jnp.linalg.norm(rfun(pack(best_s)))
            for alpha in (0.5, 0.25, 0.125):
                cand = stepped(alpha)
                crn = jnp.linalg.norm(rfun(pack(cand)))
                take = crn < best_rn
                best_s = jax.tree.map(
                    lambda a, b: jnp.where(take, b, a), best_s, cand)
                best_rn = jnp.minimum(best_rn, crn)
            return (best_s, it + 1, best_rn, rn0)

        r0 = jnp.linalg.norm(rfun(pack(state)))

        def cond(carry):
            s, it, rn, rn0 = carry
            return (rn > self.params.pressure_tol * (rn0 + 1e-300)) & \
                (it < self.params.max_pressure_iter) & jnp.isfinite(rn)

        s, iters, rn, _ = jax.lax.while_loop(cond, body,
                                             (state, jnp.asarray(0), r0, r0))

        # freeze stage data for transport
        q = compute_cell_quantities(model.props, s.pressure, s.sw, s.x,
                                    s.hcstate, model.pvtnum, model.satnum)
        dphi, up = self._phase_potentials(q)
        c1 = model.face_cells[:, 0]
        c2 = model.face_cells[:, 1]
        mob_up = jnp.where(up, q.mob[:, c1], q.mob[:, c2])  # (3, nf)
        f_total = jnp.sum(model.trans * mob_up * dphi, axis=0)
        # perforation total volumetric rates
        cq_s = stdwells.perforation_fluxes(
            wd, model.well_cell_quantities(q), s.bhp, s.qs, cdp,
            allow_crossflow=model.params.allow_crossflow)
        # convert surface component rates back to reservoir volume:
        # producing perfs: sum_a cq_s_a / b_a with rs/rv unmixing; keep it
        # simple and exact for the transport distribution: use the drawdown
        # form directly
        c = wd["perf_cell"]
        ddn = q.po[c] - (s.bhp[:, None] + cdp)
        totmob = jnp.sum(q.mob[:, c], axis=0)
        perf_qr = -wd["perf_wi"] * totmob * ddn * \
            wd["perf_mask"] * wd["open"][:, None]
        data = PressureStageData(f_total=f_total, dphi=dphi, up=up,
                                 perf_qr=perf_qr)
        return s, iters, rn, r0, data

    # -- transport stage -----------------------------------------------------
    def _transport_fluxes(self, q, data: PressureStageData):
        """Phase surface-volume face fluxes at fixed total volumetric flux
        (BlackoilTransportModel.hpp:346 semantics)."""
        m = self.model
        c1 = m.face_cells[:, 0]
        c2 = m.face_cells[:, 1]
        mob_up = jnp.where(data.up, q.mob[:, c1], q.mob[:, c2])  # (3,nf)
        b_up = jnp.where(data.up, q.b[:, c1], q.b[:, c2])
        rs_up = jnp.where(data.up[OIL], q.rs[c1], q.rs[c2])
        rv_up = jnp.where(data.up[GAS], q.rv[c1], q.rv[c2])
        lam_t = jnp.maximum(jnp.sum(mob_up, axis=0), 1e-30)
        frac = mob_up / lam_t
        # segregation: v_a = f_a (F_t + T sum_b lam_b (dphi_a - dphi_b));
        # sum_b lam_b (dphi_a - dphi_b) = lam_t dphi_a - sum_b lam_b dphi_b
        wsum = jnp.sum(mob_up * data.dphi, axis=0)
        seg = lam_t * data.dphi - wsum
        v = frac * (data.f_total + m.trans * seg)
        flux_w = b_up[WATER] * v[WATER]
        flux_o = b_up[OIL] * v[OIL] + rv_up * b_up[GAS] * v[GAS]
        flux_g = b_up[GAS] * v[GAS] + rs_up * b_up[OIL] * v[OIL]
        return jnp.stack([flux_w, flux_o, flux_g], axis=0)

    def _transport_well_sources(self, q, state, wd, data):
        """Perforation surface rates at fixed volumetric perf rate."""
        from opm_tpu.wells.standard import _gather_ph
        c = wd["perf_cell"]
        b = _gather_ph(q.b, c)
        mob = _gather_ph(q.mob, c)
        rs = q.rs[c]
        rv = q.rv[c]
        qr = data.perf_qr                      # (nw, mp), +in
        producing = qr < 0.0
        lam_t = jnp.maximum(jnp.sum(mob, axis=-1), 1e-30)
        frac = mob / lam_t[..., None]
        vr = frac * qr[..., None]              # per-phase reservoir rates
        prod = jnp.stack([
            b[..., WATER] * vr[..., WATER],
            b[..., OIL] * vr[..., OIL] + rv * b[..., GAS] * vr[..., GAS],
            b[..., GAS] * vr[..., GAS] + rs * b[..., OIL] * vr[..., OIL],
        ], axis=-1)
        cmix = stdwells.wellbore_mixture(state.qs, wd["comp_frac"],
                                         wd["is_injector"])
        d = jnp.maximum(1.0 - rs * rv, 1e-14)
        cw = cmix[:, None, WATER]
        co = cmix[:, None, OIL]
        cg = cmix[:, None, GAS]
        volrat = (cw / jnp.maximum(b[..., WATER], 1e-14)
                  + (co - rv * cg) / d / jnp.maximum(b[..., OIL], 1e-14)
                  + (cg - rs * co) / d / jnp.maximum(b[..., GAS], 1e-14))
        inj = cmix[:, None, :] * (qr / jnp.maximum(volrat, 1e-14))[..., None]
        cq_s = jnp.where(producing[..., None], prod, inj)
        return cq_s * (wd["perf_mask"] * wd["open"][:, None])[..., None]

    def _transport_residual(self, state, acc0, dt, wd, data):
        m = self.model
        q = compute_cell_quantities(m.props, state.pressure, state.sw,
                                    state.x, state.hcstate, m.pvtnum,
                                    m.satnum)
        from opm_tpu.models.blackoil import accumulation_from_q
        acc = accumulation_from_q(q)
        pvdt = m.pv / dt
        r = pvdt * (acc - acc0)
        r = r + m.divergence(self._transport_fluxes(q, data))
        cq_s = self._transport_well_sources(q, state, wd, data)
        r = r.at[:, wd["perf_cell"].reshape(-1)].add(-cq_s.reshape(-1, 3).T)
        return r, q.b

    def _transport_newton(self, state, acc0, dt, wd, data):
        model = self.model
        nc = model.nc

        def conv_norm(s):
            r, b = self._transport_residual(s, acc0, dt, wd, data)
            B = 1.0 / jnp.maximum(b, 1e-30)
            cnv = dt * jnp.abs(r) * B / model.pv
            return jnp.maximum(jnp.max(cnv[WATER]), jnp.max(cnv[GAS]))

        def body(carry):
            s, it, rn = carry

            # rebuild the local residual around the CURRENT state each
            # iteration — hcstate switches between iterations
            def rfun(u):
                st = s._replace(sw=u[:nc], x=u[nc:])
                r, _ = self._transport_residual(st, acc0, dt, wd, data)
                return jnp.concatenate([r[WATER], r[GAS]])

            u = jnp.concatenate([s.sw, s.x])
            r = rfun(u)
            J = jax.jacfwd(rfun)(u)
            du = dense_solve(J, r)
            nw = s.bhp.shape[0]
            du_full = jnp.concatenate([jnp.zeros(nc), du[:nc], du[nc:],
                                       jnp.zeros(nw), jnp.zeros(3 * nw)])
            s = update_state(model, s, du_full)
            return (s, it + 1, conv_norm(s))

        rn0 = conv_norm(state)

        def cond(carry):
            s, it, rn = carry
            return (rn > self.params.transport_cnv_tol) & \
                (it < self.params.max_transport_iter) & jnp.isfinite(rn)

        s, iters, rn = jax.lax.while_loop(cond, body,
                                          (state, jnp.asarray(0), rn0))
        return s, iters, rn

    # -- outer step --------------------------------------------------------------
    def step(self, state: BlackoilState, dt, wd):
        """One sequential timestep. Returns (state, info dict). Raises for
        the adaptive-dt retry loop on stall/divergence."""
        model = self.model
        acc0 = model.accumulation(state)
        dt = jnp.asarray(dt, dtype=jnp.float64)
        q = model.cell_quantities(state)
        cdp = stdwells.connection_pressure_offsets(
            wd, model.well_cell_quantities(q), state.qs)
        info = dict(pressure_iters=0, transport_iters=0, outer_iters=0)
        outer = self.params.max_outer_iter if \
            self.params.iterate_to_fully_implicit else 1
        for k in range(outer):
            state, pit, prn, prn0, data = self._pressure_jit(
                state, acc0, dt, wd, cdp)
            if not np.isfinite(float(prn)):
                raise NumericalIssue("pressure stage diverged")
            if float(prn) > self.params.pressure_tol * (float(prn0) + 1e-300) \
                    and float(prn) > 1e-10:
                raise TooManyIterations(
                    f"pressure stage stalled: {float(prn):.3e} of "
                    f"{float(prn0):.3e}")
            if self._reorder is not None:
                state, tit, trn = self._reorder.solve(state, acc0, dt, wd,
                                                      data)
                if float(trn) > self.params.transport_cnv_tol:
                    # Newton polish from the swept state (the reference's
                    # multicell iterate-to-tol, TransportSolverTwophase
                    # Reorder.cpp:410-448 analogue)
                    state, tit2, trn = self._transport_jit(
                        state, acc0, dt, wd, data)
                    tit = tit + tit2
            else:
                state, tit, trn = self._transport_jit(state, acc0, dt, wd,
                                                      data)
            info["pressure_iters"] += int(pit)
            info["transport_iters"] += int(tit)
            info["outer_iters"] = k + 1
            if not np.isfinite(float(trn)):
                raise NumericalIssue("transport stage diverged")
            if float(trn) > self.params.transport_cnv_tol:
                raise TooManyIterations(
                    f"transport stage stalled: cnv {float(trn):.3e}")
            if not self.params.iterate_to_fully_implicit:
                break
            # pressure-reconvergence check (BlackoilSequentialModel:180-230)
            res = self.model.residual(state, acc0, dt, wd, cdp)
            B = 1.0 / jnp.maximum(res.b, 1e-30)
            cnv_p = float(dt * jnp.max(
                jnp.abs(jnp.sum(res.cell * B, axis=0)) / model.pv))
            if cnv_p < model.params.tolerance_cnv * 1e-2:
                break
        return state, info
