"""Black-oil reordering transport + multi-phase upwinding.

Re-implements:
  * connectionMultiPhaseUpwind (/root/reference/opm/autodiff/
    multiPhaseUpwind.{hpp,cpp}:30-88, Brenier-Jaffre style): self-consistent
    per-phase upwind directions at fixed total flux — here as a vectorized
    fixed-point iteration of  theta_a = F_t + T sum_b lam_b^up (dh_a - dh_b),
    up_a = theta_a >= 0, which converges to the same decision.
  * BlackoilReorderingTransportModel (/root/reference/opm/autodiff/
    BlackoilReorderingTransportModel.hpp: per-cell (s_w, x) 2x2 Newton in
    flux-topological order, solveSingleCell :638-688, SCC loops by repeated
    sweeps :693-698). The serial reorder sweep becomes wavefront iteration:
    every cell runs a vmapped damped 2x2 Newton with upstream values frozen,
    repeated for ~nlevels sweeps (native/tarjan.cpp budget), with masked
    hydrocarbon-state switching between sweeps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.models.blackoil import compute_cell_quantities
from opm_tpu.models.sequential import PressureStageData
from opm_tpu.models.state import (GAS, HC_GASOIL, HC_OILONLY, OIL, WATER)
from opm_tpu.native.graph import upwind_levels


def connection_multiphase_upwind(dh, mob_L, mob_R, trans, f_total,
                                 *, iters=4):
    """Per-face, per-phase upwind flags (True = take cell1/L).

    dh: (3, nf) phase potential drops; mob_L/R: (3, nf); f_total: (nf,)."""
    up = dh >= 0.0
    for _ in range(iters):
        mob_up = jnp.where(up, mob_L, mob_R)
        # theta_a = F_t + T sum_b lam_b (dh_a - dh_b)
        lam_t = jnp.sum(mob_up, axis=0)
        wsum = jnp.sum(mob_up * dh, axis=0)
        theta = f_total + trans * (lam_t * dh - wsum)
        up = theta >= 0.0
    return up


class BlackoilReorderingTransport:
    """Transport stage solved by wavefront per-cell 2x2 Newton at fixed
    total flux (the flow_reorder stage)."""

    def __init__(self, seq_model):
        self.seq = seq_model
        self.model = seq_model.model
        self._solve = jax.jit(self._sweep_solve, static_argnames=("sweeps",))
        # proper coloring of the cell adjacency: cells sharing a face never
        # share a color, so a jvp seeded with one color's indicator returns
        # the EXACT own-variable derivative on that color's rows (an
        # all-ones seed mixes in upstream-neighbor columns, which left the
        # local Newton with a corrupted Jacobian and limit-cycled at gas
        # fronts). Cartesian grids are bipartite: 2 colors.
        self._color_masks = self._build_coloring()

    def _build_coloring(self):
        m = self.model
        nc = m.nc
        fc = np.asarray(m.face_cells)
        adj = [[] for _ in range(nc)]
        for a, b in fc:
            adj[a].append(b)
            adj[b].append(a)
        color = np.full(nc, -1, dtype=np.int64)
        for c in range(nc):
            used = {color[n] for n in adj[c] if color[n] >= 0}
            k = 0
            while k in used:
                k += 1
            color[c] = k
        ncol = int(color.max()) + 1
        return [jnp.asarray((color == k).astype(np.float64))
                for k in range(ncol)]

    def _cellq(self, state):
        m = self.model
        return compute_cell_quantities(m.props, state.pressure, state.sw,
                                       state.x, state.hcstate, m.pvtnum,
                                       m.satnum)

    def _sweep_solve(self, state, acc0, dt, wd, data: PressureStageData,
                     sweeps):
        m = self.model
        seq = self.seq
        c1 = m.face_cells[:, 0]
        c2 = m.face_cells[:, 1]
        pvdt = m.pv / dt

        def residual_wg(s):
            """(2, nc) water/gas residuals at fixed total flux."""
            r, _ = seq._transport_residual(s, acc0, dt, wd, data)
            return jnp.stack([r[WATER], r[GAS]], axis=0)

        def one_sweep(s, _):
            # local 2x2 Newton per cell: vary own (sw, x) only. We get the
            # per-cell Jacobian of the FULL residual wrt own variables via
            # jvp with one-hot tangents (own-variable columns of J).
            def r_of_vars(sw, x):
                return residual_wg(s._replace(sw=sw, x=x))

            def diag_jvp(fun, v):
                """Exact per-cell own-variable derivative rows via
                color-seeded jvps (2 colors on cartesian grids)."""
                out = jnp.zeros((2, v.shape[0]), v.dtype)
                for mask in self._color_masks:
                    _, t = jax.jvp(fun, (v,), (mask,))
                    out = out + t * mask[None, :]
                return out

            def newton(i, st):
                sw, x = st
                r = r_of_vars(sw, x)
                dsw_col = diag_jvp(lambda v: r_of_vars(v, x), sw)
                dx_col = diag_jvp(lambda v: r_of_vars(sw, v), x)
                a, b_ = dsw_col[0], dx_col[0]
                c_, d_ = dsw_col[1], dx_col[1]
                det = a * d_ - b_ * c_
                det = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
                dsw = (d_ * r[0] - b_ * r[1]) / det
                dx = (-c_ * r[0] + a * r[1]) / det
                sw = jnp.clip(sw - jnp.clip(dsw, -0.2, 0.2), 0.0, 1.0)
                # x step limited per variable meaning
                is_sat = s.hcstate == HC_GASOIL
                lim = jnp.where(is_sat, 0.2, jnp.maximum(0.2 * jnp.abs(x),
                                                         1.0))
                x = x - jnp.clip(dx, -lim, lim)
                x = jnp.where(is_sat, jnp.clip(x, 0.0, 1.0), x)
                return (sw, x)

            sw, x = jax.lax.fori_loop(0, 3, newton, (s.sw, s.x))
            s_new = s._replace(sw=sw, x=x)
            # masked hydrocarbon-state switching between sweeps
            props = m.props
            rssat = props.rs_sat(s_new.pressure, m.pvtnum)
            is_sg = s_new.hcstate == HC_GASOIL
            is_rs = s_new.hcstate == HC_OILONLY
            gas_gone = is_sg & (s_new.x <= 0.0) & props.disgas
            gas_back = is_rs & (s_new.x > rssat * (1 + 1e-8))
            hc = jnp.where(gas_gone, HC_OILONLY, s_new.hcstate)
            hc = jnp.where(gas_back, HC_GASOIL, hc)
            x2 = jnp.where(gas_gone, rssat, s_new.x)
            x2 = jnp.where(gas_back, 0.0, x2)
            s_new = s_new._replace(hcstate=hc, x=x2)
            ds = jnp.maximum(jnp.max(jnp.abs(s_new.sw - s.sw)),
                             jnp.max(jnp.abs(s_new.x - s.x)
                                     / jnp.maximum(jnp.abs(s.x), 1.0)))
            return s_new, ds

        def cond(carry):
            s, k, ds = carry
            return (k < sweeps) & (ds > 1e-5)

        def body(carry):
            s, k, _ = carry
            s_new, ds = one_sweep(s, None)
            return (s_new, k + 1, ds)

        s, k, ds = jax.lax.while_loop(cond, body,
                                      (state, jnp.asarray(0),
                                       jnp.asarray(1.0)))
        # convergence measure: transport CNV
        r, b = seq._transport_residual(s, acc0, dt, wd, data)
        B = 1.0 / jnp.maximum(b, 1e-30)
        cnv = dt * jnp.abs(r) * B / m.pv
        rn = jnp.maximum(jnp.max(cnv[WATER]), jnp.max(cnv[GAS]))
        return s, k, rn

    def solve(self, state, acc0, dt, wd, data, *, extra_sweeps=10):
        sched = upwind_levels(self.model.nc,
                              np.asarray(self.model.face_cells),
                              np.asarray(data.f_total))
        # cap the budget: the trailing Newton polish finishes what long
        # wavefronts would (cheaper than O(nlevels) full sweeps)
        budget = min(sched.nlevels, 30) + extra_sweeps
        return self._solve(state, acc0, jnp.asarray(dt), wd, data,
                           sweeps=int(budget))
