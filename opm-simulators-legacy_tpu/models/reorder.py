"""Reordering transport: wavefront (level-scheduled) single-cell solves.

The reference solves transport cell-by-cell in flux-topological order
(/root/reference/opm/core/transport/reorder/TransportSolverTwophaseReorder.cpp:
136-202 — per-cell residual  r(s) = s - s0 + dt/pv (outflux f(s) + influx),
regula-falsi scalar root find, Gauss-Seidel for SCC loops :243-460). A serial
sweep is the worst possible TPU program, so here the topological structure
(native/tarjan.cpp levels) is exploited differently: *all* cells are solved
simultaneously by a vmapped bracketed bisection with upstream saturations
frozen (block-Jacobi over the upwind DAG), repeated until the front has
propagated — exact after `nlevels` sweeps for acyclic flux fields, and the
extra sweeps double as the reference's multicell Gauss-Seidel iterations for
SCCs (countercurrent gravity loops).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.models import gravity as gravmod
from opm_tpu.native.graph import upwind_levels

_BISECT_ITERS = 60  # 2^-60 saturation resolution


class ReorderTwophaseTransport:
    """Incompressible two-phase transport via wavefront sweeps (the
    TransportSolverTwophaseReorder capability)."""

    def __init__(self, grid, props):
        self.grid = grid
        self.props = props
        self.nc = grid.nc
        f = jnp.asarray
        self.face_cells = f(grid.face_cells)
        self.pv = f(grid.pore_volume)
        self._solve = jax.jit(self._sweep_solve, static_argnames=("sweeps",))
        self._columns = None

    # -- the per-cell residual (vectorized over all cells) -----------------
    def _residual_all(self, s, s0, influx_w, outflux, src, dtpv):
        fw = self.props.fractional_flow(s)
        q_w = jnp.maximum(src, 0.0) + jnp.minimum(src, 0.0) * fw
        return s - s0 + dtpv * (outflux * fw - influx_w - q_w)

    def _sweep_solve(self, s0, flux, src, dtpv, sweeps):
        c1 = self.face_cells[:, 0]
        c2 = self.face_cells[:, 1]
        absf = jnp.abs(flux)
        pos = flux >= 0
        upcell = jnp.where(pos, c1, c2)
        downcell = jnp.where(pos, c2, c1)
        outflux = jnp.zeros(self.nc).at[upcell].add(absf)

        def one_sweep(s, _):
            # water influx through faces with current upstream saturations
            # (well/source water enters through the q_w term in the residual)
            fw_up = self.props.fractional_flow(s[upcell])
            influx_w = jnp.zeros(self.nc).at[downcell].add(fw_up * absf)

            # bracketed bisection on the monotone residual
            def res(sv):
                return self._residual_all(sv, s0, influx_w, outflux, src,
                                          dtpv)

            lo = jnp.zeros(self.nc)
            hi = jnp.ones(self.nc)

            def bis(_, carry):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                rm = res(mid)
                lo = jnp.where(rm < 0, mid, lo)
                hi = jnp.where(rm < 0, hi, mid)
                return (lo, hi)

            lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, bis, (lo, hi))
            s_new = 0.5 * (lo + hi)
            return s_new, jnp.max(jnp.abs(s_new - s))

        def cond(carry):
            s, k, ds = carry
            return (k < sweeps) & (ds > 1e-10)

        def body(carry):
            s, k, _ = carry
            s_new, ds = one_sweep(s, None)
            return (s_new, k + 1, ds)

        s, k, ds = jax.lax.while_loop(cond, body,
                                      (s0, jnp.asarray(0), jnp.asarray(1.0)))
        return s, k, ds

    def solve(self, s0, flux, src, dt, *, extra_sweeps=20):
        """Returns (s, sweeps_used, last_ds). The sweep budget comes from
        the actual wavefront depth of the flux field (host-side tarjan)."""
        sched = upwind_levels(self.nc, np.asarray(self.face_cells),
                              np.asarray(flux))
        budget = sched.nlevels + (extra_sweeps if sched.max_scc > 1 else 1)
        dtpv = jnp.asarray(dt) / self.pv
        return self._solve(jnp.asarray(s0), jnp.asarray(flux),
                           jnp.asarray(src), dtpv, sweeps=int(budget))

    def solve_gravity(self, s, dt):
        """Column-wise gravity segregation
        (TransportSolverTwophaseReorder::solveGravity/solveGravityColumn,
        TransportSolverTwophaseReorder.cpp:589-698): constant densities and
        viscosities, shared models/gravity.py column machinery."""
        if self._columns is None:
            self._columns = gravmod.build_columns(self.grid)
        cols = self._columns
        mu_w, mu_o = self.props.viscosity
        rho_w, rho_o = self.props.density
        nc = self.nc
        ones = jnp.ones(nc)
        s_new, sweeps = gravmod.segregate(
            jnp.asarray(cols.cells), jnp.asarray(cols.faces),
            jnp.asarray(self.grid.trans), jnp.asarray(self.grid.depth),
            jnp.asarray(self.grid.dz) * 0.5, jnp.asarray(s),
            jnp.asarray(dt) / self.pv, mu_w * ones, mu_o * ones,
            rho_w * ones, rho_o * ones, jnp.asarray(self.grid.gravity),
            self.props.relperm)
        return s_new, int(sweeps)
