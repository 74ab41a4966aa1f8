"""SimulatorIncompTwophase: IMPES-style driver for incompressible 2-phase.

Counterpart of /root/reference/opm/simulators/SimulatorIncompTwophaseAd.cpp
(implicit transport; the `sim_2p_incomp_ad` main) and, with
transport="reorder", of the reorder-transport SimulatorIncompTwophase
(`sim_2p_incomp`): per step, solve TPFA pressure, then water transport
(implicit Newton or wavefront reorder sweeps + gravity-segregation
columns), collect watercut/production report.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from opm_tpu.models.twophase import TwophaseModel, TwophaseState


@dataclass
class TwophaseReport:
    times: List[float] = field(default_factory=list)
    water_inj: List[float] = field(default_factory=list)
    water_prod: List[float] = field(default_factory=list)
    oil_prod: List[float] = field(default_factory=list)
    pressure_iters: int = 0
    transport_iters: int = 0


class SimulatorIncompTwophase:
    def __init__(self, grid, props, src, *, gravity_on=True, bcs=None,
                 transport="implicit"):
        self.model = TwophaseModel(grid, props, gravity_on=gravity_on,
                                   bcs=bcs)
        self.src = np.asarray(src)
        self.transport = transport
        self._reorder = None
        if transport == "reorder":
            from opm_tpu.models.reorder import ReorderTwophaseTransport
            self._reorder = ReorderTwophaseTransport(grid, props)

    def run(self, sw0, dt, num_steps, *, p_fix_val=1e7, output_dir=None,
            output_vtk=False, output_matlab=False) -> tuple:
        model = self.model
        sw = jnp.asarray(sw0)
        rep = TwophaseReport()
        t = 0.0
        p = None
        flux = None

        def _out(i, p_, flux_):
            # per-step vtk/matlab dumps at the loop top + once after the
            # loop (SimulatorIncompTwophaseAd.cpp:330-342 output pattern)
            if output_dir and (output_vtk or output_matlab):
                from opm_tpu.io.matlab import output_simple_state
                output_simple_state(
                    output_dir, i, model.grid,
                    pressure=(np.zeros(model.nc) if p_ is None else p_),
                    sw=sw,
                    flux=(np.zeros(model.grid.nf)
                          if flux_ is None else flux_),
                    matlab=output_matlab, vtk=output_vtk)

        for i_step in range(num_steps):
            _out(i_step, p, flux)
            p, flux, q_bc, pit = model.pressure_solve(
                sw, self.src, p_fix_val=p_fix_val)
            # boundary fluxes act as transport sources (inflow = water)
            src_t = self.src + np.asarray(q_bc)
            if self._reorder is not None:
                sw, tit, rn = self._reorder.solve(sw, flux, src_t, dt)
                if model.gravity != 0.0:
                    sw, git = self._reorder.solve_gravity(sw, dt)
                    tit = int(tit) + git
            else:
                sw, tit, rn = model.transport_solve(sw, flux, src_t, dt)
            rep.pressure_iters += int(pit)
            rep.transport_iters += int(tit)
            t += dt
            fw = np.asarray(model.props.fractional_flow(sw))
            prod = np.minimum(self.src, 0.0)
            rep.times.append(t)
            rep.water_inj.append(float(np.maximum(self.src, 0.0).sum()))
            rep.water_prod.append(float(-(prod * fw).sum()))
            rep.oil_prod.append(float(-(prod * (1 - fw)).sum()))
        _out(num_steps, p, flux)
        return TwophaseState(pressure=p, sw=sw, flux=flux), rep
