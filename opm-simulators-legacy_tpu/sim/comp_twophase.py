"""SimulatorCompressibleTwophase: IMPES driver for compressible 2-phase.

Counterpart of /root/reference/opm/simulators/SimulatorCompressibleTwophase
.cpp (the `sim_2p_comp_reorder` main): per step — CompressibleTpfa pressure
Newton, reordered compressible transport (optionally sub-stepped), gravity
segregation columns, production report.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax.numpy as jnp
import numpy as np

from opm_tpu.models.comp_twophase import (CompressibleTwophaseModel,
                                          CompTwophaseState)


@dataclass
class CompTwophaseReport:
    times: List[float] = field(default_factory=list)
    water_prod_surface: List[float] = field(default_factory=list)
    oil_prod_surface: List[float] = field(default_factory=list)
    avg_pressure: List[float] = field(default_factory=list)
    pressure_newton_iters: int = 0
    pressure_linear_iters: int = 0
    transport_sweeps: int = 0
    gravity_sweeps: int = 0


class SimulatorCompressibleTwophase:
    def __init__(self, grid, props, src, *, gravity_on=True, rock=None,
                 transport_substeps=1, pin_cell=None, pin_val=0.0):
        self.model = CompressibleTwophaseModel(grid, props,
                                               gravity_on=gravity_on,
                                               rock=rock, pin_cell=pin_cell,
                                               pin_val=pin_val)
        self.src = np.asarray(src)
        self.substeps = transport_substeps

    def initial_state(self, p0, sw0) -> CompTwophaseState:
        p0 = jnp.asarray(p0)
        sw0 = jnp.asarray(sw0)
        props = self.model.props
        z = jnp.stack([props.b_w(p0) * sw0, props.b_o(p0) * (1.0 - sw0)])
        return CompTwophaseState(pressure=p0, sw=sw0, z=z,
                                 flux=jnp.zeros(self.model.grid.nf))

    def run(self, state: CompTwophaseState, dt, num_steps, *,
            output_dir=None, output_vtk=False, output_matlab=False):
        model = self.model
        rep = CompTwophaseReport()
        t = 0.0

        def _out(i, st):
            # SimulatorCompressibleTwophase.cpp:170-197,339-341 output
            # pattern: dump at the loop top + once after the loop
            if output_dir and (output_vtk or output_matlab):
                from opm_tpu.io.matlab import output_simple_state
                output_simple_state(
                    output_dir, i, model.grid, pressure=st.pressure,
                    sw=st.sw, flux=st.flux,
                    extra={"surfvolume":
                           np.asarray(st.z).T.reshape(-1)},
                    matlab=output_matlab, vtk=output_vtk)

        for i_step in range(num_steps):
            _out(i_step, state)
            p_old = state.pressure
            p, flux, nit, _, lit = model.pressure_solve(
                p_old, state.sw, state.z, self.src, dt)
            rep.pressure_newton_iters += int(nit)
            rep.pressure_linear_iters += int(lit)
            sw, z = state.sw, state.z
            for _k in range(self.substeps):
                sw, z, tsw = model.transport(sw, p_old, p, z, flux, self.src,
                                             dt / self.substeps)
                rep.transport_sweeps += int(tsw)
            if model.gravity != 0.0:
                sw, gsw = model.gravity_segregation(sw, p, dt)
                rep.gravity_sweeps += int(gsw)
                props = model.props
                z = jnp.stack([props.b_w(p) * sw,
                               props.b_o(p) * (1.0 - sw)])
            state = CompTwophaseState(pressure=p, sw=sw, z=z, flux=flux)
            t += dt
            # surface production rates at producers (negative src), using
            # upstream cell fractional flow and b factors
            fw = np.asarray(model.props.fractional_flow(sw, p))
            bw = np.asarray(model.props.b_w(p))
            bo = np.asarray(model.props.b_o(p))
            prod = np.minimum(self.src, 0.0)
            rep.times.append(t)
            rep.water_prod_surface.append(float(-(prod * fw * bw).sum()))
            rep.oil_prod_surface.append(float(-(prod * (1 - fw) * bo).sum()))
            rep.avg_pressure.append(float(np.mean(np.asarray(p))))
        _out(num_steps, state)
        return state, rep
