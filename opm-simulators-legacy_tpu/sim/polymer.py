"""Polymer flooding simulators.

Counterpart of /root/reference/opm/polymer/SimulatorPolymer.cpp and
SimulatorCompressiblePolymer.cpp (IMPES drivers: polymer-modified TPFA
pressure + reordered (s, c) transport) and PolymerInflow
(PolymerInflow.hpp:38-121: per-well injection concentration schedule).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from opm_tpu.models.comp_polymer import (CompPolymerState,
                                         CompressiblePolymerModel)
from opm_tpu.models.polymer import PolymerState, PolymerTwophaseModel
from opm_tpu.props.polymer import PolymerProperties


@dataclass
class PolymerInflow:
    """Polymer injection concentration vs time (PolymerInflowBasic)."""

    t_start: float
    t_end: float
    concentration: float

    def at(self, t):
        return self.concentration if self.t_start <= t < self.t_end else 0.0


@dataclass
class PolymerReport:
    times: List[float] = field(default_factory=list)
    injected_polymer: float = 0.0
    produced_polymer: float = 0.0
    water_prod: List[float] = field(default_factory=list)


class SimulatorPolymer:
    def __init__(self, grid, props, poly: PolymerProperties, src,
                 inflow: PolymerInflow, *, gravity_on=False):
        self.model = PolymerTwophaseModel(grid, props, poly,
                                          gravity_on=gravity_on)
        self.src = np.asarray(src)
        self.inflow = inflow

    def run(self, sw0, dt, num_steps, *, c0=None, output_dir=None,
            output_vtk=False, output_matlab=False):
        model = self.model
        poly = model.poly
        nc = model.nc
        sw = jnp.asarray(sw0)
        c = jnp.zeros(nc) if c0 is None else jnp.asarray(c0)
        cmax = c
        rep = PolymerReport()
        t = 0.0
        p = flux = None

        def _out(i, p_, flux_):
            # SimulatorPolymer.cpp:524-556 output pattern (adds
            # concentration/cmax to the state DataMap)
            if output_dir and (output_vtk or output_matlab):
                from opm_tpu.io.matlab import output_simple_state
                output_simple_state(
                    output_dir, i, model.grid,
                    pressure=(np.zeros(nc) if p_ is None else p_), sw=sw,
                    flux=(np.zeros(model.grid.nf) if flux_ is None
                          else flux_),
                    extra={"concentration": c, "cmax": cmax},
                    matlab=output_matlab, vtk=output_vtk)

        for i_step in range(num_steps):
            _out(i_step, p, flux)
            p, flux, _, _ = model.pressure_solve_polymer(sw, c, cmax,
                                                         self.src)
            c_inj = self.inflow.at(t)
            src_c = np.maximum(self.src, 0.0) * c_inj
            sw, c, cmax, sweeps, ds = model.transport_solve_polymer(
                sw, c, cmax, flux, self.src, src_c, dt)
            if model.gravity != 0.0:
                sw, c, _ = model.gravity_segregation_polymer(sw, c, cmax, dt)
                cmax = jnp.maximum(cmax, c)
            t += dt
            rep.times.append(t)
            rep.injected_polymer += float(src_c.sum()) * dt
            # produced polymer: c m(c) fw at producing cells
            mu_w = model.props.viscosity[0]
            mobw, mobo = model.polymer_mobility(sw, c, cmax)
            fw = np.asarray(mobw / jnp.maximum(mobw + mobo, 1e-30))
            mc = np.asarray(poly.polymer_frac_in_water(c, mu_w))
            prod = np.minimum(self.src, 0.0)
            rep.produced_polymer += float(
                -(prod * fw * np.asarray(c) * mc).sum()) * dt
            rep.water_prod.append(float(-(prod * fw).sum()))
        _out(num_steps, p, flux)
        return PolymerState(pressure=p, sw=sw, c=c, cmax=cmax, flux=flux), \
            rep


class SimulatorCompressiblePolymer:
    """SimulatorCompressiblePolymer.cpp: CompressibleTpfaPolymer pressure
    Newton + compressible reordered (s, c) transport."""

    def __init__(self, grid, props, poly: PolymerProperties, src,
                 inflow: PolymerInflow, *, gravity_on=False, rock=None,
                 pin_cell=None, pin_val=0.0):
        self.model = CompressiblePolymerModel(grid, props, poly,
                                              gravity_on=gravity_on,
                                              rock=rock, pin_cell=pin_cell,
                                              pin_val=pin_val)
        self.src = np.asarray(src)
        self.inflow = inflow

    def initial_state(self, p0, sw0, c0=None) -> CompPolymerState:
        model = self.model
        p0 = jnp.asarray(p0)
        sw0 = jnp.asarray(sw0)
        c = jnp.zeros(model.nc) if c0 is None else jnp.asarray(c0)
        z = jnp.stack([model.props.b_w(p0) * sw0,
                       model.props.b_o(p0) * (1.0 - sw0)])
        return CompPolymerState(pressure=p0, sw=sw0, c=c, cmax=c, z=z,
                                flux=jnp.zeros(model.grid.nf))

    def run(self, state: CompPolymerState, dt, num_steps, *,
            output_dir=None, output_vtk=False, output_matlab=False):
        model = self.model
        poly = model.poly
        rep = PolymerReport()
        t = 0.0

        def _out(i, st):
            # SimulatorCompressiblePolymer.cpp:524-556 output pattern
            if output_dir and (output_vtk or output_matlab):
                from opm_tpu.io.matlab import output_simple_state
                output_simple_state(
                    output_dir, i, model.grid, pressure=st.pressure,
                    sw=st.sw, flux=st.flux,
                    extra={"concentration": st.c, "cmax": st.cmax,
                           "surfvolume": np.asarray(st.z).T.reshape(-1)},
                    matlab=output_matlab, vtk=output_vtk)

        for i_step in range(num_steps):
            _out(i_step, state)
            p_old = state.pressure
            p, flux, _, _, _ = model.pressure_solve_polymer(
                p_old, state.sw, state.c, state.cmax, state.z, self.src, dt)
            c_inj = self.inflow.at(t)
            c_inflow = jnp.where(jnp.asarray(self.src) > 0, c_inj, 0.0)
            sw, c, cmax, z, _ = model.transport_polymer(
                state.sw, state.c, state.cmax, p_old, p, flux, self.src,
                c_inflow, dt)
            state = CompPolymerState(pressure=p, sw=sw, c=c, cmax=cmax, z=z,
                                     flux=flux)
            t += dt
            rep.times.append(t)
            mu_w = np.asarray(model.props.mu_w(p))
            src_c = np.maximum(self.src, 0.0) * c_inj
            rep.injected_polymer += float(src_c.sum()) * dt
            ff = np.asarray(model._frac_flow_poly(sw, c, cmax,
                                                  model.props.mu_w(p),
                                                  model.props.mu_o(p)))
            mc = np.asarray(poly.polymer_frac_in_water(c, mu_w))
            prod = np.minimum(self.src, 0.0)
            rep.produced_polymer += float(
                -(prod * ff * np.asarray(c) * mc).sum()) * dt
            rep.water_prod.append(float(-(prod * ff).sum()))
        _out(num_steps, state)
        return state, rep
