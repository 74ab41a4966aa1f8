"""SimulatorIncompTwophase: IMPES-style driver for incompressible 2-phase.

Counterpart of /root/reference/opm/simulators/SimulatorIncompTwophaseAd.cpp
(also the shape of SimulatorCompressibleTwophase): per step, solve TPFA
pressure, then implicit water transport, collect watercut/production report.
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
    def __init__(self, grid, props, src, *, gravity_on=True, bcs=None):
        self.model = TwophaseModel(grid, props, gravity_on=gravity_on,
                                   bcs=bcs)
        self.src = np.asarray(src)

    def run(self, sw0, dt, num_steps, *, p_fix_val=1e7) -> tuple:
        model = self.model
        sw = jnp.asarray(sw0)
        rep = TwophaseReport()
        t = 0.0
        p = None
        flux = None
        for _ in range(num_steps):
            p, flux, q_bc, pit = model.pressure_solve(
                sw, self.src, p_fix_val=p_fix_val)
            # boundary fluxes act as transport sources (inflow = water)
            src_t = self.src + np.asarray(q_bc)
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
        return TwophaseState(pressure=p, sw=sw, flux=flux), rep
