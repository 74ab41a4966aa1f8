"""SimulatorSequentialBlackoil: flow_sequential / flow_reorder drivers.

Counterpart of /root/reference/opm/autodiff/SimulatorSequentialBlackoil.hpp
and examples/flow_sequential.cpp / flow_reorder.cpp: same report-step loop as
the fully-implicit driver, but each substep is a pressure solve followed by a
transport solve (optionally iterated to full implicitness).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from opm_tpu.models.blackoil import make_well_device_arrays
from opm_tpu.models.sequential import (BlackoilSequentialModel,
                                       SequentialParams)
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
from opm_tpu.solver.newton import (NumericalIssue, SolverReport,
                                  TooManyIterations)


class SimulatorSequentialBlackoil(SimulatorFullyImplicitBlackoil):
    """Drives BlackoilSequentialModel through the schedule. Reuses the
    fully-implicit driver's well handling, substepping, and summary."""

    def __init__(self, case, *, seq_params: Optional[SequentialParams] = None,
                 **kw):
        super().__init__(case, **kw)
        self.seq = BlackoilSequentialModel(self.model, seq_params)
        # route the adaptive stepper's solve through the sequential model
        self.solver = _SequentialSolverAdapter(self.seq)


class _SequentialSolverAdapter:
    def __init__(self, seq: BlackoilSequentialModel):
        self.seq = seq
        self.model = seq.model
        self._fi_fallback = None

    def step(self, state, dt, wd, report: Optional[SolverReport] = None):
        rep = report or SolverReport()
        import time as _time

        from opm_tpu.wells import standard as stdwells
        t0 = _time.perf_counter()
        # schedule-driven control switching before the step
        ctrl, tgt = stdwells.update_controls(wd, state.bhp, state.qs,
                                             state.control, state.target)
        state = state._replace(control=ctrl, target=tgt)
        try:
            state, info = self.seq.step(state, dt, wd)
        except (TooManyIterations, NumericalIssue):
            # the splitting can stall where the well equations kink (free
            # gas reaching a producer); rather than burning dt-chop
            # retries on a non-dt problem, take this substep fully
            # implicitly (the remedy the reference's
            # iterate_to_fully_implicit option gestures at —
            # BlackoilSequentialModel.hpp:130-230)
            if self._fi_fallback is None:
                from opm_tpu.solver.newton import NonlinearSolver
                self._fi_fallback = NonlinearSolver(self.model)
            state, firep = self._fi_fallback.step(state, dt, wd)
            rep.iterations = firep.iterations
            rep.linear_iterations += firep.linear_iterations
            rep.converged = True
            rep.assemble_time += _time.perf_counter() - t0
            return state, rep
        # dt control sees the OUTER sequential iterations (the reference's
        # NonlinearSolver counts BlackoilSequentialModel::nonlinearIteration
        # calls, not the stages' inner Newton/sweep counts — reporting
        # stage iterations here made the iteration-count controller chop
        # dt towards min_dt)
        rep.iterations = max(int(info.get("outer_iters", 1)), 1)
        rep.linear_iterations += int(info.get("pressure_iters", 0))
        rep.converged = True
        rep.assemble_time += _time.perf_counter() - t0
        return state, rep
