"""Adaptive sub-stepping with failure chopping.

Counterpart of /root/reference/opm/simulators/timestepping/
AdaptiveTimeStepping_impl.hpp: report steps are subdivided; on solver failure
(TooManyIterations / NumericalIssue) the state is restored, dt is chopped by
restart_factor (0.33) and retried up to solver_restart_max (10) times
(:235-373); on success the next dt comes from a step controller (here the
iteration-count controller; PID on solution change is the 'pid' option),
bounded by growth_factor (:118-158). Schedule events (well changes) reset dt
to event_dt (SimulatorBase_impl.hpp:229-236).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from opm_tpu.solver.newton import (LinearSolverProblem, NumericalIssue,
                                   SolverReport, TooManyIterations)

DAY = 86400.0


@dataclass
class TimeStepControlParams:
    initial_dt: float = 1.0 * DAY
    max_dt: float = 365.0 * DAY
    min_dt: float = 0.1 * DAY
    restart_factor: float = 0.33
    growth_factor: float = 3.0
    max_growth: float = 3.0
    failed_growth: float = 2.0     # growth cap right after a restart
    solver_restart_max: int = 10
    target_iterations: int = 8     # iteration-count controller
    event_reset: bool = True


@dataclass
class SubStepReport:
    substeps: int = 0
    failed_substeps: int = 0
    total_newton: int = 0
    total_linear: int = 0
    solver_time: float = 0.0


class AdaptiveTimeStepping:
    def __init__(self, params: Optional[TimeStepControlParams] = None,
                 tuning: Optional[dict] = None):
        self.p = params or TimeStepControlParams()
        if tuning:
            self.p.initial_dt = tuning.get("tsinit", self.p.initial_dt)
            self.p.max_dt = tuning.get("tsmaxz", self.p.max_dt)
            self.p.min_dt = tuning.get("tsminz", self.p.min_dt)
        self.suggested_dt = self.p.initial_dt

    def step(self, solve_fn: Callable, state, report_step_length: float,
             *, had_event: bool = False, substep_callback=None):
        """Run one report step of length report_step_length.

        solve_fn(state, dt) -> (new_state, SolverReport); must raise
        NumericalIssue/TooManyIterations on failure. Returns
        (state, SubStepReport)."""
        p = self.p
        rep = SubStepReport()
        remaining = report_step_length
        dt = min(self.suggested_dt, remaining, p.max_dt)
        if had_event and p.event_reset:
            dt = min(p.initial_dt, remaining)
        restarts = 0
        just_failed = False
        t_local = 0.0
        while remaining > 1e-6:
            dt = min(dt, remaining)
            try:
                new_state, srep = solve_fn(state, dt)
            except (NumericalIssue, TooManyIterations, LinearSolverProblem):
                rep.failed_substeps += 1
                restarts += 1
                if restarts > p.solver_restart_max:
                    raise
                dt = max(dt * p.restart_factor, p.min_dt)
                just_failed = True
                continue
            # success
            state = new_state
            remaining -= dt
            t_local += dt
            rep.substeps += 1
            rep.total_newton += srep.iterations
            rep.total_linear += srep.linear_iterations
            rep.solver_time += srep.assemble_time + srep.linear_solve_time
            if substep_callback is not None:
                substep_callback(state, t_local, dt, srep)
            # iteration-count dt control (SimpleIterationCount semantics)
            its = max(srep.iterations, 1)
            growth = p.failed_growth if just_failed else p.growth_factor
            factor = min(growth, max(0.1, p.target_iterations / its))
            dt = float(np.clip(dt * factor, p.min_dt, p.max_dt))
            just_failed = False
        self.suggested_dt = dt
        return state, rep
