"""scaling_bench: cell-count scaling measurement on the current backend.

Runs fixed-dt fused Newton substeps of the SPE10-like waterflood at a chosen
grid size and reports ms per Newton iteration and cell-iterations/s — the
metric that tracks the BASELINE.md SPE10 north star (the full 60x220x85
model is --nz 85).

    python -m opm_tpu.tools.scaling_bench [--nz 20] [--substeps 4] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="scaling_bench", description=__doc__)
    ap.add_argument("--nx", type=int, default=60)
    ap.add_argument("--ny", type=int, default=220)
    ap.add_argument("--nz", type=int, default=20)
    ap.add_argument("--substeps", type=int, default=4)
    ap.add_argument("--dt-days", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from opm_tpu.models.blackoil import make_well_device_arrays
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.init import initial_state
    from opm_tpu.sim.testcases import spe10like_case
    from opm_tpu.solver.newton import SolverReport

    t0 = time.perf_counter()
    case = spe10like_case(nx=args.nx, ny=args.ny, nz=args.nz)
    sim = SimulatorFullyImplicitBlackoil(case)
    nc = sim.model.nc
    print(f"# backend={jax.default_backend()} nc={nc} "
          f"solver={sim.solver.linear_solver} "
          f"setup={time.perf_counter() - t0:.1f}s", file=sys.stderr)

    state = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[0]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    state = sim._init_well_state(state, ws, True)
    dt = args.dt_days * 86400.0

    from opm_tpu.solver.newton import (LinearSolverProblem, NumericalIssue,
                                       TooManyIterations)

    def try_step(s, dti):
        """Chop-on-failure like the adaptive stepper (bounded retries)."""
        for _ in range(8):
            try:
                s2, rep = sim.solver.step_fused(s, dti, wd, SolverReport())
                return s2, rep, dti
            except (NumericalIssue, TooManyIterations, LinearSolverProblem):
                dti *= 0.33
        raise RuntimeError("could not find a stable dt")

    # warm-up substep (compile)
    t0 = time.perf_counter()
    state, rep, dt = try_step(state, dt)
    compile_s = time.perf_counter() - t0
    newtons = 0
    t0 = time.perf_counter()
    for _ in range(args.substeps):
        state, rep, dt = try_step(state, min(dt * 2, args.dt_days * 86400))
        newtons += rep.iterations
    wall = time.perf_counter() - t0
    print(json.dumps(dict(
        backend=jax.default_backend(), nc=nc, substeps=args.substeps,
        newtons=newtons, wall_s=round(wall, 2),
        ms_per_newton=round(1000 * wall / max(newtons, 1), 1),
        cell_newtons_per_s=round(nc * newtons / wall),
        compile_s=round(compile_s, 1))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
