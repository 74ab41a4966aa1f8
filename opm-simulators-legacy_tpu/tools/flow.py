"""flow: the simulator CLI.

Counterpart of the reference's example mains (examples/flow_legacy.cpp,
flow_sequential.cpp, flow_reorder.cpp) and FlowMain's setup pipeline
(/root/reference/opm/autodiff/FlowMain.hpp:131-180): deck in, simulation out
(summary CSV, optional restart checkpoints and VTK), with solver selection
flags mirroring setupLinearSolver (:806-830).

    python -m opm_tpu.tools.flow CASE.DATA [--output-dir out]
        [--model fi|sequential|reorder] [--linear-solver auto|dense|cpr]
        [--report-steps N] [--vtk] [--restart-file F] [--write-restart]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="flow", description=__doc__)
    ap.add_argument("deck")
    ap.add_argument("--output-dir", default="output")
    ap.add_argument("--model", choices=["fi", "sequential", "reorder"],
                    default="fi")
    ap.add_argument("--linear-solver", choices=["auto", "dense", "cpr"],
                    default="auto")
    ap.add_argument("--report-steps", type=int, default=None)
    ap.add_argument("--vtk", action="store_true")
    ap.add_argument("--matlab", action="store_true",
                    help="per-variable NNN.txt dumps per report step "
                         "(output_matlab, BlackoilMatlabWriter role)")
    ap.add_argument("--write-restart", action="store_true")
    ap.add_argument("--restart-file", default=None)
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--param", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="ParameterGroup override (repeatable; "
                         "param_file=FILE loads key=value lines) — e.g. "
                         "tolerance_cnv=1e-3, max_iter=12, initial_dt=2.0")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="multi-host: jax.distributed coordinator address "
                         "(setupParallelism analogue, FlowMain.hpp:252-284;"
                         " also via OPM_TPU_COORDINATOR)")
    ap.add_argument("--num-procs", type=int, default=None)
    ap.add_argument("--proc-id", type=int, default=None)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.coordinator or "OPM_TPU_COORDINATOR" in __import__("os").environ:
        from opm_tpu.parallel.distributed import initialize_distributed
        rank, nproc = initialize_distributed(
            args.coordinator, args.num_procs, args.proc_id)
        if rank != 0:
            args.quiet = True     # rank-0-only terminal output (OpmLog)

    from opm_tpu.io.eclstate import load_case
    from opm_tpu.models.blackoil import ModelParams
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.sequential import SimulatorSequentialBlackoil
    from opm_tpu.solver.newton import NonlinearSolver
    from opm_tpu.solver.timestepping import TimeStepControlParams
    from opm_tpu.utils.param import ParameterGroup

    pg = ParameterGroup.from_args(args.param)
    mparams = pg.apply_to_dataclass(ModelParams())
    DAY = 86400.0
    tsp = TimeStepControlParams()
    for f in ("initial_dt", "max_dt", "min_dt"):
        if pg.has(f):
            tsp = __import__("dataclasses").replace(
                tsp, **{f: pg.get_default(f, getattr(tsp, f) / DAY) * DAY})
    tsp = pg.apply_to_dataclass(tsp)

    case = load_case(args.deck)
    if not args.quiet:
        print(f"{case.runspec.title or args.deck}: "
              f"{case.runspec.dims} {'/'.join(case.runspec.phases)}"
              f"{' DISGAS' if case.runspec.disgas else ''}"
              f"{' VAPOIL' if case.runspec.vapoil else ''}")
    if args.model in ("sequential", "reorder"):
        # flow_reorder = the sequential pair with the reordering transport
        # model (examples/flow_reorder.cpp:33-43)
        from opm_tpu.models.sequential import SequentialParams
        sp = SequentialParams(transport="reorder") \
            if args.model == "reorder" else None
        sim = SimulatorSequentialBlackoil(case, seq_params=sp,
                                          params=mparams, ts_params=tsp,
                                          output_dir=args.output_dir)
    else:
        sim = SimulatorFullyImplicitBlackoil(case, params=mparams,
                                             ts_params=tsp,
                                             output_dir=args.output_dir)
    if args.linear_solver != "auto" and args.model == "fi":
        sim.solver = NonlinearSolver(sim.model,
                                     linear_solver=args.linear_solver)
    t0 = time.perf_counter()
    sim.run(report_step_limit=args.report_steps,
            verbose=not args.quiet, restart_file=args.restart_file,
            write_restart=args.write_restart, write_vtk=args.vtk,
            write_matlab=args.matlab)
    wall = time.perf_counter() - t0
    unused = pg.unused()
    if unused:
        # warnIfUnusedParams (FlowMain.hpp:862-868)
        print(f"WARNING: unused parameters: {', '.join(unused)}")
    rep = sim.report
    print(json.dumps(dict(
        wall_s=round(wall, 2), substeps=rep.substeps,
        failed_substeps=rep.failed_substeps,
        newton_iterations=rep.newton_iterations,
        assemble_s=round(rep.assemble_time, 2),
        linear_solve_s=round(rep.linear_solve_time, 2))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
