"""lin_ab: A/B the production linear-solve configuration.

Builds the SPE10-like system at a given size, assembles at the initial
state AND at a once-Newton-updated state (a more production-like system),
and times the PRODUCTION solve path (Schur well elimination +
make_cpr_cells + BiCGStab) warm, reporting iterations and per-solve ms
for each state. Env knobs (OPM_TPU_GMG_PRE/POST/CYCLES, OPM_TPU_CPR_SMOOTH,
OPM_TPU_CPR_SMOOTHER, OPM_TPU_CPR_F32, ...) are read at trace time, so set
them on the command line:

    python -m opm_tpu.tools.lin_ab --set OPM_TPU_GMG_CYCLES=2 [--nz 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lin_ab", description=__doc__)
    ap.add_argument("--nx", type=int, default=60)
    ap.add_argument("--ny", type=int, default=220)
    ap.add_argument("--nz", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VAL", help="env knob (repeatable)")
    args = ap.parse_args(argv)
    knobs = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        os.environ[k] = v
        knobs[k] = v
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from opm_tpu.linalg.krylov import bicgstab, bicgstab_mp
    from opm_tpu.linalg.precond import make_cpr_cells
    from opm_tpu.solver.newton import _krylov_f32_knob
    from opm_tpu.models import linearize
    from opm_tpu.models.blackoil import make_well_device_arrays
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.init import initial_state
    from opm_tpu.sim.testcases import spe10like_case

    t0 = time.perf_counter()
    case = spe10like_case(nx=args.nx, ny=args.ny, nz=args.nz)
    sim = SimulatorFullyImplicitBlackoil(case)
    model = sim.model
    solver = sim.solver
    state = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[0]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    state = sim._init_well_state(state, ws, True)
    dt = jnp.asarray(0.5 * 86400.0)
    acc0 = model.accumulation(state)
    cdp = solver._cdp_jit(state, wd)
    dims = solver._dims
    op_dtype = jnp.float32

    assemble = jax.jit(
        lambda s: linearize.assemble(model, s, acc0, dt, wd, cdp))

    def solve(sys_):
        mv, rhs, recover = linearize.schur_eliminate_wells(
            sys_, dims=dims, op_dtype=op_dtype)
        M = make_cpr_cells(sys_, solver.amg, dims=dims)
        if _krylov_f32_knob():
            mv64, _, _ = linearize.schur_eliminate_wells(
                sys_, dims=dims, op_dtype=None)
            res = bicgstab_mp(mv, rhs, precond=M, matvec_check=mv64,
                              tol=solver.linear_tol,
                              maxiter=solver.linear_maxiter)
        else:
            res = bicgstab(mv, rhs, precond=M, tol=solver.linear_tol,
                           maxiter=solver.linear_maxiter)
        return res.x, res.iterations, res.rel_residual

    solve_jit = jax.jit(solve)
    # state A: t=0; state B: after one Newton update (production-like)
    sysA = assemble(state)
    stateB, _, _ = jax.jit(lambda s, a: solver._solve_cpr(
        s, a, dt, wd, cdp, jnp.asarray(1.0)))(state, acc0)
    sysB = assemble(stateB)
    jax.block_until_ready(sysB.diag)
    print(f"# backend={jax.default_backend()} nc={model.nc} "
          f"setup={time.perf_counter() - t0:.1f}s", file=sys.stderr)

    out = dict(backend=jax.default_backend(), nc=model.nc, **knobs)
    for tag, sys_ in (("A", sysA), ("B", sysB)):
        x, its, rel = solve_jit(sys_)       # compile + warm
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            x, its, rel = solve_jit(sys_)
        jax.block_until_ready(x)
        ms = 1000 * (time.perf_counter() - t0) / args.reps
        out[f"iters_{tag}"] = int(its)
        out[f"ms_{tag}"] = round(ms, 1)
        out[f"rel_{tag}"] = float(rel)
        print(f"#   state {tag}: {int(its)} iters, {ms:.1f} ms, "
              f"rel={float(rel):.2e}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
