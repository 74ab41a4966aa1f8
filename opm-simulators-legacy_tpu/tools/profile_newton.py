"""profile_newton: time the pieces of one Newton iteration separately.

Splits the fused substep's work into its three jit kernels — residual +
convergence, block-Jacobian assembly, CPR/BiCGStab solve — and times each
warm (block_until_ready). This is the measurement that directs layout work:
the reference's equivalent is its detailed SimulatorReport assemble/solve
split (opm/simulators/timestepping & SimulatorReport).

    python -m opm_tpu.tools.profile_newton [--nz 10] [--cpu] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _time(fn, *a, reps=3):
    out = fn(*a)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax_block(out)
    return (time.perf_counter() - t0) / reps, out


def jax_block(x):
    import jax

    jax.block_until_ready(x)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="profile_newton", description=__doc__)
    ap.add_argument("--nx", type=int, default=60)
    ap.add_argument("--ny", type=int, default=220)
    ap.add_argument("--nz", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from opm_tpu.linalg.krylov import bicgstab
    from opm_tpu.linalg.precond import make_cpr
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
    print(f"# backend={jax.default_backend()} nc={model.nc} "
          f"setup={time.perf_counter() - t0:.1f}s", file=sys.stderr)

    state = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[0]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    state = sim._init_well_state(state, ws, True)
    dt = jnp.asarray(0.5 * 86400.0)
    acc0 = model.accumulation(state)
    cdp = solver._cdp_jit(state, wd)

    timings = {}

    def timed(name, fn, *a):
        t, out = _time(fn, *a, reps=args.reps)
        timings[name] = round(1000 * t, 1)
        print(f"#   {name}: {1000 * t:.1f} ms", file=sys.stderr)
        return out

    res, conv, _, _ = timed("assemble_residual", solver._assemble_jit,
                            state, acc0, dt, wd, cdp)

    jac = jax.jit(lambda s: linearize.assemble(model, s, acc0, dt, wd, cdp))
    sys_ = timed("jacobian_blocks", jac, state)

    dims = solver._dims

    def solve_only(sys_):
        M = make_cpr(sys_, solver.amg, dims=dims)
        r = bicgstab(lambda v: linearize.matvec(sys_, *v, dims=dims),
                     (sys_.r_cell, sys_.r_well), precond=M,
                     tol=solver.linear_tol, maxiter=solver.linear_maxiter)
        return r.x[0], r.iterations

    solve_jit = jax.jit(solve_only)
    _, lin_iters = timed("cpr_bicgstab_solve", solve_jit, sys_)

    def matvec_only(sys_, v):
        return linearize.matvec(sys_, *v, dims=dims)

    v = (sys_.r_cell, sys_.r_well)
    mv_jit = jax.jit(matvec_only)
    timed("one_matvec", mv_jit, sys_, v)

    def precond_only(sys_, v):
        return make_cpr(sys_, solver.amg, dims=dims)(v)

    pc_jit = jax.jit(precond_only)
    timed("one_precond_apply", pc_jit, sys_, v)

    full = timed("full_newton_solve", solver._solve_jit, state, acc0, dt,
                 wd, cdp, jnp.asarray(1.0))

    print(json.dumps(dict(backend=jax.default_backend(), nc=model.nc,
                          lin_iters=int(lin_iters), **timings)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
