"""profile_sections: per-section timing of the PRODUCTION fused Newton.

Times each section of the production path (the exact kernels step_fused
executes: f64 residual+convergence, f32 shadow Jacobian assembly, cdp,
inner well Newton, Schur-eliminated f32 operator matvec, CPR
preconditioner apply, the full mixed-precision BiCGStab solve, chopped
update) separately, warm, plus the fused substep itself as the
ground-truth per-Newton number. Directs the roofline work of VERDICT r3
#4 (the repo's own metric said 0.5% of HBM peak — the gap is
dispatch/latency/fusion, and this split says which).

Sections jitted separately lose cross-section fusion, so the sum can
exceed the fused whole — the value is the RANKING, not the sum.

    python -m opm_tpu.tools.profile_sections [--nz 10] [--cpu] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="profile_sections",
                                 description=__doc__)
    ap.add_argument("--nx", type=int, default=60)
    ap.add_argument("--ny", type=int, default=220)
    ap.add_argument("--nz", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VAL", help="env knob (repeatable)")
    args = ap.parse_args(argv)
    import os
    for kv in args.set:
        k, _, v = kv.partition("=")
        os.environ[k] = v
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from opm_tpu.linalg.krylov import bicgstab, bicgstab_mp
    from opm_tpu.linalg.precond import make_cpr_cells
    from opm_tpu.models import linearize
    from opm_tpu.models.blackoil import make_well_device_arrays
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.init import initial_state
    from opm_tpu.sim.testcases import spe10like_case
    from opm_tpu.solver.newton import (SolverReport, _asm_f32_knob,
                                       _krylov_f32_knob)
    from opm_tpu.solver.update import update_state
    from opm_tpu.utils.cast import cast_floats, shadow_model

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

    # advance to a production-like state: one full substep
    state, _ = solver.step_fused(state, float(dt), wd, SolverReport())
    acc0 = model.accumulation(state)
    cdp = solver._cdp_jit(state, wd)

    timings = {}

    def timed(name, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
        jax.block_until_ready(out)
        dtm = (time.perf_counter() - t1) / args.reps
        timings[name] = round(1000 * dtm, 2)
        print(f"#   {name}: {1000 * dtm:.2f} ms", file=sys.stderr)
        return out

    # 1. f64 residual + convergence + control switching (every iteration)
    timed("residual_convergence_f64", solver._assemble_jit,
          state, acc0, dt, wd, cdp)

    # 2. Jacobian assembly at the production precision
    if _asm_f32_knob():
        model32 = shadow_model(model, jnp.float32)
        asm = jax.jit(lambda s: linearize.assemble(
            model32, cast_floats(s, jnp.float32),
            cast_floats(acc0, jnp.float32), cast_floats(dt, jnp.float32),
            cast_floats(wd, jnp.float32), cast_floats(cdp, jnp.float32)))
        sys_ = timed("jacobian_assembly_f32", asm, state)
        res64 = model.residual(state, acc0, dt, wd, cdp)
        sys_ = sys_._replace(
            r_cell=res64.cell,
            r_well=jnp.concatenate(
                [res64.well_flux, res64.well_ctrl[:, None]], axis=1))
    else:
        asm = jax.jit(lambda s: linearize.assemble(
            model, s, acc0, dt, wd, cdp))
        sys_ = timed("jacobian_assembly_f64", asm, state)

    # 3. wellbore pressure profile (once per substep)
    timed("cdp_two_pass", solver._cdp_jit, state, wd)

    # 4. inner well Newton (once per substep)
    if model.params.solve_welleq_initially:
        welleq = jax.jit(solver._solve_welleq)
        timed("solve_welleq", welleq, state, acc0, dt, wd, cdp)

    dims = solver._dims
    op_dtype = jnp.float32

    # 5. one Schur-eliminated operator matvec (per Krylov iteration: 2)
    mv, rhs, recover = linearize.schur_eliminate_wells(
        sys_, dims=dims, op_dtype=op_dtype)
    mv_jit = jax.jit(lambda s, v: linearize.schur_eliminate_wells(
        s, dims=dims, op_dtype=op_dtype)[0](v))
    v0 = rhs if not _krylov_f32_knob() else rhs.astype(jnp.float32)
    timed("schur_matvec_f32", mv_jit, sys_, v0)

    # 6. one CPR preconditioner apply (per Krylov iteration: 2)
    pc_jit = jax.jit(lambda s, v: make_cpr_cells(s, solver.amg,
                                                 dims=dims)(v))
    timed("cpr_precond_apply", pc_jit, sys_, v0)

    # 7. the full production linear solve
    def solve_full(s):
        mv_, rhs_, rec_ = linearize.schur_eliminate_wells(
            s, dims=dims, op_dtype=op_dtype)
        M = make_cpr_cells(s, solver.amg, dims=dims)
        if _krylov_f32_knob():
            mv64, _, _ = linearize.schur_eliminate_wells(
                s, dims=dims, op_dtype=None)
            r = bicgstab_mp(mv_, rhs_, precond=M, matvec_check=mv64,
                            tol=solver.linear_tol,
                            maxiter=solver.linear_maxiter)
        else:
            r = bicgstab(mv_, rhs_, precond=M, tol=solver.linear_tol,
                         maxiter=solver.linear_maxiter)
        return r.x, r.iterations

    out = timed("linear_solve_full", jax.jit(solve_full), sys_)
    lin_iters = int(out[1])

    # 8. chopped state update
    du0 = jnp.zeros(3 * model.nc + 4 * state.bhp.shape[0])
    timed("update_state", jax.jit(
        lambda s, d: update_state(model, s, d)), state, du0)

    # 9. ground truth: the fused substep, per Newton
    st2, rep = solver.step_fused(state, float(dt), wd, SolverReport())
    t1 = time.perf_counter()
    st2, rep = solver.step_fused(state, float(dt), wd, SolverReport())
    wall = time.perf_counter() - t1
    newtons = max(rep.iterations, 1)
    timings["fused_substep_ms"] = round(1000 * wall, 1)
    timings["fused_newtons"] = newtons
    timings["fused_ms_per_newton"] = round(1000 * wall / newtons, 1)
    timings["fused_linear_per_newton"] = round(
        rep.linear_iterations / newtons, 2)

    print(json.dumps(dict(backend=jax.default_backend(), nc=model.nc,
                          lin_iters_probe=lin_iters, **timings)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
