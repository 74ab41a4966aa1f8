"""kernel_bench: true device-side cost of the hot linear-solve kernels.

Times the Krylov matvec and the CPR preconditioner apply inside a
`lax.fori_loop` of N applications in ONE device program — removing the
per-call host/tunnel dispatch that inflates isolated timings
(profile_newton) — and reports per-apply milliseconds plus the
bandwidth-derived speed-of-light estimate for the matvec.

    python -m opm_tpu.tools.kernel_bench [--nz 10] [--reps 100] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kernel_bench", description=__doc__)
    ap.add_argument("--nx", type=int, default=60)
    ap.add_argument("--ny", type=int, default=220)
    ap.add_argument("--nz", type=int, default=10)
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

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
    sys_ = jax.jit(
        lambda s: linearize.assemble(model, s, acc0, dt, wd, cdp))(state)
    jax.block_until_ready(sys_.diag)
    print(f"# backend={jax.default_backend()} nc={model.nc} "
          f"setup={time.perf_counter() - t0:.1f}s", file=sys.stderr)

    dims = solver._dims
    reps = args.reps
    out = dict(backend=jax.default_backend(), nc=model.nc, reps=reps)

    def loop_time(name, body, v0):
        @jax.jit
        def run(v):
            return jax.lax.fori_loop(0, reps, lambda i, x: body(x), v)

        r = run(v0)                       # compile + warm
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = run(v0)
        jax.block_until_ready(r)
        ms = 1000 * (time.perf_counter() - t0) / reps
        out[name] = round(ms, 3)
        print(f"#   {name}: {ms:.3f} ms/apply", file=sys.stderr)

    v64 = (sys_.r_cell, sys_.r_well)

    # f64 matvec
    loop_time("matvec_f64",
              lambda v: linearize.matvec(sys_, *v, dims=dims), v64)

    # f32 matvec (the production operator under OPM_TPU_MATVEC_F32)
    sys32 = jax.tree.map(
        lambda a: (a.astype(jnp.float32)
                   if jnp.issubdtype(a.dtype, jnp.floating) else a), sys_)
    v32 = jax.tree.map(lambda a: a.astype(jnp.float32), v64)
    loop_time("matvec_f32",
              lambda v: linearize.matvec(sys32, *v, dims=dims), v32)

    # CPR preconditioner apply (production make_cpr_cells path)
    from opm_tpu.linalg.precond import make_cpr_cells
    M = make_cpr_cells(sys_, solver.amg, dims=dims)
    loop_time("cpr_apply", lambda v: M(v), sys_.r_cell)

    # BiCGStab-iteration recurrence estimate: 6 axpys + 4 dots on (3, nc)
    def recurrence(v):
        a = jnp.vdot(v, v)
        w = v * a + 1.3 * v
        b = jnp.vdot(w, v)
        w = w + (a / b) * v
        c = jnp.vdot(w, w)
        w = w * (b / c) + v
        d = jnp.vdot(w, v)
        return w * (d / (c + 1.0))

    loop_time("recurrence_f64", recurrence, sys_.r_cell)

    # speed-of-light: stencil values 9 dirs x 7 blocks... matvec traffic =
    # diag 9*nc + 6 face arrays 3*3*nf_dir + vectors; report bytes moved
    nbytes64 = sum(a.size * a.dtype.itemsize
                   for a in jax.tree.leaves(sys_)
                   if hasattr(a, "dtype")
                   and jnp.issubdtype(a.dtype, jnp.floating))
    out["sys_mbytes_f64"] = round(nbytes64 / 1e6, 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
