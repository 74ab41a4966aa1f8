"""schwarz_cpr_ab: A/B the FULL CPR solve with Schwarz preconditioner knobs.

tools/schwarz_ab.py sweeps the raw TPFA pressure proxy; this harness
measures what the dryrun actually reports — full-system BiCGStab
iteration counts on the REAL assembled black-oil system (quasi-IMPES
pressure weights + Schur well elimination + stage-2 smoothing), global
StructuredGmg vs SchwarzGmg under each knob setting (overlap / tile /
zb / cycles).  The reference's bar: parallel preconditioning stays near
serial iteration counts (ISTLSolver.hpp:283-340).

    python -m opm_tpu.tools.schwarz_cpr_ab --devices 8 \
        --config "OPM_TPU_SCHWARZ_OVERLAP=2" \
        --config "OPM_TPU_SCHWARZ_ZB=8,OPM_TPU_SCHWARZ_TILE=4"
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="schwarz_cpr_ab", description=__doc__)
    ap.add_argument("--nx", type=int, default=40)
    ap.add_argument("--ny", type=int, default=40)
    ap.add_argument("--nz", type=int, default=64)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--config", action="append", default=[],
                    metavar="K=V[,K=V...]",
                    help="one Schwarz config per flag (repeatable)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import opm_tpu  # noqa: F401
    from opm_tpu.linalg.gmg import StructuredGmg
    from opm_tpu.linalg.krylov import bicgstab
    from opm_tpu.linalg.precond import make_cpr_cells
    from opm_tpu.models import linearize
    from opm_tpu.models.blackoil import make_well_device_arrays
    from opm_tpu.parallel.schwarz import SchwarzGmg
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.init import initial_state
    from opm_tpu.sim.testcases import spe10like_case

    t0 = time.perf_counter()
    case = spe10like_case(nx=args.nx, ny=args.ny, nz=args.nz)
    sim = SimulatorFullyImplicitBlackoil(case)
    model, solver = sim.model, sim.solver
    state = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[0]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    state = sim._init_well_state(state, ws, True)
    dt = jnp.asarray(0.5 * 86400.0)
    acc0 = model.accumulation(state)
    cdp = solver._cdp_jit(state, wd)
    dims = solver._dims
    mesh = Mesh(jax.devices()[: args.devices], ("cells",))
    trans = model.grid.trans[: model.grid.nf_canonical]

    assemble = jax.jit(
        lambda s: linearize.assemble(model, s, acc0, dt, wd, cdp))
    sysA = assemble(state)
    stateB, _, _ = jax.jit(lambda s, a: solver._solve_cpr(
        s, a, dt, wd, cdp, jnp.asarray(1.0)))(state, acc0)
    sysB = assemble(stateB)
    jax.block_until_ready(sysB.diag)
    print(f"# nc={model.nc} setup={time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    def run(amg, tag):
        def solve(sys_):
            mv, rhs, _rec = linearize.schur_eliminate_wells(
                sys_, dims=dims, op_dtype=jnp.float32)
            M = make_cpr_cells(sys_, amg, dims=dims)
            res = bicgstab(mv, rhs, precond=M, tol=solver.linear_tol,
                           maxiter=200)
            return res.iterations, res.rel_residual

        sj = jax.jit(solve)
        row = {}
        for name, sys_ in (("A", sysA), ("B", sysB)):
            t1 = time.perf_counter()
            its, rel = sj(sys_)
            its = int(its)
            row[f"iters_{name}"] = its
            row[f"rel_{name}"] = float(rel)
            print(f"#   {tag} state {name}: {its} iters "
                  f"(rel={float(rel):.1e}, {time.perf_counter()-t1:.0f}s)",
                  file=sys.stderr, flush=True)
        return row

    results = {}
    results["global"] = run(StructuredGmg(dims, trans), "global")

    configs = args.config or [""]
    knob_names = ("OPM_TPU_SCHWARZ_OVERLAP", "OPM_TPU_SCHWARZ_TILE",
                  "OPM_TPU_SCHWARZ_ZB", "OPM_TPU_SCHWARZ_CYCLES",
                  "OPM_TPU_SCHWARZ_COARSE")
    for cfg in configs:
        saved = {k: os.environ.pop(k, None) for k in knob_names}
        try:
            for kv in filter(None, cfg.split(",")):
                k, _, v = kv.partition("=")
                os.environ[k.strip()] = v.strip()
            tag = cfg or "schwarz-default"
            results[tag] = run(
                SchwarzGmg(dims, mesh, "cells", trans), tag)
            base = results["global"]
            results[tag]["inflation_B"] = round(
                (results[tag]["iters_B"] - base["iters_B"])
                / max(base["iters_B"], 1), 3)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
