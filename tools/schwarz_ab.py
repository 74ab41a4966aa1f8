"""A/B harness for the Schwarz-CPR pressure-stage coarse space.

Measures BiCGStab iteration counts on the channelized SPE10-like TPFA
pressure system (the dryrun_multichip large-leg field) for the global
StructuredGmg hierarchy vs SchwarzGmg coarse-space variants — the fast
proxy for the full-CPR inflation number the dryrun reports
(the reference keeps parallel preconditioning near serial iteration
counts: ISTLSolver.hpp:283-340, CPR AMG coarse solve).

Usage:
  python -m opm_tpu.tools.schwarz_ab [--nx 40 --ny 40 --nz 64] \
      [--set OPM_TPU_SCHWARZ_TILE=5 --set OPM_TPU_SCHWARZ_ZB=4 ...]
"""

from __future__ import annotations

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=40)
    ap.add_argument("--ny", type=int, default=40)
    ap.add_argument("--nz", type=int, default=64)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--set", action="append", default=[],
                    help="KNOB=VALUE env applied before SchwarzGmg build")
    ap.add_argument("--tol", type=float, default=1e-8)
    args = ap.parse_args()
    for kv in args.set:
        k, v = kv.split("=", 1)
        os.environ[k] = v

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    import opm_tpu  # noqa: F401
    from opm_tpu.grid import build_grid
    from opm_tpu.io.eclstate import EclipseCase  # noqa: F401
    from opm_tpu.linalg.gmg import StructuredGmg
    from opm_tpu.linalg.krylov import bicgstab
    from opm_tpu.parallel.schwarz import SchwarzGmg
    from opm_tpu.sim.testcases import spe10like_case

    dims = (args.nx, args.ny, args.nz)
    case = spe10like_case(nx=args.nx, ny=args.ny, nz=args.nz)
    g = build_grid(case)
    nf = g.nf_canonical
    tr = jnp.asarray(np.asarray(g.trans[:nf]))
    fc = np.asarray(g.face_cells[:nf])
    c1 = jnp.asarray(fc[:, 0])
    c2 = jnp.asarray(fc[:, 1])
    diag = jnp.zeros(g.nc).at[c1].add(tr).at[c2].add(tr) \
        + 1e-8 * jnp.max(tr)
    off = jnp.concatenate([-tr, -tr])

    @jax.jit
    def matvec(x):
        y = diag * x
        y = y.at[c1].add(-tr * x[c2])
        y = y.at[c2].add(-tr * x[c1])
        return y

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.normal(0, 1, g.nc))

    ref = StructuredGmg(dims, np.asarray(g.trans[:nf]))
    vals_ref = ref.coarsen_values(diag, off)
    r1 = bicgstab(matvec, b, precond=lambda r: ref.vcycle(vals_ref, r),
                  tol=args.tol, maxiter=400)
    it_ref = int(r1.iterations)
    print(f"global GMG: {it_ref} iters, converged={bool(r1.converged)}",
          flush=True)

    mesh = Mesh(jax.devices()[:args.devices], ("cells",))
    sch = SchwarzGmg(dims, mesh, "cells", np.asarray(g.trans[:nf]))
    vals = sch.coarsen_values(diag, off)
    r2 = bicgstab(matvec, b, precond=lambda r: sch.vcycle(vals, r),
                  tol=args.tol, maxiter=400)
    it = int(r2.iterations)
    knobs = {k: v for k, v in os.environ.items()
             if k.startswith("OPM_TPU_SCHWARZ")}
    print(f"schwarz {knobs}: {it} iters, converged={bool(r2.converged)}, "
          f"inflation {100.0 * (it - it_ref) / max(it_ref, 1):.0f}%",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
