"""compute_tof: flow-diagnostics CLI.

Counterpart of examples/compute_tof_from_files.cpp: computes a pressure/flux
field on the deck's grid, then forward/backward time-of-flight, tracer
partitions, the F-Phi curve, Lorenz coefficient and sweep efficiency
(/root/reference/opm/core/flowdiagnostics/).

    python -m opm_tpu.tools.compute_tof CASE.DATA [--out tof.npz]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="compute_tof", description=__doc__)
    ap.add_argument("deck")
    ap.add_argument("--dg", action="store_true", help="also run degree-1 DG TOF (TofDiscGalReorder)")
    ap.add_argument("--dg2", action="store_true", help="also run degree-2 DG TOF")
    ap.add_argument("--dg-degree", type=int, default=None, metavar="D",
                    help="run DG TOF at degree D (0-2, the reference's "
                    "TofDiscGalReorder degree parameter)")
    ap.add_argument("--limiter", choices=("face", "average"), default=None,
                    help="DG(1) slope limiter (MinUpwindFace/"
                    "MinUpwindAverage)")
    ap.add_argument("--limiter-usage",
                    choices=("during", "post", "simultaneous"),
                    default="post",
                    help="limiter usage (DuringComputations/AsPostProcess/"
                    "AsSimultaneousPostProcess)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from opm_tpu.diagnostics.fphi import (compute_f_phi, compute_lorenz,
                                          compute_sweep)
    from opm_tpu.diagnostics.tof import (solve_tof, solve_tof_dg1,
                                         solve_tof_dg2, solve_tof_tracer)
    from opm_tpu.io.eclstate import load_case
    from opm_tpu.models.blackoil import make_well_device_arrays
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.wells import standard as stdwells

    case = load_case(args.deck)
    sim = SimulatorFullyImplicitBlackoil(case)
    # one converged step to get a physical flux field
    state = sim.run(report_step_limit=1)
    model = sim.model
    q = model.cell_quantities(state)
    flux = np.asarray(model.face_fluxes(q)).sum(axis=0)  # total surface flux

    # well source terms as cell sources
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[0]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    cdp = stdwells.connection_pressure_offsets(
        wd, model.well_cell_quantities(q), state.qs)
    cq = np.asarray(stdwells.perforation_fluxes(
        wd, model.well_cell_quantities(q), state.bhp, state.qs, cdp))
    src = np.zeros(model.nc)
    np.add.at(src, np.asarray(ws.perf_cell).ravel(),
              cq.sum(axis=2).ravel())

    g = sim.grid
    ftof = np.asarray(solve_tof(g.face_cells, flux, g.pore_volume, src))
    btof = np.asarray(solve_tof(g.face_cells, -flux, g.pore_volume, -src))
    inj_heads = [np.asarray(ws.perf_cell[i][ws.perf_mask[i]])
                 for i in range(ws.nw) if ws.is_injector[i]]
    tracer = None
    if inj_heads:
        _, tracer = solve_tof_tracer(g.face_cells, flux, g.pore_volume, src,
                                     inj_heads)
        tracer = np.asarray(tracer)
    if args.dg_degree is not None and getattr(g, "structured", False):
        from opm_tpu.diagnostics.tof import solve_tof_dg
        res = solve_tof_dg(g, flux, src, degree=args.dg_degree,
                           limiter=args.limiter,
                           limiter_usage=args.limiter_usage,
                           face_cells=g.face_cells,
                           tracer_heads=inj_heads or None)
        a_d = np.asarray(res[0] if inj_heads else res)
        print(f"DG({args.dg_degree}) forward TOF [days]: "
              f"min {a_d[:, 0].min() / 86400.0:.2f}  "
              f"median {np.median(a_d[:, 0]) / 86400.0:.2f}  "
              f"max {a_d[:, 0].max() / 86400.0:.2f}")
        if inj_heads:
            tr_d = np.asarray(res[1])
            for t in range(tr_d.shape[0]):
                m = tr_d[t, :, 0]
                print(f"DG({args.dg_degree}) tracer {t}: mean partition "
                      f"{m.mean():.4f}  swept cells (>0.5) "
                      f"{int((m > 0.5).sum())}")
    if getattr(args, "dg", False) and getattr(g, "structured", False):
        a_dg = np.asarray(solve_tof_dg1(g, flux, src))
        if args.limiter:
            from opm_tpu.diagnostics.tof import dg1_limit_min_upwind
            a_dg = np.asarray(dg1_limit_min_upwind(g, flux, a_dg,
                                                   method=args.limiter))
        print(f"DG(1) forward TOF [days]: min {a_dg[:, 0].min() / 86400.0:.2f}  "
              f"median {np.median(a_dg[:, 0]) / 86400.0:.2f}  "
              f"max {a_dg[:, 0].max() / 86400.0:.2f}")
    if getattr(args, "dg2", False) and getattr(g, "structured", False):
        a_dg2 = np.asarray(solve_tof_dg2(g, flux, src))
        print(f"DG(2) forward TOF [days]: min {a_dg2[:, 0].min() / 86400.0:.2f}  "
              f"median {np.median(a_dg2[:, 0]) / 86400.0:.2f}  "
              f"max {a_dg2[:, 0].max() / 86400.0:.2f}")
    F, phi = compute_f_phi(g.pore_volume, ftof, btof)
    lc = compute_lorenz(F, phi)
    Ev, tD = compute_sweep(F, phi)
    day = 86400.0
    print(f"forward TOF  [days]: min {ftof.min() / day:.2f}  "
          f"median {np.median(ftof) / day:.2f}  max {ftof.max() / day:.2f}")
    print(f"backward TOF [days]: min {btof.min() / day:.2f}  "
          f"median {np.median(btof) / day:.2f}  max {btof.max() / day:.2f}")
    print(f"Lorenz coefficient: {lc:.4f}")
    print(f"sweep efficiency at tD=1: "
          f"{np.interp(1.0, tD[np.argsort(tD)], Ev[np.argsort(tD)]):.4f}")
    if args.out:
        np.savez(args.out, ftof=ftof, btof=btof, F=F, phi=phi, lorenz=lc,
                 tracer=tracer if tracer is not None else np.zeros(0))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
