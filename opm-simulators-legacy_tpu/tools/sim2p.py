"""sim2p: the simple-simulator family CLI.

Counterpart of the reference's small simulator mains
(/root/reference/examples/sim_2p_incomp_ad.cpp, sim_2p_comp_reorder.cpp,
sim_poly2p_incomp_reorder.cpp, sim_poly2p_comp_reorder.cpp): set up a
cartesian grid + quarter-five-spot source pattern (or read grid/props from
a deck), run the chosen two-phase / compressible / polymer simulator, and
report the production history.

    python -m opm_tpu.tools.sim2p --mode incomp|comp|polymer|comp-polymer
        [--deck CASE.DATA] [--nx 20 --ny 20 --nz 1] [--pvi-days 200]
        [--dt-days 2] [--steps 25] [--gravity] [--poly-conc 2.0]
        [--out hist.npz] [--cpu]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sim2p", description=__doc__)
    ap.add_argument("--mode", choices=["incomp", "comp", "polymer",
                                       "comp-polymer"], default="incomp")
    ap.add_argument("--deck", default=None)
    ap.add_argument("--nx", type=int, default=20)
    ap.add_argument("--ny", type=int, default=20)
    ap.add_argument("--nz", type=int, default=1)
    ap.add_argument("--pvi-days", type=float, default=200.0,
                    help="days to inject one pore volume")
    ap.add_argument("--dt-days", type=float, default=2.0)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--gravity", action="store_true")
    ap.add_argument("--transport", choices=["implicit", "reorder"],
                    default="implicit",
                    help="incomp mode: implicit Newton (sim_2p_incomp_ad) "
                         "or reorder sweeps + gravity columns "
                         "(sim_2p_incomp)")
    ap.add_argument("--poly-conc", type=float, default=2.0)
    ap.add_argument("--poly-days", type=float, default=1e30,
                    help="polymer slug duration")
    ap.add_argument("--out", default=None)
    ap.add_argument("--output-dir", default=None,
                    help="per-step vtk/matlab dump directory")
    ap.add_argument("--vtk", action="store_true")
    ap.add_argument("--matlab", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from opm_tpu.grid import build_grid, cartesian_grid
    from opm_tpu.props.comp_twophase import CompTwophaseProps
    from opm_tpu.props.incomp import IncompProps
    from opm_tpu.props.polymer import PolymerProperties

    DAY = 86400.0
    if args.deck:
        from opm_tpu.io.eclstate import load_case
        case = load_case(args.deck)
        g = build_grid(case)
        iprops = IncompProps.from_case(case)
        cprops = CompTwophaseProps.from_case(case)
        poly = (PolymerProperties.from_case(case)
                if "polymer" in args.mode else None)
    else:
        g = cartesian_grid((args.nx, args.ny, args.nz),
                           (10.0 * args.nx, 10.0 * args.ny, 5.0 * args.nz),
                           perm=1e-13, poro=0.2)
        iprops = IncompProps(viscosity=(0.5e-3, 2e-3),
                             density=(1000.0, 850.0), exponent=2.0)
        cprops = CompTwophaseProps.analytic(c_w=4e-10, c_o=1.2e-9,
                                            mu=(0.5e-3, 2e-3),
                                            rho_s=(1000.0, 850.0),
                                            p_ref=2e7)
        poly = None
        if "polymer" in args.mode:
            visc = jnp.asarray([[0.0, 1.0], [1.0, 4.0], [5.0, 20.0]])
            ads = jnp.asarray([[0.0, 0.0], [5.0, 2e-5]])
            poly = PolymerProperties(c_max=5.0, mix_param=1.0,
                                     rock_density=2000.0,
                                     dead_pore_vol=0.05, res_factor=1.0,
                                     visc_table=visc, ads_table=ads)

    src = np.zeros(g.nc)
    q = g.pore_volume.sum() / (args.pvi_days * DAY)
    src[0] = q
    src[-1] = -q
    dt = args.dt_days * DAY
    hist: dict = {}

    if args.mode == "incomp":
        from opm_tpu.sim.twophase import SimulatorIncompTwophase
        sim = SimulatorIncompTwophase(g, iprops, src,
                                      gravity_on=args.gravity,
                                      transport=args.transport)
        state, rep = sim.run(np.zeros(g.nc), dt=dt, num_steps=args.steps,
                             output_dir=args.output_dir,
                             output_vtk=args.vtk,
                             output_matlab=args.matlab)
        hist = dict(times=rep.times, water_prod=rep.water_prod,
                    oil_prod=rep.oil_prod)
        last = dict(water_cut=rep.water_prod[-1]
                    / max(rep.water_prod[-1] + rep.oil_prod[-1], 1e-30))
    elif args.mode == "comp":
        from opm_tpu.sim.comp_twophase import SimulatorCompressibleTwophase
        sim = SimulatorCompressibleTwophase(g, cprops, src,
                                            gravity_on=args.gravity)
        st = sim.initial_state(np.full(g.nc, 2e7), np.zeros(g.nc))
        st, rep = sim.run(st, dt=dt, num_steps=args.steps,
                          output_dir=args.output_dir,
                          output_vtk=args.vtk, output_matlab=args.matlab)
        hist = dict(times=rep.times, water_prod=rep.water_prod_surface,
                    oil_prod=rep.oil_prod_surface,
                    avg_pressure=rep.avg_pressure)
        last = dict(avg_p_bar=rep.avg_pressure[-1] / 1e5)
    else:
        from opm_tpu.sim.polymer import (PolymerInflow,
                                         SimulatorCompressiblePolymer,
                                         SimulatorPolymer)
        inflow = PolymerInflow(0.0, args.poly_days * DAY, args.poly_conc)
        if args.mode == "polymer":
            sim = SimulatorPolymer(g, iprops, poly, src, inflow,
                                   gravity_on=args.gravity)
            state, rep = sim.run(np.zeros(g.nc), dt=dt,
                                 num_steps=args.steps,
                                 output_dir=args.output_dir,
                                 output_vtk=args.vtk,
                                 output_matlab=args.matlab)
        else:
            sim = SimulatorCompressiblePolymer(g, cprops, poly, src,
                                               inflow,
                                               gravity_on=args.gravity)
            st = sim.initial_state(np.full(g.nc, 2e7), np.zeros(g.nc))
            state, rep = sim.run(st, dt=dt, num_steps=args.steps,
                                  output_dir=args.output_dir,
                                  output_vtk=args.vtk,
                                  output_matlab=args.matlab)
        hist = dict(times=rep.times, water_prod=rep.water_prod)
        last = dict(injected_polymer=rep.injected_polymer,
                    produced_polymer=rep.produced_polymer)

    print(json.dumps(dict(mode=args.mode, cells=g.nc, steps=args.steps,
                          **{k: round(float(v), 6)
                             for k, v in last.items()})))
    if args.out:
        import numpy as _np

        _np.savez(args.out, **{k: _np.asarray(v) for k, v in hist.items()})
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
