"""compute_initial_state: equilibration-initialization CLI.

Counterpart of examples/compute_initial_state.cpp (/root/reference/examples/
compute_initial_state.cpp:60-173): parse a deck, compute the EQUIL
hydrostatic initial state (pressure, saturations, rs/rv), and write each
field to a text file in the output directory.

    python -m opm_tpu.tools.compute_initial_state CASE.DATA \
        [--output-dir out] [--cpu]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _output(outdir, name, data):
    path = os.path.join(outdir, name + ".txt")
    np.savetxt(path, np.asarray(data))
    print(f"wrote {path}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="compute_initial_state",
                                 description=__doc__)
    ap.add_argument("deck")
    ap.add_argument("--output-dir", default="output")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from opm_tpu.grid import build_grid
    from opm_tpu.io.eclstate import load_case
    from opm_tpu.models.state import rs_rv, saturations
    from opm_tpu.props.blackoil import BlackoilProps
    from opm_tpu.sim.init import initial_state

    case = load_case(args.deck)
    grid = build_grid(case)
    props = BlackoilProps.from_case(case)
    state = initial_state(grid, props, case, nw=0)
    os.makedirs(args.output_dir, exist_ok=True)
    p = np.asarray(state.pressure)
    sw, so, sg = saturations(state)
    pvtnum = (np.zeros(grid.nc, dtype=np.int32) if grid.pvtnum is None
              else np.asarray(grid.pvtnum))
    rs, rv = rs_rv(state, props, pvtnum)
    _output(args.output_dir, "pressure", p)
    _output(args.output_dir, "swat", np.asarray(sw))
    _output(args.output_dir, "soil", np.asarray(so))
    _output(args.output_dir, "sgas", np.asarray(sg))
    _output(args.output_dir, "rs", np.asarray(rs))
    _output(args.output_dir, "rv", np.asarray(rv))
    print(f"nc={grid.nc}  p range [{p.min():.6g}, {p.max():.6g}] Pa")
    return state


if __name__ == "__main__":
    main()
