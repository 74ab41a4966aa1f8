"""wells_example: build and inspect the well data structures from a deck.

Counterpart of /root/reference/examples/wells_example.cpp (constructs the
C `Wells` struct via WellsManager and prints it). Here: parse a deck,
build the padded WellSet arrays (the framework's `struct Wells` analogue:
perforation CSR -> padded [well, perf] arrays), and print controls,
targets and completion data.

    python examples/wells_example.py [CASE.DATA]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import opm_tpu  # noqa: E402,F401
from opm_tpu.grid import build_grid  # noqa: E402
from opm_tpu.io.eclstate import load_case  # noqa: E402
from opm_tpu.io.schedule import build_schedule  # noqa: E402
from opm_tpu.wells.wells import build_well_set  # noqa: E402

CTRL_NAMES = {0: "BHP", 1: "THP", 2: "RESERVOIR_RATE", 3: "SURFACE_RATE",
              4: "ORAT", 5: "WRAT", 6: "GRAT", 7: "LRAT", 8: "RESV"}


def main():
    deck = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "SPE1CASE2.DATA")
    case = load_case(deck)
    grid = build_grid(case)
    sched = build_schedule(case)
    print(f"{case.runspec.title or deck}: {len(sched.report_steps)} report "
          f"steps")
    step = sched.report_steps[0]
    ws = build_well_set(step.wells, grid)
    print(f"wells at step 0: {ws.nw} (max {ws.max_perf} perforations)")
    for i, name in enumerate(ws.names):
        kind = "INJ " if ws.is_injector[i] else "PROD"
        nperf = int(np.asarray(ws.perf_mask[i]).sum())
        ctrl = CTRL_NAMES.get(int(ws.control[i]), str(int(ws.control[i])))
        print(f"  {name:8s} {kind} ctrl={ctrl:14s} "
              f"target={float(ws.target[i]):.6g} "
              f"bhp_limit={float(ws.bhp_limit[i]):.6g} Pa  perfs={nperf}")
        cells = np.asarray(ws.perf_cell[i])[np.asarray(ws.perf_mask[i])]
        wi = np.asarray(ws.perf_wi[i])[np.asarray(ws.perf_mask[i])]
        for c, w in zip(cells, wi):
            i3, j3, k3 = grid.ijk(int(c))
            print(f"      perf cell ({int(i3) + 1},{int(j3) + 1},"
                  f"{int(k3) + 1})  WI={w:.4g}")
    print("OK")


if __name__ == "__main__":
    main()
