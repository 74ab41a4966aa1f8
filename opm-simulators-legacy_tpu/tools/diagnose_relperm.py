"""diagnose_relperm: saturation-function sanity checks on a deck.

Counterpart of examples/diagnose_relperm.cpp (the RelpermDiagnostics run in
FlowMain.hpp:751-761): reports table endpoints, monotonicity violations, and
the connate/critical saturations per SATNUM region.

    python -m opm_tpu.tools.diagnose_relperm CASE.DATA
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="diagnose_relperm",
                                 description=__doc__)
    ap.add_argument("deck")
    args = ap.parse_args(argv)

    from opm_tpu.io.eclstate import load_case

    case = load_case(args.deck)
    issues = 0
    for name in ("SWOF", "SGOF"):
        tables = case.tables.get(name)
        if not tables:
            continue
        for reg, tab in enumerate(tables):
            s = tab[:, 0]
            kr1 = tab[:, 1]
            kr2 = tab[:, 2]
            print(f"{name} region {reg + 1}: "
                  f"s in [{s[0]:.4f}, {s[-1]:.4f}], "
                  f"kr1 max {kr1.max():.4f}, kr2 max {kr2.max():.4f}")
            if not np.all(np.diff(s) > 0):
                print("  ERROR: saturation column not strictly increasing")
                issues += 1
            if not np.all(np.diff(kr1) >= 0):
                print("  ERROR: column 2 not monotone non-decreasing")
                issues += 1
            if not np.all(np.diff(kr2) <= 0):
                print("  ERROR: column 3 not monotone non-increasing")
                issues += 1
            if kr1[0] != 0.0:
                print("  WARNING: kr nonzero at lowest saturation")
            crit = s[np.nonzero(kr1 <= 0)[0][-1]] if np.any(kr1 <= 0) \
                else s[0]
            print(f"  connate/critical: {s[0]:.4f} / {crit:.4f}")
    if "SWOF" in case.tables and "SGOF" in case.tables:
        for reg, (swof, sgof) in enumerate(zip(case.tables["SWOF"],
                                               case.tables["SGOF"])):
            swco = swof[0, 0]
            sg_max = sgof[-1, 0]
            if sg_max > 1.0 - swco + 1e-12:
                print(f"  ERROR region {reg + 1}: max Sg {sg_max} exceeds "
                      f"1 - Swco = {1 - swco}")
                issues += 1
    print(f"{issues} issue(s) found")
    return 1 if issues else 0


if __name__ == "__main__":
    sys.exit(main())
