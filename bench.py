#!/usr/bin/env python
"""Benchmark: SPE1 fully-implicit black-oil on the default JAX backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The upstream reference publishes no benchmark numbers (BASELINE.md), so the
baseline is this framework's round-1 CPU dense-path measurement of the same
run (96.5 s end-to-end for 120 report steps / 10 years of SPE1, recorded
2026-08-16). vs_baseline = baseline_wall / measured_wall (>1 is faster).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import opm_tpu  # noqa: F401  (x64 config)
from opm_tpu.io.eclstate import load_case
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

BASELINE_WALL_S = 96.5  # round-1 CPU dense-path reference (see docstring)
SPE1 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "data", "SPE1CASE2.DATA")


def main():
    case = load_case(SPE1)
    # warmup: compile all kernels on a copy (2 report steps)
    warm = SimulatorFullyImplicitBlackoil(case)
    warm.run(report_step_limit=2)

    sim = SimulatorFullyImplicitBlackoil(case)
    sim.solver = warm.solver  # reuse compiled kernels (same shapes)
    t0 = time.perf_counter()
    sim.run()
    wall = time.perf_counter() - t0
    newtons = max(sim.report.newton_iterations, 1)
    print(json.dumps({
        "metric": "spe1_e2e_wall",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_WALL_S / wall, 3),
        "newton_iterations": newtons,
        "ms_per_newton": round(1000.0 * wall / newtons, 2),
        "substeps": sim.report.substeps,
        "failed_substeps": sim.report.failed_substeps,
    }))


if __name__ == "__main__":
    main()
