"""Tutorial 4: fully-implicit black-oil with wells (SPE1).

Counterpart of /root/reference/tutorials/sim_tutorial4.cpp (wells) +
examples/flow_legacy.cpp: run two years of SPE1 and plot the field response.

    python examples/tutorial4_blackoil_wells.py
"""
import os

import numpy as np

from opm_tpu.io.eclstate import load_case
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

SPE1 = os.path.join(os.path.dirname(__file__), "..", "data",
                    "SPE1CASE2.DATA")
PSI = 6894.757293168361
DAY = 86400.0
STB = 0.158987294928

case = load_case(SPE1)
sim = SimulatorFullyImplicitBlackoil(case)
state = sim.run(report_step_limit=24, verbose=False)

print(" t [d]   FPR [psi]   FOPR [stb/d]   GOR [Mscf/stb]   BHP_PROD [psi]")
for r in sim.summary.rows[::3]:
    print(f"{r['time']:6.0f}  {r['FPR'] / PSI:9.1f}  "
          f"{r['FOPR'] * DAY / STB:12.1f}  "
          f"{r['FGOR'] * STB / 28.316846592:13.3f}  "
          f"{r['WBHP:PROD'] / PSI:13.1f}")
print(f"\n{sim.report.newton_iterations} Newton iterations, "
      f"{sim.report.substeps} substeps, "
      f"{sim.report.failed_substeps} failures")
