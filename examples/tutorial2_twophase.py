"""Tutorial 2: incompressible two-phase waterflood (Buckley-Leverett).

Counterpart of /root/reference/tutorials/sim_tutorial2.cpp: TPFA pressure +
implicit transport on a 1-D strip, printing the saturation profile.

    python examples/tutorial2_twophase.py
"""
import numpy as np

from opm_tpu.grid import cartesian_grid
from opm_tpu.props.incomp import IncompProps
from opm_tpu.sim.twophase import SimulatorIncompTwophase

DAY = 86400.0

g = cartesian_grid((50, 1, 1), (100.0, 1.0, 1.0), perm=1e-13, poro=0.2)
props = IncompProps(viscosity=(1e-3, 2e-3), density=(1000.0, 850.0),
                    exponent=2.0)
src = np.zeros(g.nc)
q = g.pore_volume.sum() / (200 * DAY)   # one pore volume in 200 days
src[0] = q
src[-1] = -q
sim = SimulatorIncompTwophase(g, props, src, gravity_on=False)
state, rep = sim.run(np.zeros(g.nc), dt=4 * DAY, num_steps=20)
sw = np.asarray(state.sw)
bars = "".join("#" if s > 0.5 else ("+" if s > 0.1 else ".") for s in sw)
print("water saturation after 0.4 PVI:")
print(bars)
print(f"front cell: {np.argmax(sw < 0.05)}, "
      f"water produced: {sum(rep.water_prod) * 4 * DAY:.2f} m3")
