"""Tutorial 3: gravity segregation in a closed column.

Counterpart of /root/reference/tutorials/sim_tutorial3.cpp (gravity column):
heavy water sinks below light oil with no viscous drive.

    python examples/tutorial3_gravity_column.py
"""
import jax.numpy as jnp
import numpy as np

from opm_tpu.grid import cartesian_grid
from opm_tpu.models.twophase import TwophaseModel
from opm_tpu.props.incomp import IncompProps

DAY = 86400.0

g = cartesian_grid((1, 1, 40), (1.0, 1.0, 40.0), perm=1e-12, poro=0.3)
props = IncompProps(viscosity=(1e-3, 1e-3), density=(1000.0, 700.0),
                    exponent=2.0)
model = TwophaseModel(g, props, gravity_on=True)
sw = jnp.full(g.nc, 0.5)
flux = jnp.zeros(g.nf)
src = np.zeros(g.nc)
for step in range(40):
    sw, iters, rn = model.transport_solve(sw, flux, src, 10 * DAY)
swn = np.asarray(sw)
for k in range(0, 40, 4):
    print(f"depth {g.depth[k]:5.1f} m  sw={swn[k]:.3f} "
          + "#" * int(swn[k] * 30))
print(f"conserved mean sw: {swn.mean():.6f} (started at 0.5)")
