"""sim_simple: minimal automatic-differentiation + flow demo.

Counterpart of /root/reference/examples/sim_simple.cpp (a toy showing the
AutoDiffBlock machinery on a small single-phase pressure system). Here the
same idea in the framework's native idiom: the residual is a plain
function over cell arrays; `jax.jacfwd` of it IS the Jacobian the sparse
AD machinery was built to provide — then one Newton step reproduces the
linear pressure solve.

    python examples/sim_simple.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import opm_tpu  # noqa: E402,F401
from opm_tpu.grid import cartesian_grid  # noqa: E402


def main():
    g = cartesian_grid((20, 1, 1), (100.0, 1.0, 1.0), perm=1e-13)
    fc = jnp.asarray(g.face_cells)
    trans = jnp.asarray(g.trans)
    mob = 1.0 / 1e-3                      # single-phase water mobility
    src = np.zeros(g.nc)
    src[0], src[-1] = 1e-5, -1e-5
    src = jnp.asarray(src)

    def residual(p):
        """- div(lam T grad p) - q, with a pressure pin on cell 0."""
        flux = trans * mob * (p[fc[:, 0]] - p[fc[:, 1]])
        r = jnp.zeros(g.nc).at[fc[:, 0]].add(flux).at[fc[:, 1]].add(-flux)
        r = r - src
        return r.at[0].add(1e-6 * (p[0] - 1.0e7))

    p0 = jnp.full(g.nc, 1.0e7)
    J = jax.jacfwd(residual)(p0)          # the AutoDiffBlock role
    p = p0 - jnp.linalg.solve(J, residual(p0))
    r = np.abs(np.asarray(residual(p)))
    dp = np.diff(np.asarray(p))
    print(f"pressure drop/cell: {dp[0]:.6g} Pa (uniform: "
          f"{np.allclose(dp, dp[0])})")
    print(f"max |residual| after one Newton step: {r.max():.3e}")
    assert np.allclose(dp, dp[0]) and r.max() < 1e-12
    print("OK")


if __name__ == "__main__":
    main()
