"""find_zero: batched bracketed root-finding demo.

Counterpart of /root/reference/examples/find_zero.cpp (RegulaFalsi demo on
a cubic). The TPU-native twist: one call solves a whole ARRAY of
independent problems — the pattern the reordering transport solvers use to
solve every cell of a wavefront level at once.

    python examples/find_zero.py
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
from opm_tpu.utils.rootfinders import bisection, regula_falsi  # noqa: E402


def main():
    # the reference demo's cubic f(x) = x^3 - x - 2 (root ~1.52138)
    def f(x):
        return x ** 3 - x - 2.0

    x = regula_falsi(f, jnp.asarray(1.0), jnp.asarray(2.0))
    print(f"cubic root (regula falsi): {float(x):.10f}")

    # batched: 1000 shifted problems solved in one vectorized call
    shifts = jnp.linspace(0.0, 5.0, 1000)

    def g(x):
        return x ** 3 - x - 2.0 - shifts

    lo = jnp.zeros_like(shifts) + 1.0
    hi = jnp.zeros_like(shifts) + 3.0
    roots = bisection(g, lo, hi)
    resid = np.abs(np.asarray(g(roots)))
    print(f"batched: {shifts.shape[0]} roots, max |f(root)| = "
          f"{resid.max():.3e}")
    assert resid.max() < 1e-9
    print("OK")


if __name__ == "__main__":
    main()
