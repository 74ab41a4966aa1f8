#!/usr/bin/env python
"""Time the setup phases (case load, grid/props build, initial_state) of a
case on the current default backend. Used to chase eager-fragment latency
through the TPU tunnel (EQUIL init measured ~2 min at 113k cells before the
CPU-pinned equilibration landed)."""
import sys
import time

sys.path.insert(0, ".")


def main():
    import opm_tpu  # noqa: F401
    import jax

    name = sys.argv[1] if len(sys.argv) > 1 else "norne"
    t0 = time.perf_counter()
    if name == "norne":
        from opm_tpu.sim.testcases import norne_like_case
        case = norne_like_case()
    elif name == "spe1":
        from opm_tpu.io.eclstate import load_case
        case = load_case("data/SPE1CASE2.DATA")
    elif name == "spe9":
        from opm_tpu.io.eclstate import load_case
        case = load_case("data/SPE9.DATA")
    else:
        raise SystemExit(f"unknown case {name}")
    t1 = time.perf_counter()
    print(f"[{jax.default_backend()}] load_case: {t1 - t0:.2f} s",
          flush=True)

    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    sim = SimulatorFullyImplicitBlackoil(case)
    t2 = time.perf_counter()
    print(f"simulator build (grid/props/model/solver): {t2 - t1:.2f} s",
          flush=True)

    from opm_tpu.sim.init import initial_state
    state = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    jax.block_until_ready(state.pressure)
    t3 = time.perf_counter()
    print(f"initial_state: {t3 - t2:.2f} s  (nc={sim.grid.nc})", flush=True)


if __name__ == "__main__":
    main()
