"""Sequential-implicit black-oil vs fully-implicit on SPE1 (flow_sequential
regression analogue). SPE1's 100 MMscf/d gas injection is a stiff test for
operator splitting: the plain pressure/transport split carries O(dt)
splitting error (the reference accepts this too — its sequential regression
compares against a sequential reference, compareECLFiles.cmake:96-104);
iterating to full implicitness must recover the fully-implicit solution."""
import os

import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case
from opm_tpu.models.sequential import SequentialParams
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
from opm_tpu.sim.sequential import SimulatorSequentialBlackoil

SPE1 = os.path.join(os.path.dirname(__file__), "..", "data", "SPE1CASE2.DATA")


@pytest.fixture(scope="module")
def fi_state():
    case = load_case(SPE1)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run(report_step_limit=2)
    sim1 = SimulatorFullyImplicitBlackoil(case)
    state1 = sim1.run(report_step_limit=1)
    return case, state, state1


@pytest.mark.compile_heavy
def test_sequential_split(fi_state):
    case, state_f, _ = fi_state
    sim_s = SimulatorSequentialBlackoil(case)
    state_s = sim_s.run(report_step_limit=2)
    p_s = np.asarray(state_s.pressure)
    p_f = np.asarray(state_f.pressure)
    # splitting error bound (no outer iterations)
    assert np.abs(p_s - p_f).max() / p_f.mean() < 0.12
    assert np.abs(np.asarray(state_s.sw) - np.asarray(state_f.sw)).max() \
        < 0.01
    r = sim_s.summary.rows[-1]
    assert r["FOPR"] * 86400 / 0.158987294928 == pytest.approx(20000,
                                                               rel=1e-4)
    assert r["FGIR"] * 86400 / 28.316846592 == pytest.approx(100000,
                                                             rel=1e-3)


@pytest.mark.compile_heavy
def test_sequential_outer_single_step(fi_state):
    """One 2-day step: outer iteration must cut the splitting error well
    below the plain split's."""
    import jax.numpy as jnp

    from opm_tpu.models.blackoil import make_well_device_arrays
    from opm_tpu.models.sequential import BlackoilSequentialModel
    from opm_tpu.sim.init import initial_state
    from opm_tpu.solver.newton import NonlinearSolver, SolverReport

    case, _, _ = fi_state
    sim = SimulatorFullyImplicitBlackoil(case)
    state0 = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[0]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    state0 = sim._init_well_state(state0, ws, True)
    dt = 2 * 86400.0

    state_fi, _ = NonlinearSolver(sim.model).step(state0, dt, wd,
                                                  SolverReport())
    p_fi = np.asarray(state_fi.pressure)

    errs = {}
    for outer in (False, True):
        seq = BlackoilSequentialModel(
            sim.model, SequentialParams(iterate_to_fully_implicit=outer,
                                        max_outer_iter=6))
        st, info = seq.step(state0, dt, wd)
        errs[outer] = np.abs(np.asarray(st.pressure) - p_fi).max() / \
            p_fi.mean()
    assert errs[True] < 0.5 * errs[False] or errs[True] < 1e-5, errs
    assert errs[True] < 5e-3, errs


@pytest.mark.slow
def test_sequential_full_spe1_schedule():
    """Full 120-step SPE1 through the sequential-implicit driver: the
    gas-breakthrough regime (day ~700) must not stall the pressure stage
    (backtracking + fully-implicit fallback)."""
    from opm_tpu.io.eclstate import load_case

    sim = SimulatorSequentialBlackoil(load_case("data/SPE1CASE2.DATA"))
    state = sim.run()
    assert sim.report.failed_substeps == 0
    assert sim.report.substeps >= 120
    qs = np.asarray(state.qs)
    assert np.isfinite(np.asarray(state.pressure)).all()


@pytest.mark.slow
def test_reorder_full_spe1_schedule():
    """Same soak through the reordering-transport variant."""
    from opm_tpu.io.eclstate import load_case
    from opm_tpu.models.sequential import SequentialParams

    sim = SimulatorSequentialBlackoil(
        load_case("data/SPE1CASE2.DATA"),
        seq_params=SequentialParams(transport="reorder"))
    state = sim.run()
    assert sim.report.failed_substeps == 0
    assert np.isfinite(np.asarray(state.pressure)).all()
