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


@pytest.mark.slow
def test_sequential_outer_matches_fully_implicit(fi_state):
    case, _, state_f = fi_state
    sim_s = SimulatorSequentialBlackoil(
        case, seq_params=SequentialParams(iterate_to_fully_implicit=True,
                                          max_outer_iter=4))
    state_s = sim_s.run(report_step_limit=1)
    p_s = np.asarray(state_s.pressure)
    p_f = np.asarray(state_f.pressure)
    assert np.abs(p_s - p_f).max() / p_f.mean() < 0.02
    assert np.abs(np.asarray(state_s.sw) - np.asarray(state_f.sw)).max() \
        < 0.005
