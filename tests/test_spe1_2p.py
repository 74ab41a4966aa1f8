"""SPE1 two-phase (water-oil) regression class — the reference's spe1_2p
case (compareECLFiles.cmake:93-98, FILENAME SPE1CASE2_2P run through
flow_legacy's fully-implicit path with only water+oil active; phase-subset
support in BlackoilModelBase/BlackoilPropsAdFromDeck). The deck is the
SPE1 waterflood variant in data/SPE1CASE2_2P.DATA: dead oil, water
injector replacing the gas injector. The gas phase rides through the
three-equation machinery inertly: sg must stay identically zero."""
import os

import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case
from opm_tpu.models.state import saturations
from opm_tpu.sim.blackoil import (SimulatorFullyImplicitBlackoil,
                                  fluid_in_place)
from opm_tpu.sim.init import initial_state

DECK = os.path.join(os.path.dirname(__file__), "..", "data",
                    "SPE1CASE2_2P.DATA")
PSI = 6894.757293168361
DAY = 86400.0
STB = 0.158987294928


@pytest.fixture(scope="module")
def sim_short():
    case = load_case(DECK)
    sim = SimulatorFullyImplicitBlackoil(case)
    state0 = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    fip0 = fluid_in_place(sim.model, state0)
    state = sim.run(report_step_limit=6)
    return sim, state, fip0


def test_deck_is_two_phase():
    case = load_case(DECK)
    assert set(case.runspec.phases) == {"WATER", "OIL"}
    assert not case.runspec.disgas and not case.runspec.vapoil
    assert "PVDG" not in case.tables and "SGOF" not in case.tables


def test_runs_and_gas_stays_zero(sim_short):
    sim, state, _ = sim_short
    assert sim.report.failed_substeps == 0
    sw, so, sg = (np.asarray(a) for a in saturations(state))
    assert np.max(np.abs(sg)) == 0.0
    assert np.all(sw + so <= 1.0 + 1e-12)
    # waterflood front advancing from the injector corner
    assert sw.max() > 0.3
    r = sim.summary.rows[-1]
    assert r.get("FGPR", 0.0) == pytest.approx(0.0, abs=1e-12)


def test_rates_on_target(sim_short):
    sim, state, _ = sim_short
    r = sim.summary.rows[-1]
    assert r["FOPR"] * DAY / STB == pytest.approx(10000, rel=1e-6)
    assert r["FWIR"] * DAY / STB == pytest.approx(10000, rel=1e-4)


def test_mass_conservation(sim_short):
    sim, state, fip0 = sim_short
    fip1 = fluid_in_place(sim.model, state)
    rows = sim.summary.rows
    times = [0.0] + [r["time"] * DAY for r in rows]
    inj = np.zeros(3)
    prod = np.zeros(3)
    for i, r in enumerate(rows):
        dt = times[i + 1] - times[i]
        inj += dt * np.array([r["FWIR"], r.get("FOIR", 0.0),
                              r.get("FGIR", 0.0)])
        prod += dt * np.array([r["FWPR"], r["FOPR"], r.get("FGPR", 0.0)])
    dfip = fip1 - fip0
    net = inj - prod
    for ph in range(3):
        scale = max(abs(fip0[ph]), abs(net[ph]), 1.0)
        assert abs(dfip[ph] - net[ph]) / scale < 5e-3, (ph, dfip, net)


def test_equilibration_two_phase():
    case = load_case(DECK)
    sim = SimulatorFullyImplicitBlackoil(case)
    st = initial_state(sim.grid, sim.props, case, 2)
    p = np.asarray(st.pressure) / PSI
    assert abs(p.max() - 4800.0) < 2.0
    sw, so, sg = (np.asarray(a) for a in saturations(st))
    assert np.max(np.abs(sg)) == 0.0
    assert np.allclose(sw, 0.12)  # connate water above the WOC


@pytest.mark.slow
def test_spe1_2p_full_run():
    case = load_case(DECK)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run()
    assert sim.report.failed_substeps == 0
    sw, so, sg = (np.asarray(a) for a in saturations(state))
    assert np.max(np.abs(sg)) == 0.0
    # 10-year waterflood at 10k stb/d into ~530 MMbbl PV: the front is
    # well inside the field and the producer still holds its oil target
    assert sw.max() > 0.6
    r = sim.summary.rows[-1]
    assert r["FOPR"] * DAY / STB == pytest.approx(10000, rel=1e-3)
