"""End-to-end fully-implicit black-oil on SPE1 (the regression-test analogue
of /root/reference/compareECLFiles.cmake SPE1 cases). Without ECL reference
files, correctness is asserted through conservation (FIP balance vs injected/
produced volumes), control targets, equilibration values, and the qualitative
SPE1 solution features (published in Odeh 1981)."""
import os

import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case
from opm_tpu.sim.blackoil import (SimulatorFullyImplicitBlackoil,
                                  fluid_in_place)
from opm_tpu.sim.init import initial_state

SPE1 = os.path.join(os.path.dirname(__file__), "..", "data", "SPE1CASE2.DATA")
PSI = 6894.757293168361
DAY = 86400.0


@pytest.fixture(scope="module")
def sim_short():
    case = load_case(SPE1)
    sim = SimulatorFullyImplicitBlackoil(case)
    state0 = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    fip0 = fluid_in_place(sim.model, state0)
    state = sim.run(report_step_limit=6)
    return sim, state, fip0


def test_equilibration():
    case = load_case(SPE1)
    sim = SimulatorFullyImplicitBlackoil(case)
    st = initial_state(sim.grid, sim.props, case, 2)
    p = np.asarray(st.pressure) / PSI
    # datum 4800 psia at 8400 ft = bottom-layer centre; column within ~25 psi
    assert abs(p.max() - 4800.0) < 1.0
    assert 4770 < p.min() < 4800
    assert np.allclose(np.asarray(st.sw), 0.12)
    assert np.all(np.asarray(st.hcstate) == 1)  # undersaturated oil
    rs = np.asarray(st.x)
    assert np.allclose(rs, 1.27 * 28.316846592 / 0.158987294928, rtol=1e-6)


def test_rates_on_target(sim_short):
    sim, state, _ = sim_short
    r = sim.summary.rows[-1]
    # producer holds 20000 stb/d ORAT; injector 100000 Mscf/d
    assert r["FOPR"] * DAY / 0.158987294928 == pytest.approx(20000, rel=1e-6)
    assert r["FGIR"] * DAY / 28.316846592 == pytest.approx(100000, rel=1e-4)


def test_mass_conservation(sim_short):
    """Surface-volume balance: FIP(t) - FIP(0) = integrated well sources."""
    sim, state, fip0 = sim_short
    fip1 = fluid_in_place(sim.model, state)
    # integrate rates over report steps (rates are per-step snapshots of the
    # converged end state; steps are converged to tol_mb=1e-5 each substep)
    rows = sim.summary.rows
    times = [0.0] + [r["time"] * DAY for r in rows]
    inj = np.zeros(3)
    prod = np.zeros(3)
    for i, r in enumerate(rows):
        dt = times[i + 1] - times[i]
        inj += dt * np.array([r["FWIR"], r["FOIR"], r["FGIR"]])
        prod += dt * np.array([r["FWPR"], r["FOPR"], r["FGPR"]])
    # tolerance: MB tolerance accumulates per substep; stay generous
    dfip = fip1 - fip0
    net = inj - prod
    for ph in range(3):
        scale = max(abs(fip0[ph]), abs(net[ph]), 1.0)
        assert abs(dfip[ph] - net[ph]) / scale < 5e-3, (ph, dfip, net)


def test_pressure_rises_under_injection(sim_short):
    sim, state, _ = sim_short
    fpr = sim.summary.series("FPR") / PSI
    assert fpr[-1] > 4850  # net voidage negative -> pressure builds


def test_producer_gor_near_rs(sim_short):
    sim, state, _ = sim_short
    gor = sim.summary.rows[-1]["FGOR"] * 0.158987294928 / 28.316846592
    # before breakthrough: GOR ~ rs(p_cell) in Mscf/stb, near 1.27
    assert 1.0 < gor < 1.5


@pytest.fixture(scope="module")
def sim_full():
    case = load_case(SPE1)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run()
    return sim, state


@pytest.mark.slow
def test_spe1_full_run(sim_full):
    sim, state = sim_full
    assert sim.report.failed_substeps == 0
    gor = sim.summary.series("FGOR") * 0.158987294928 / 28.316846592
    fpr = sim.summary.series("FPR") / PSI
    bhp = sim.summary.series("WBHP:PROD") / PSI
    # Odeh-published qualitative features:
    assert fpr.max() > 6500 and fpr.max() < 7500   # pressure peak yr ~3
    assert gor[-1] > 10.0                           # strong gas breakthrough
    assert abs(bhp[-1] / 1000.0 - 1.0) < 1e-3       # ends on BHP limit
    fopr = sim.summary.series("FOPR") * DAY / 0.158987294928
    assert fopr[0] == pytest.approx(20000, rel=1e-6)
    # late-time decline on the BHP limit; published year-10 rates vary by
    # simulator (~5-7 Mstb/d), and the WellDensitySegmented parity fix
    # (deeper-connection segment density) sits near 5.7
    assert fopr[-1] < 8000


@pytest.mark.slow
def test_spe1_published_anchors(sim_full):
    """Quantitative anchors against the PUBLISHED SPE1 solution (Odeh
    1981, 'Comparison of Solutions to a Three-Dimensional Black-Oil
    Reservoir Simulation Problem', JPT 33(1):13-25; the role of the
    reference's compareECLFiles.cmake:83-118 regression tolerances,
    which need opm-tests data files that do not exist here).

    Two anchor tiers:
    * PUBLISHED BANDS — digitized from Odeh's comparison figures (seven
      participating simulators; the band is the participants' spread):
      initial producing GOR = the solution GOR 1.27 Mscf/stb (problem
      spec, Table 1); average-pressure peak magnitude ~6.6-7.5 kpsi in
      years 2.5-5 (Fig. 2); gas breakthrough (GOR departing Rs) in
      years ~1.5-4 (Fig. 4); producer reaching the 1000 psi BHP limit
      in years ~3-5; year-10 oil rate 3-8 Mstb/d (Fig. 3 spread).
    * REGRESSION PINS — this framework's converged full-run trajectory
      (verified inside the published bands), pinned at 3% so a physics
      drift that stays conservative still fails: FPR peak 7131 psi at
      day 1307; FOPR(3652 d) = 5725 stb/d; GOR(3652 d) = 22.28
      Mscf/stb (cf. OPM flow's published SPE1CASE2 late-time GOR of
      the same magnitude)."""
    sim, state = sim_full
    t = sim.summary.series("time")
    gor = sim.summary.series("FGOR") * 0.158987294928 / 28.316846592
    fpr = sim.summary.series("FPR") / PSI
    fopr = sim.summary.series("FOPR") * DAY / 0.158987294928
    bhp = sim.summary.series("WBHP:PROD") / PSI

    # --- published bands (Odeh 1981) ---
    assert gor[0] == pytest.approx(1.27, rel=0.05)        # spec Rs
    i_pk = int(np.argmax(fpr))
    assert 6600 < fpr[i_pk] < 7500                         # Fig. 2 peak
    assert 900 < t[i_pk] < 1830                            # peak timing
    ib = int(np.argmax(gor > 1.05 * gor[0]))               # breakthrough
    assert 550 < t[ib] < 1500                              # Fig. 4
    i_bhp = int(np.argmax(np.abs(bhp / 1000.0 - 1.0) < 1e-3))
    assert 1100 < t[i_bhp] < 1830                          # hits BHP limit
    assert 3000 < fopr[-1] < 8000                          # Fig. 3 spread

    # --- regression pins (3%) ---
    assert fpr[i_pk] == pytest.approx(7131.0, rel=0.03)
    assert t[i_pk] == pytest.approx(1307.0, rel=0.10)
    assert fopr[-1] == pytest.approx(5725.0, rel=0.03)
    assert gor[-1] == pytest.approx(22.28, rel=0.03)


def test_fip_per_region():
    """fluid_in_place with FIPNUM regions partitions the field totals
    exactly (computeFluidInPlace per-region report)."""
    import numpy as np

    from opm_tpu.io.eclstate import load_case
    from opm_tpu.sim.blackoil import (SimulatorFullyImplicitBlackoil,
                                      fluid_in_place)
    from opm_tpu.sim.init import initial_state

    case = load_case(SPE1)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    total = fluid_in_place(sim.model, state)
    # synthetic 2-region split (SPE1 has a single FIPNUM region)
    regions = np.zeros(sim.model.nc, dtype=np.int32)
    regions[sim.model.nc // 2:] = 1
    per_reg = fluid_in_place(sim.model, state, regions=regions)
    assert per_reg.shape == (2, 3)
    assert np.allclose(per_reg.sum(axis=0), total, rtol=1e-12)
    assert (per_reg > 0).all()


def test_thpres_defaulted_compute_max_dp():
    """Defaulted THPRES values are computed from the equilibrated initial
    state (computeMaxDp, thresholdPressures.hpp:47): the threshold equals
    the maximum initial pressure jump across the region interface."""
    import numpy as np

    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

    deck = """
RUNSPEC
TITLE
 THPRES-DEFAULT
DIMENS
 8 1 1 /
OIL
WATER
GAS
DISGAS
FIELD
EQLDIMS
 2 /
TABDIMS
 1 1 /
WELLDIMS
 1 1 1 1 /
GRID
DXV
 8*100 /
DYV
 100 /
DZV
 50 /
TOPS
 8*8300 /
PORO
 8*0.3 /
PERMX
 8*100 /
REGIONS
EQLNUM
 4*1 4*2 /
PROPS
PVTW
 4000 1.0 3.0E-6 0.5 0 /
ROCK
 4000 4.0E-6 /
SWOF
 0.12 0    1   0
 0.8  0.9  0.0 0 /
SGOF
 0    0    1   0
 0.85 0.9  0.0 0 /
DENSITY
 53.66 64.49 0.0533 /
PVDG
 14.7   166.666 0.008
 9014.7 0.386   0.0470 /
PVTO
 0.20 1014.7 1.20 0.90 /
 1.27 4014.7 1.695 0.51
      9014.7 1.579 0.74 /
/
SOLUTION
EQUIL
 8325 4000 8600 0 8200 0 1 0 0 /
 8325 4400 8600 0 8200 0 1 0 0 /
THPRES
 1 2 /
/
SUMMARY
FOPR
SCHEDULE
TSTEP
 1 /
END
"""
    case = load_case_string(deck)
    assert case.solution.thpres == [(1, 2, None)]
    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run(report_step_limit=0)
    thp = np.asarray(sim.model.threshold_dp)
    fc = sim.grid.face_cells
    eql = np.asarray(sim.grid.eqlnum)
    iface = eql[fc[:, 0]] != eql[fc[:, 1]]
    assert iface.sum() == 1
    p0 = np.asarray(state.pressure)
    dp_iface = abs(p0[fc[iface, 0]] - p0[fc[iface, 1]])[0]
    # regions differ by ~400 psi at the interface
    assert dp_iface > 1e6
    assert thp[iface][0] == pytest.approx(dp_iface, rel=1e-12)
    assert np.all(thp[~iface] == 0.0)
