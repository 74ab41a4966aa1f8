"""First-broken-constraint well switching (VERDICT r3 #5) and the VFP
hydrostatic datum correction (#6).

Reference semantics: updateWellControls walks ALL of a well's constraints
and switches to the first broken one — THP limits and secondary rate
limits included (StandardWells_impl.hpp:712-790); THP targets convert to
BHP through the VFP tables with the hydrostatic datum correction
(:884-960, computeHydrostaticCorrection :918-960)."""

import numpy as np
import pytest

import jax.numpy as jnp

from opm_tpu.io.eclstate import load_case_string
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
from opm_tpu.wells import standard as stdwells
from opm_tpu.wells.wells import (CTRL_BHP, CTRL_GRAT, CTRL_ORAT,
                                 CTRL_SURFACE_RATE, CTRL_THP, CTRL_WRAT)

DAY = 86400.0
STB = 0.158987294928
MSCF = 28.316846592
PSI = 6894.757293168361


def _wd(nw=1, **over):
    """Minimal synthetic well-device dict for update_controls units."""
    wd = dict(
        is_injector=jnp.zeros(nw, dtype=bool),
        primary_control=jnp.full(nw, CTRL_ORAT, dtype=jnp.int32),
        primary_target=jnp.full(nw, 10.0),
        bhp_limit=jnp.full(nw, 1.0e6),
        comp_frac=jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (nw, 1)),
        open=jnp.ones(nw),
        rate_targets=jnp.full((nw, 5), jnp.nan),
        thp_limit=jnp.full(nw, jnp.nan),
        inj_rate_target=jnp.full(nw, jnp.nan),
        inj_resv_target=jnp.full(nw, jnp.nan),
        is_history=jnp.zeros(nw, dtype=bool),
    )
    wd.update(over)
    return wd


def test_secondary_wrat_limit_switches():
    """An ORAT producer whose water rate exceeds its WRAT limit moves to
    WRAT control with the WRAT target (the watered-out-producer class)."""
    rt = jnp.asarray([[10.0, 5.0, np.nan, np.nan, np.nan]])  # orat, wrat
    wd = _wd(rate_targets=rt)
    bhp = jnp.asarray([2.0e6])                   # above the 1e6 limit
    qs = jnp.asarray([[-9.0, -10.0, 0.0]])       # water 9 > ... wait cols
    # qs columns are (water, oil, gas); water rate 9 > wrat limit 5
    qs = jnp.asarray([[-9.0, -10.0, -2.0]])
    ctrl, tgt = stdwells.update_controls(
        wd, bhp, qs, jnp.asarray([CTRL_ORAT], dtype=jnp.int32),
        jnp.asarray([10.0]))
    assert int(ctrl[0]) == CTRL_WRAT
    assert float(tgt[0]) == pytest.approx(5.0)


def test_bhp_limit_has_priority():
    """When both the BHP limit and a rate limit are broken, the BHP limit
    (the hard physical backstop) wins."""
    rt = jnp.asarray([[10.0, 5.0, np.nan, np.nan, np.nan]])
    wd = _wd(rate_targets=rt)
    bhp = jnp.asarray([0.5e6])                   # below the 1e6 limit
    qs = jnp.asarray([[-9.0, -10.0, -2.0]])
    ctrl, tgt = stdwells.update_controls(
        wd, bhp, qs, jnp.asarray([CTRL_ORAT], dtype=jnp.int32),
        jnp.asarray([10.0]))
    assert int(ctrl[0]) == CTRL_BHP
    assert float(tgt[0]) == pytest.approx(1.0e6)


def test_back_switch_to_primary():
    """On BHP control with the primary ORAT target exceeded, the well
    returns to ORAT (the pre-existing primary<->BHP behavior preserved
    by the generalized first-broken walk)."""
    wd = _wd()
    ctrl, tgt = stdwells.update_controls(
        wd, jnp.asarray([2.0e6]), jnp.asarray([[0.0, -12.0, 0.0]]),
        jnp.asarray([CTRL_BHP], dtype=jnp.int32), jnp.asarray([1.0e6]))
    assert int(ctrl[0]) == CTRL_ORAT
    assert float(tgt[0]) == pytest.approx(10.0)


def test_injector_rate_limit_switches():
    """A BHP-control injector exceeding its surface rate limit moves to
    RATE control."""
    wd = _wd(is_injector=jnp.asarray([True]),
             primary_control=jnp.asarray([CTRL_BHP], dtype=jnp.int32),
             primary_target=jnp.asarray([3.0e7]),
             bhp_limit=jnp.asarray([5.0e7]),
             comp_frac=jnp.asarray([[1.0, 0.0, 0.0]]),
             inj_rate_target=jnp.asarray([4.0]))
    ctrl, tgt = stdwells.update_controls(
        wd, jnp.asarray([3.0e7]), jnp.asarray([[6.0, 0.0, 0.0]]),
        jnp.asarray([CTRL_BHP], dtype=jnp.int32), jnp.asarray([3.0e7]))
    assert int(ctrl[0]) == CTRL_SURFACE_RATE
    assert float(tgt[0]) == pytest.approx(4.0)


def test_history_rates_are_not_limits():
    """WCONHIST observed rates must NOT act as secondary limits — only
    the primary control target applies."""
    rt = jnp.asarray([[10.0, 5.0, np.nan, np.nan, np.nan]])
    wd = _wd(rate_targets=rt, is_history=jnp.asarray([True]))
    ctrl, _ = stdwells.update_controls(
        wd, jnp.asarray([2.0e6]), jnp.asarray([[-9.0, -8.0, 0.0]]),
        jnp.asarray([CTRL_ORAT], dtype=jnp.int32), jnp.asarray([10.0]))
    assert int(ctrl[0]) == CTRL_ORAT   # wrat 'limit' ignored


def test_thp_constraint_switch_and_back():
    """A producer that cannot sustain its THP limit (bhp below the
    VFP-implied BHP) switches to THP control; back on THP, a broken
    primary rate target switches back."""
    from opm_tpu.wells.vfp import VFPProdTable
    flo = np.array([0.0, 100.0])
    thp = np.array([1.0e6, 3.0e6])
    # bhp(thp, flo) = thp + 2e6 + 1e3*flo — monotone in both
    bhp_tab = (thp[:, None, None, None, None]
               + 2.0e6 + 1.0e3 * flo[None, None, None, None, :])
    bhp_tab = np.broadcast_to(bhp_tab, (2, 1, 1, 1, 2)).copy()
    tab = VFPProdTable(table_id=1, datum_depth=0.0, flo_type=1,
                       wfr_type=1, gfr_type=0,
                       flo=jnp.asarray(flo), thp=jnp.asarray(thp),
                       wfr=jnp.asarray([0.0]), gfr=jnp.asarray([0.0]),
                       alq=jnp.asarray([0.0]), bhp=jnp.asarray(bhp_tab))
    thp_lim = 2.0e6
    qs = jnp.asarray([[0.0, -10.0, 0.0]])        # liq flo = 10
    # VFP-implied bhp at the THP limit = 2e6 + 2e6 + 1e3*10 = 4.01e6
    wd = _wd(thp_limit=jnp.asarray([thp_lim]),
             bhp_limit=jnp.asarray([1.0e5]))
    wd["vfp"] = (tuple([tab]), jnp.asarray([0], dtype=jnp.int32),
                 jnp.zeros(1))
    ctrl, tgt = stdwells.update_controls(
        wd, jnp.asarray([3.0e6]), qs,
        jnp.asarray([CTRL_ORAT], dtype=jnp.int32), jnp.asarray([10.0]))
    assert int(ctrl[0]) == CTRL_THP
    assert float(tgt[0]) == pytest.approx(thp_lim)
    # operating above the VFP-implied bhp with the primary ORAT target
    # broken: back to ORAT
    ctrl2, tgt2 = stdwells.update_controls(
        wd, jnp.asarray([4.5e6]), jnp.asarray([[0.0, -12.0, 0.0]]),
        jnp.asarray([CTRL_THP], dtype=jnp.int32), jnp.asarray([thp_lim]))
    assert int(ctrl2[0]) == CTRL_ORAT
    assert float(tgt2[0]) == pytest.approx(10.0)


# ---------------------------------------------------------------------------
# end-to-end: deck-driven secondary-limit switching
# ---------------------------------------------------------------------------

_DECK_TMPL = """
RUNSPEC
DIMENS
 10 1 1 /
EQLDIMS
/
TABDIMS
/
OIL
GAS
WATER
DISGAS
FIELD
WELLDIMS
 2 1 2 2 /
GRID
DX
 10*500 /
DY
 10*500 /
DZ
 10*50 /
TOPS
 10*8325 /
PORO
 10*0.3 /
PERMX
 10*200 /
PERMY
 10*200 /
PERMZ
 10*200 /
PROPS
PVTW
 4014.7 1.029 3.13D-6 0.31 0 /
ROCK
 14.7 3D-6 /
SWOF
 0.12 0    1    0
 0.5  0.1  0.4  0
 1.0  0.5  0    0 /
SGOF
 0    0    1     0
 0.3  0.1  0.3   0
 0.88 0.8  0.0   0 /
DENSITY
 53.66 64.49 0.0533 /
PVDG
 14.7   166.666 0.008
 5014.7 0.48    0.0161 /
PVTO
 0.001  14.7   1.062  1.04 /
 0.0905 264.7  1.15   0.975 /
 0.18   514.7  1.207  0.91 /
 0.371  1014.7 1.295  0.83 /
 0.636  2014.7 1.435  0.695 /
 0.775  2514.7 1.5    0.641 /
 0.93   3014.7 1.565  0.594 /
 1.270  4014.7 1.695  0.51
        5014.7 1.671  0.549 /
 1.618  5014.7 1.827  0.449 /
/
SOLUTION
EQUIL
 8400 4800 8450 0 8300 0 1 0 0 /
SUMMARY
SCHEDULE
WELSPECS
 'P1' 'G' 10 1 8350 'OIL' /
 'I1' 'G' 1 1 8350 'WAT' /
/
COMPDAT
 'P1' 10 1 1 1 'OPEN' 1* 1* 0.5 /
 'I1' 1 1 1 1 'OPEN' 1* 1* 0.5 /
/
{schedule}
TSTEP
 {tsteps} /
END
"""


@pytest.mark.compile_heavy
def test_grat_limit_switch_e2e():
    """Deck-driven: an ORAT producer whose solution-gas rate exceeds its
    GRAT limit ends up on GRAT control with the gas rate pinned at the
    limit (the reference's secondary-limit switching, WCONPROD item 6)."""
    sched = """WCONPROD
 'P1' 'OPEN' 'ORAT' 2000 1* 1000 2* 100 /
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 2500 1* 9000 /
/"""
    case = load_case_string(_DECK_TMPL.format(schedule=sched,
                                              tsteps="5*10"))
    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run(report_step_limit=3)
    ip = sim.well_names.index("P1")
    ctrl = int(np.asarray(state.control)[ip])
    qs = np.asarray(state.qs)
    assert ctrl == CTRL_GRAT
    # gas rate pinned at 1000 Mscf/d
    qg = -qs[ip, 2] * DAY / MSCF
    assert qg == pytest.approx(1000.0, rel=1e-3)
    # oil rate BELOW the 2000 stb/d primary target (constraint governs)
    qo = -qs[ip, 1] * DAY / STB
    assert qo < 1900.0


@pytest.mark.compile_heavy
def test_watered_out_orat_trips_wrat_e2e():
    """Water breakthrough from the injector raises the producer's water
    rate past its WRAT limit; the well must switch to WRAT control with
    the water rate held at the limit."""
    sched = """WCONPROD
 'P1' 'OPEN' 'ORAT' 1500 700 3* 100 /
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 3000 1* 9000 /
/"""
    # small cells so the water front reaches the producer quickly
    deck = (_DECK_TMPL.format(schedule=sched, tsteps="30*10")
            .replace("10*500", "10*100").replace("10*50 /", "10*20 /"))
    case = load_case_string(deck)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run()
    ip = sim.well_names.index("P1")
    qs = np.asarray(state.qs)
    qw = -qs[ip, 0] * DAY / STB
    assert int(np.asarray(state.control)[ip]) == CTRL_WRAT
    assert qw == pytest.approx(700.0, rel=1e-3)


@pytest.mark.compile_heavy
def test_vfp_datum_correction_e2e():
    """A VFP table datum 100 m shallower than the well's BHP reference
    depth must shift the THP-controlled well's BHP by ~rho*g*100
    (computeHydrostaticCorrection, StandardWells_impl.hpp:918-960)."""
    ref_depth_ft = 8350.0
    dz_m = 100.0
    vfp = """VFPPROD
 1 {datum} 'LIQ' 'WCT' 'GOR' 'THP' ' ' 'FIELD' 'BHP' /
 10 5000 /
 100 1500 /
 0.0 1.0 /
 0.0 10.0 /
 0.0 /
 1 1 1 1  1300 1300 /
 1 2 1 1  1300 1300 /
 2 1 1 1  2700 2700 /
 2 2 1 1  2700 2700 /
 1 1 2 1  1300 1300 /
 1 2 2 1  1300 1300 /
 2 1 2 1  2700 2700 /
 2 2 2 1  2700 2700 /
/
WCONPROD
 'P1' 'OPEN' 'THP' 5* 100 500 1 /
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 1000 1* 9000 /
/"""

    def run(datum_ft):
        sched = vfp.format(datum=datum_ft)
        case = load_case_string(_DECK_TMPL.format(schedule=sched,
                                                  tsteps="3*10"))
        sim = SimulatorFullyImplicitBlackoil(case)
        state = sim.run()
        ip = sim.well_names.index("P1")
        return float(np.asarray(state.bhp)[ip])

    bhp_same = run(ref_depth_ft)                     # datum at ref depth
    bhp_off = run(ref_depth_ft - dz_m / 0.3048)      # datum 100 m above
    # dp_corr = rho_wellbore*g*(ref - datum) > 0 -> higher BHP. The
    # wellbore mixture density ranges from ~200 kg/m3 (gas-dominated
    # flowing mixture) to ~850 (pre-flow oil fallback) depending on when
    # the explicit density snapshot is taken — assert the correction is
    # applied with the right sign and magnitude (it was identically ZERO
    # before the datum plumbing, VERDICT r3 #4)
    shift = bhp_off - bhp_same
    assert 1.0e5 < shift < 1.2e6, shift
