"""WCONHIST/WCONINJH history-mode wells: observed producer rates become a
RESV (reservoir voidage) target via the rate converter, BHP limit 1 atm
(reference: SimulatorBase_impl.hpp:557-605 history branch of computeRESV;
WellsManager WCONINJH -> plain surface-rate injector)."""
import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case_string
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

DAY = 86400.0
STB = 0.158987294928
MSCF = 28.316846592

DECK = """
RUNSPEC
DIMENS
 10 5 1 /
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
 50*500 /
DY
 50*500 /
DZ
 50*50 /
TOPS
 50*8325 /
PORO
 50*0.3 /
PERMX
 50*200 /
PERMY
 50*200 /
PERMZ
 50*200 /
PROPS
PVTW
 4014.7 1.029 3.13D-6 0.31 0 /
ROCK
 14.7 3D-6 /
SWOF
 0.12 0    1    0
 0.5  0.02 0.4  0
 1.0  0.3  0    0 /
SGOF
 0    0    1     0
 0.3  0.1  0.3   0
 0.88 0.8  0.0   0 /
DENSITY
 53.66 64.49 0.0533 /
PVDG
 14.7   166.666 0.008
 2014.7 1.614   0.0189
 9014.7 0.386   0.0470 /
PVTO
 0.20 1014.7 1.20 0.90 /
 0.60 2514.7 1.45 0.65 /
 1.27 4014.7 1.695 0.51
      9014.7 1.579 0.74 /
/
SOLUTION
EQUIL
 8350 4000 8500 0 8200 0 1 0 0 /
RSVD
 8200 0.6
 8500 0.6 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'P1' 'G' 1 1 8350 'OIL' /
 'I1' 'G' 10 5 8350 'WATER' /
/
COMPDAT
 'P1' 1 1 1 1 'OPEN' 1* 1* 0.5 /
 'I1' 10 5 1 1 'OPEN' 1* 1* 0.5 /
/
WCONHIST
 'P1' 'OPEN' 'ORAT' 1000 0 600 /
/
WCONINJH
 'WATER' 'OPEN' 1200 /
/
TSTEP
 5*10 /
END
"""
# note: WCONINJH record above is missing the well name on purpose in the
# template; tests inject the real record


def _case():
    deck = DECK.replace("WCONINJH\n 'WATER' 'OPEN' 1200 /",
                        "WCONINJH\n 'I1' 'WATER' 'OPEN' 1200 /")
    return load_case_string(deck)


def test_wconhist_parsing():
    from opm_tpu.io.schedule import RESV, SURFACE_RATE, build_schedule

    case = _case()
    sched = build_schedule(case)
    step = sched.report_steps[0]
    p1 = next(w for w in step.wells if w.name == "P1")
    i1 = next(w for w in step.wells if w.name == "I1")
    assert p1.history and p1.control == RESV
    assert p1.orat == pytest.approx(1000 * STB / DAY)
    assert p1.wrat == 0.0
    assert p1.grat == pytest.approx(600 * MSCF / DAY)
    assert p1.bhp_limit == pytest.approx(101325.0)
    assert i1.history and i1.control == SURFACE_RATE
    assert i1.surf_inj_rate == pytest.approx(1200 * STB / DAY)


def test_wconhist_resv_target_and_rates():
    """The history producer's reservoir voidage matches the converted
    observed rates, and the produced surface oil rate lands near the
    observed ORAT (the deck's observed GRAT is rs-consistent)."""
    from opm_tpu.wells.rateconv import well_resv_coefficients

    case = _case()
    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run(report_step_limit=3)
    names = sim.well_names
    ip = names.index("P1")
    qs = np.asarray(state.qs)

    # target check: sum(coef * |qs_p1|) == sum(coef * q_obs)
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[2]))
    coef = np.asarray(well_resv_coefficients(sim.model, state, ws))
    q_obs = np.array([0.0, 1000 * STB / DAY, 600 * MSCF / DAY])
    resv_obs = float((coef[ip] * q_obs).sum())
    resv_sim = float((coef[ip] * (-qs[ip])).sum())
    assert resv_sim == pytest.approx(resv_obs, rel=1e-3)

    # with rs-consistent observed gas, oil rate ~ observed ORAT
    oil_stb_d = -qs[ip, 1] * DAY / STB
    assert oil_stb_d == pytest.approx(1000, rel=0.05), oil_stb_d

    # injector pinned at the observed surface rate
    ii = names.index("I1")
    inj_stb_d = qs[ii, 0] * DAY / STB
    assert inj_stb_d == pytest.approx(1200, rel=1e-6), inj_stb_d
