import os

import numpy as np
import pytest

from opm_tpu.io.deck import DEFAULT, parse_deck, parse_deck_string
from opm_tpu.io.eclstate import EclipseCase, load_case
from opm_tpu.io.schedule import build_schedule

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
SPE1 = os.path.join(DATA, "SPE1CASE2.DATA")


def test_tokenizer_repeats_defaults():
    deck = parse_deck_string("""
RUNSPEC
DIMENS
 2 2 1 /
GRID
PORO
 2*0.25 0.3 0.35 /
SCHEDULE
WCONPROD
 'P' 'OPEN' 'ORAT' 500 4* 100 /
/
""")
    poro = deck.get("PORO").array
    assert np.allclose(poro, [0.25, 0.25, 0.3, 0.35])
    rec = deck.get("WCONPROD").records[0]
    assert rec[0] == "P"
    assert rec[3] == 500
    assert rec[4] is DEFAULT and rec[7] is DEFAULT
    assert rec[8] == 100


def test_spe1_parse():
    case = load_case(SPE1)
    assert case.runspec.dims == (10, 10, 3)
    assert case.runspec.disgas and not case.runspec.vapoil
    assert case.runspec.unit_system == "FIELD"
    assert "PVTO" in case.tables and "PVDG" in case.tables
    assert len(case.tables["PVTO"][0]) == 9  # 9 rs records
    # EQUIL: datum 8400 ft, 4800 psia
    eq = case.solution.equil[0]
    assert eq.datum_depth == pytest.approx(8400 * 0.3048)
    assert eq.datum_pressure == pytest.approx(4800 * 6894.757293168361)


def test_spe1_schedule():
    case = load_case(SPE1)
    sched = build_schedule(case)
    assert len(sched.report_steps) == 120
    assert sched.total_time == pytest.approx(3652 * 86400.0)
    wells = {w.name: w for w in sched.report_steps[0].wells}
    assert wells["PROD"].control == "ORAT"
    assert wells["PROD"].orat == pytest.approx(20000 * 0.158987294928 / 86400)
    assert wells["PROD"].bhp_limit == pytest.approx(1000 * 6894.757293168361)
    assert wells["INJ"].injector_fluid == "GAS"
    assert wells["INJ"].completions[0].k == 0
    assert wells["PROD"].completions[0].k == 2


def test_include(tmp_path):
    inc = tmp_path / "grid.inc"
    inc.write_text("PORO\n 4*0.11 /\n")
    main = tmp_path / "CASE.DATA"
    main.write_text(
        "RUNSPEC\nDIMENS\n 2 2 1 /\nGRID\nINCLUDE\n 'grid.inc' /\n")
    deck = parse_deck(str(main))
    assert np.allclose(deck.get("PORO").array, 0.11)


def test_equals_copy_box():
    deck_text = """
RUNSPEC
DIMENS
 2 2 2 /
GRID
EQUALS
 'PERMX' 100 1 2 1 2 1 1 /
 'PERMX' 50  1 2 1 2 2 2 /
/
COPY
 'PERMX' 'PERMY' /
/
MULTIPLY
 'PERMY' 2.0 1 2 1 2 1 2 /
/
PORO
 8*0.2 /
"""
    case = EclipseCase(parse_deck_string(deck_text))
    mD = 9.869232667160130e-16
    px = case.grid_arrays["PERMX"]
    py = case.grid_arrays["PERMY"]
    assert np.allclose(px[:4], 100 * mD) and np.allclose(px[4:], 50 * mD)
    assert np.allclose(py, 2 * px)


def test_tuning_tfdiff_mapping():
    """TUNING record 1: TSFMAX (item 5) is the general dt growth cap
    (maxGrowth_), TFDIFF (item 8, default 1.25) the post-restart cap
    (growthFactor_) — AdaptiveTimeStepping_impl.hpp:82-84. Advisor r4:
    TFDIFF was not parsed and TSFMAX leaked into the post-failure cap."""
    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.sim.testcases import mini_blackoil_deck
    from opm_tpu.solver.timestepping import AdaptiveTimeStepping

    deck = mini_blackoil_deck(nx=2, ny=2, nz=1, tsteps="2*10")
    deck = deck.replace(
        "TSTEP", "TUNING\n 0.5 30 0.05 1* 1.5 2* 1.1 /\n/\n 18 /\nTSTEP", 1)
    case = load_case_string(deck)
    sched = build_schedule(case)
    assert sched.tuning["tsfmax"] == pytest.approx(1.5)
    assert sched.tuning["tfdiff"] == pytest.approx(1.1)
    ts = AdaptiveTimeStepping(tuning=sched.tuning)
    assert ts.p.growth_factor == pytest.approx(1.5)
    assert ts.p.max_growth == pytest.approx(1.5)
    assert ts.p.failed_growth == pytest.approx(1.1)
    assert ts.p.initial_dt == pytest.approx(0.5 * 86400.0)
    # record 3 item 1: NEWTMX (max Newton per substep)
    assert sched.tuning["newtmx"] == 18
    # defaulted TFDIFF -> the reference default 1.25
    deck2 = mini_blackoil_deck(nx=2, ny=2, nz=1, tsteps="2*10")
    deck2 = deck2.replace("TSTEP", "TUNING\n 1* 1* 1* 1* 2.0 /\n/\n/\nTSTEP", 1)
    sched2 = build_schedule(load_case_string(deck2))
    ts2 = AdaptiveTimeStepping(tuning=sched2.tuning)
    assert ts2.p.failed_growth == pytest.approx(1.25)
