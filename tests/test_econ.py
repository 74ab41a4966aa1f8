"""WECON economic limits (checkRateEconLimits / checkMaxWaterCutLimit /
workover procedure)."""
import numpy as np

from opm_tpu.wells.econ import (check_econ_limits, check_rate_limits,
                                worst_water_cut_connection)


def test_rate_limits():
    assert check_rate_limits(10.0, 1.0, 100.0, min_orat=5.0) is None
    assert check_rate_limits(2.0, 1.0, 100.0,
                             min_orat=5.0) == "MIN_OIL_RATE"
    assert check_rate_limits(10.0, 1.0, 50.0,
                             min_grat=100.0) == "MIN_GAS_RATE"
    assert check_rate_limits(2.0, 1.0, 0.0,
                             min_lrat=5.0) == "MIN_LIQUID_RATE"
    # unset limits (NaN) never trigger
    assert check_rate_limits(0.0, 0.0, 0.0) is None


def test_worst_water_cut_connection():
    # well water cut = 0.4; limit 0.35 violated; conn 2 has the worst cut
    perf_qw = [1.0, 2.0, 9.0]
    perf_qo = [9.0, 8.0, 1.0]
    viol, worst, last = worst_water_cut_connection(
        perf_qw, perf_qo, [True, True, True], 0.35)
    assert viol and worst == 2 and not last
    # below the limit: nothing
    viol, _, _ = worst_water_cut_connection(perf_qw, perf_qo,
                                            [True] * 3, 0.9)
    assert not viol
    # closed connections are not candidates
    viol, worst, _ = worst_water_cut_connection(
        [9.0, 1.0, 8.0], [1.0, 9.0, 2.0], [False, True, True], 0.4)
    # open liquid = 1+9 + 8+2 = 20, open qw = 9 -> wct 0.45 > 0.4
    assert viol and worst == 2
    # single remaining connection flags last_connection
    viol, worst, last = worst_water_cut_connection(
        [9.0, 0.0, 0.0], [1.0, 0.0, 0.0], [True, False, False], 0.4)
    assert viol and worst == 0 and last


def test_workover_procedures():
    perf_qw = [1.0, 2.0, 9.0]
    perf_qo = [9.0, 8.0, 1.0]
    mask = [True, True, True]
    # CON closes the single worst connection
    r = check_econ_limits(18.0, 12.0, 0.0, perf_qw, perf_qo, mask,
                          max_wct=0.35, workover="CON")
    assert not r.shut_well and r.closed_connections == (2,)
    # +CON closes the worst and all below it
    r = check_econ_limits(18.0, 12.0, 0.0, [1.0, 9.0, 2.0],
                          [9.0, 1.0, 8.0], mask,
                          max_wct=0.35, workover="+CON")
    assert not r.shut_well and r.closed_connections == (1, 2)
    # NONE/WELL shuts the well
    r = check_econ_limits(18.0, 12.0, 0.0, perf_qw, perf_qo, mask,
                          max_wct=0.35, workover="NONE")
    assert r.shut_well and r.reason == "MAX_WATER_CUT"
    # last remaining connection escalates to a well shut even under CON
    r = check_econ_limits(1.0, 9.0, 0.0, [9.0], [1.0], [True],
                          max_wct=0.4, workover="CON")
    assert r.shut_well
    # rate limit beats ratio workover
    r = check_econ_limits(0.1, 9.0, 0.0, perf_qw, perf_qo, mask,
                          min_orat=5.0, max_wct=0.35, workover="CON")
    assert r.shut_well and r.reason == "MIN_OIL_RATE"


def test_wecon_workover_parse():
    from opm_tpu.io.schedule import build_schedule
    from opm_tpu.sim.testcases import mini_blackoil_case

    case = mini_blackoil_case(4, 4, 2)
    sched = build_schedule(case)
    base = sched.report_steps[0].wells
    # the mini case has no WECON: defaults
    for w in base:
        assert w.econ_workover == "NONE"
        assert not np.isfinite(w.econ_max_wct)
