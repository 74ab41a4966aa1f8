"""Schedule-time geology modifiers (GEO_MODIFIER events): MULTFLT /
MULT[XYZ] keywords inside SCHEDULE rebuild the transmissibilities mid-run
(the reference rebuilds DerivedGeology, SimulatorBase_impl.hpp:258-268)."""
import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case_string
from opm_tpu.io.schedule import build_schedule
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
from opm_tpu.sim.testcases import mini_blackoil_deck


def _mod_deck(schedule_mod: str) -> str:
    """mini black-oil deck with a fault plane at i=2|3 (x-faces of column
    i=2, all j/k) and a schedule tail after the modifier."""
    deck = mini_blackoil_deck(4, 3, 2, tsteps="3*10")
    deck = deck.replace(
        "PROPS\n",
        "FAULTS\n 'F1' 2 2 1 3 1 2 'X' /\n/\nPROPS\n", 1)
    deck = deck.replace(
        "END\n", schedule_mod + "TSTEP\n 3*10 /\nEND\n", 1)
    return deck


def test_schedule_parses_geo_mods():
    case = load_case_string(_mod_deck("MULTFLT\n 'F1' 0.001 /\n/\n"))
    sched = build_schedule(case)
    assert len(sched.report_steps) == 6
    assert not sched.report_steps[0].geo_mods
    mods = sched.report_steps[3].geo_mods
    assert mods and mods[0][0] == "MULTFLT"
    assert mods[0][1] == [("F1", 0.001)]
    assert "GEO_MODIFIER" in sched.report_steps[3].events


@pytest.mark.compile_heavy
def test_multflt_mid_run_changes_trans_and_solution():
    case = load_case_string(_mod_deck("MULTFLT\n 'F1' 1e-6 /\n/\n"))
    sim = SimulatorFullyImplicitBlackoil(case)
    t_before = np.asarray(sim.model.trans).copy()
    fc = np.asarray(sim.grid.face_cells)
    fd = np.asarray(sim.grid.face_dir)
    state = sim.run()
    t_after = np.asarray(sim.model.trans)
    # fault faces: +x faces of cells with i==1 (0-based) — cart i index
    gi = np.asarray(sim.grid.global_cell)[fc[:, 0]] % 4
    on_fault = (fd == 0) & (gi == 1)
    assert on_fault.sum() == 6        # 3 j-rows x 2 layers
    assert np.allclose(t_after[on_fault], 1e-6 * t_before[on_fault],
                       rtol=1e-12)
    assert np.allclose(t_after[~on_fault], t_before[~on_fault])
    # and the run stays healthy through the re-trace boundary
    assert sim.report.failed_substeps == 0
    assert bool(np.all(np.isfinite(np.asarray(state.pressure))))

    # physics check: the sealed half (injector side, i<2) pressurizes
    # relative to an unmodified run
    case2 = load_case_string(_mod_deck(""))
    sim2 = SimulatorFullyImplicitBlackoil(case2)
    state2 = sim2.run()
    gi_cell = np.asarray(sim.grid.global_cell) % 4
    p_sealed = np.asarray(state.pressure)
    p_open = np.asarray(state2.pressure)
    dp_inj_side = (p_sealed[gi_cell < 2].mean()
                   - p_open[gi_cell < 2].mean())
    dp_prod_side = (p_sealed[gi_cell >= 2].mean()
                    - p_open[gi_cell >= 2].mean())
    # injector side holds more pressure, producer side is starved
    assert dp_inj_side > 0.0
    assert dp_prod_side < 0.0
