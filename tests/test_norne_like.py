"""Norne-class synthetic (faulted corner-point field at the real Norne's
46x112x22 dimensions — the reference's Norne regression class,
compareECLFiles.cmake:141-146; the real deck is licensed data): exercises
the native corner-point builder with stair-step fault throw, ACTNUM
carving, MULTFLT sealing, and the gather-path (aggregation-AMG) solver on
an unstructured-activity grid."""
import numpy as np
import pytest

from opm_tpu.grid import build_grid
from opm_tpu.sim.testcases import norne_like_case

DAY = 86400.0


@pytest.fixture(scope="module")
def case():
    return norne_like_case()


@pytest.fixture(scope="module")
def grid(case):
    return build_grid(case)


def test_geometry_and_faults(case, grid):
    nx, ny, nz = grid.dims
    assert (nx, ny, nz) == (46, 112, 22)
    # ACTNUM carving leaves a Norne-scale active count
    assert 40000 < grid.nc < 95000
    assert not grid.structured
    fc = np.asarray(grid.face_cells)
    fd = np.asarray(grid.face_dir)
    gi = np.asarray(grid.global_cell)
    i1 = gi[fc[:, 0]] % nx
    k1 = gi[fc[:, 0]] // (nx * ny)
    k2 = gi[fc[:, 1]] // (nx * ny)
    # stair-step fault pairing: cross-layer x-connections exist at the
    # fault planes (18 m and 25 m throws over 3-12 m layers)
    f1 = nx // 3 - 1          # 0-based i of the upthrown column
    on_f1 = (fd == 0) & (i1 == f1)
    assert on_f1.any()
    assert (k1[on_f1] != k2[on_f1]).any(), "no cross-layer fault pairs"
    # MULTFLT 0.001 seals fault FA: its faces' trans are tiny relative to
    # the unfaulted x-face median
    tr = np.asarray(grid.trans)
    bulk = np.median(tr[(fd == 0) & ~on_f1])
    assert np.median(tr[on_f1]) < 0.01 * bulk


def test_initial_state_and_first_step(case, grid):
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run(report_step_limit=1)
    assert sim.report.failed_substeps == 0
    p = np.asarray(state.pressure)
    assert np.isfinite(p).all()
    assert (p > 1e7).all() and (p < 1e8).all()


@pytest.mark.slow
def test_fault_compartmentalization():
    """The sealed FA fault (MULTFLT 0.001) compartmentalizes: after
    production west of the fault only, the east side keeps materially
    more pressure than with the fault open."""
    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.testcases import norne_like_deck

    deck = norne_like_deck(tsteps="5 10 30 45")
    case_s = load_case_string(deck)
    case_o = load_case_string(deck.replace("'FA' 0.001 /", "'FA' 1.0 /"))
    nx = 46
    f1 = nx // 3

    def run(case):
        sim = SimulatorFullyImplicitBlackoil(case)
        st = sim.run()
        gi = np.asarray(sim.grid.global_cell)
        i = gi % nx
        p = np.asarray(st.pressure)
        return p[i < f1].mean(), p[i >= f1].mean(), sim

    wl_s, el_s, sim_s = run(case_s)
    wl_o, el_o, sim_o = run(case_o)
    assert sim_s.report.failed_substeps <= 3
    # sealing increases the west-east pressure differential
    assert abs(wl_s - el_s) > abs(wl_o - el_o) + 1e4
