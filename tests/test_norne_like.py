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
    assert 40000 < grid.n_real < 95000
    # Norne-class activity fraction auto-EMBEDS into the full cartesian
    # box so the structured stencil+GMG fast path applies (grid/grid.py
    # _embed_wanted); the cell axis is then the whole box with inert
    # padding cells
    assert grid.structured and grid.active_mask is not None
    assert grid.nc == nx * ny * nz
    fc = np.asarray(grid.face_cells)
    fd = np.asarray(grid.face_dir)
    tr = np.asarray(grid.trans)
    # padding cells are frozen spectators: zero trans on every face
    pad = ~np.asarray(grid.active_mask)
    touches_pad = pad[fc[:, 0]] | pad[fc[:, 1]]
    assert (tr[touches_pad] == 0.0).all()
    # stair-step fault pairing: cross-layer x-connections (18 m and 25 m
    # throws over 3-12 m layers) land on the gather-path extra faces
    # appended after the canonical stencil block
    nfc = grid.nf_canonical
    assert grid.nf > nfc
    k1 = fc[nfc:, 0] // (nx * ny)
    k2 = fc[nfc:, 1] // (nx * ny)
    xe = fd[nfc:] == 0
    assert xe.any()
    assert (k1[xe] != k2[xe]).any(), "no cross-layer fault pairs"
    # MULTFLT 0.001 seals fault FA: its extra faces' trans are tiny
    # relative to the unfaulted conforming x-face median
    f1 = nx // 3 - 1          # 0-based i of the upthrown column
    i1e = fc[nfc:, 0] % nx
    on_f1 = xe & (i1e == f1)
    assert on_f1.any()
    bulk_sel = (fd[:nfc] == 0) & (tr[:nfc] > 0.0)
    bulk = np.median(tr[:nfc][bulk_sel])
    assert np.median(tr[nfc:][on_f1]) < 0.01 * bulk


def test_gather_path_equivalence(case, monkeypatch):
    """OPM_TPU_EMBED=0 must give the identical physical grid: same real
    cells, same nonzero connections, same transmissibilities."""
    monkeypatch.setenv("OPM_TPU_EMBED", "0")
    g0 = build_grid(case)
    monkeypatch.setenv("OPM_TPU_EMBED", "1")
    g1 = build_grid(case)
    assert not g0.structured and g0.active_mask is None
    assert g1.structured and g1.active_mask is not None
    assert g0.nc == g1.n_real

    def conn_set(g):
        fc = np.asarray(g.face_cells)
        tr = np.asarray(g.trans)
        # map cell axis to cartesian ids
        if g.active_mask is None:
            cart = np.asarray(g.global_cell)
        else:
            cart = np.arange(g.nc)
        keep = tr > 0.0
        a = cart[fc[keep, 0]]
        b = cart[fc[keep, 1]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        d = {}
        for x, y, t in zip(lo, hi, tr[keep]):
            d[(int(x), int(y))] = d.get((int(x), int(y)), 0.0) + float(t)
        return d

    c0, c1 = conn_set(g0), conn_set(g1)
    assert set(c0) == set(c1)
    t0 = np.array([c0[k] for k in sorted(c0)])
    t1 = np.array([c1[k] for k in sorted(c1)])
    np.testing.assert_allclose(t0, t1, rtol=1e-12)


@pytest.mark.compile_heavy
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
        rc = sim.grid.real_cells
        i = np.asarray(sim.grid.real_global_cell) % nx
        p = np.asarray(st.pressure)[rc]
        return p[i < f1].mean(), p[i >= f1].mean(), sim

    wl_s, el_s, sim_s = run(case_s)
    wl_o, el_o, sim_o = run(case_o)
    assert sim_s.report.failed_substeps <= 3
    # sealing increases the west-east pressure differential
    assert abs(wl_s - el_s) > abs(wl_o - el_o) + 1e4
