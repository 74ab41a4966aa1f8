"""Embedded-structured grids: ACTNUM-holed grids ride the structured
stencil+GMG fast path by embedding into the full cartesian box with inert
padding cells (grid/grid.py _build_embedded_grid). The physical solution
must be identical to the gather-path representation of the same deck.

Reference semantics: GeoProps active-cell trans assembly
(/root/reference/opm/autodiff/GeoProps.hpp) — the embedding is purely a
TPU data-layout choice.
"""
import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case_string
from opm_tpu.sim.testcases import mini_blackoil_deck


def _holed_deck(nx=8, ny=8, nz=4, tsteps="5 10"):
    deck = mini_blackoil_deck(nx, ny, nz, tsteps=tsteps)
    act = np.ones((nz, ny, nx), dtype=int)
    act[1:3, 3:5, 3:5] = 0          # interior 2x2x2 hole
    act[0, 0, nx - 1] = 0           # corner cell
    return deck.replace(
        "PORO\n", "ACTNUM\n " + " ".join(map(str, act.ravel()))
        + " /\nPORO\n")


def _run(deck, embed, monkeypatch):
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

    monkeypatch.setenv("OPM_TPU_EMBED", embed)
    case = load_case_string(deck)
    sim = SimulatorFullyImplicitBlackoil(case)
    st = sim.run()
    g = sim.grid
    rc = g.real_cells
    # map to cartesian ids and sort so both layouts compare cell-for-cell
    gc = (np.arange(g.nc)[rc] if g.active_mask is not None
          else np.asarray(g.global_cell)[rc])
    order = np.argsort(gc)
    return dict(
        grid=g, sim=sim,
        p=np.asarray(st.pressure)[rc][order],
        sw=np.asarray(st.sw)[rc][order],
        qs=np.asarray(st.qs), fopr=sim.summary.rows[-1]["FOPR"]
        if sim.summary.rows else None)


def test_embedded_equals_gather(monkeypatch):
    deck = _holed_deck()
    r0 = _run(deck, "0", monkeypatch)
    r1 = _run(deck, "1", monkeypatch)
    g0, g1 = r0["grid"], r1["grid"]
    assert not g0.structured and g0.active_mask is None
    assert g1.structured and g1.active_mask is not None
    assert g1.nc == 8 * 8 * 4 and g1.n_real == g0.nc
    # identical physical trajectory (same Newton path up to roundoff)
    np.testing.assert_allclose(r1["p"], r0["p"], rtol=1e-6)
    np.testing.assert_allclose(r1["sw"], r0["sw"], atol=1e-6)
    np.testing.assert_allclose(r1["qs"], r0["qs"], rtol=1e-5)
    assert r0["sim"].report.failed_substeps == 0
    assert r1["sim"].report.failed_substeps == 0


def test_embedded_padding_is_inert(monkeypatch):
    """Padding cells stay frozen at their (donor-copied) initial state."""
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.init import initial_state

    deck = _holed_deck(tsteps="5 10")
    monkeypatch.setenv("OPM_TPU_EMBED", "1")
    case = load_case_string(deck)
    sim = SimulatorFullyImplicitBlackoil(case)
    st0 = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    st = sim.run()
    pad = ~np.asarray(sim.grid.active_mask)
    assert pad.sum() == 9
    np.testing.assert_allclose(np.asarray(st.pressure)[pad],
                               np.asarray(st0.pressure)[pad], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st.sw)[pad],
                               np.asarray(st0.sw)[pad], atol=1e-12)


def test_embedded_init_file_covers_real_cells_only(tmp_path, monkeypatch):
    from opm_tpu.grid import build_grid
    from opm_tpu.io.eclsum import read_init, write_init

    deck = _holed_deck()
    monkeypatch.setenv("OPM_TPU_EMBED", "1")
    case = load_case_string(deck)
    g = build_grid(case)
    path = write_init(str(tmp_path / "CASE"), g, unit_system="FIELD")
    init = read_init(path)
    assert len(init["PORO"]) == g.n_real
    assert len(init["PORV"]) == 8 * 8 * 4    # cartesian-size, zero-padded
    porv = init["PORV"].reshape(4, 8, 8)
    assert porv[1, 3, 3] == 0.0              # holed cell has zero PV
    # TRANX rows land on real active ranks (no -1 clobber of the tail)
    assert (init["TRANX"] >= 0).all()
    assert init["TRANX"].max() > 0
