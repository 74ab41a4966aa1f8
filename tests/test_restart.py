"""Restart-consistency test: run, checkpoint mid-way, resume, compare with
the uninterrupted run (the reference's restart regression,
compareECLFiles.cmake:123-136 / run-restart-regressionTest.sh)."""
import os

import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

SPE1 = os.path.join(os.path.dirname(__file__), "..", "data", "SPE1CASE2.DATA")


@pytest.mark.compile_heavy
def test_restart_resume(tmp_path):
    case = load_case(SPE1)
    out = str(tmp_path)

    # uninterrupted 6 report steps, writing checkpoints
    sim_a = SimulatorFullyImplicitBlackoil(case, output_dir=out)
    state_a = sim_a.run(report_step_limit=6, write_restart=True,
                        write_vtk=True)

    # resume from step 3's checkpoint
    sim_b = SimulatorFullyImplicitBlackoil(case, output_dir=None)
    state_b = sim_b.run(report_step_limit=6,
                        restart_file=os.path.join(out, "restart_0003.npz"))

    p_a = np.asarray(state_a.pressure)
    p_b = np.asarray(state_b.pressure)
    # restart tolerance analogue (abs 2e-1 bar-ish, rel 4e-5):
    assert np.abs(p_a - p_b).max() / p_a.mean() < 4e-4
    assert np.abs(np.asarray(state_a.sw) - np.asarray(state_b.sw)).max() \
        < 1e-4
    assert np.array_equal(np.asarray(state_a.hcstate),
                          np.asarray(state_b.hcstate))
    # vtk artifacts exist and are well-formed XML headers
    vtr = os.path.join(out, "step_0005.vtr")
    assert os.path.exists(vtr)
    with open(vtr) as f:
        head = f.read(200)
    assert "RectilinearGrid" in head


@pytest.mark.compile_heavy
def test_events_and_step_timing(tmp_path):
    from opm_tpu.io.eclstate import load_case
    case = load_case(SPE1)
    sim = SimulatorFullyImplicitBlackoil(case, output_dir=str(tmp_path))
    hits = []
    sim.events.event("timestep_completed").add(
        lambda s, t, dt: hits.append(t))
    sim.run(report_step_limit=2)
    assert len(hits) >= 2           # at least one substep per report step
    timing = (tmp_path / "step_timing.txt").read_text()
    assert len(timing.splitlines()) == 3  # header + 2 steps
    assert (tmp_path / "walltime.txt").exists()
    assert (tmp_path / "SPE1CASE2.SMSPEC").exists()
    assert (tmp_path / "SPE1CASE2.UNSMRY").exists()


@pytest.mark.compile_heavy
def test_unrst_resume(tmp_path):
    """Resume from the ECL unified-restart file (not npz): the reference's
    initFromRestartFile path with restart tolerances abs 2e-1 / rel 4e-5
    (compareECLFiles.cmake:123-136)."""
    case = load_case(SPE1)
    out = str(tmp_path)

    sim_a = SimulatorFullyImplicitBlackoil(case, output_dir=out)
    state_a = sim_a.run(report_step_limit=6, write_restart=True)
    unrst = os.path.join(out, "SPE1CASE2.UNRST")
    assert os.path.exists(unrst)

    sim_b = SimulatorFullyImplicitBlackoil(case)
    state_b = sim_b.run(report_step_limit=6, restart_file=unrst,
                        restart_step=3)
    p_a = np.asarray(state_a.pressure)
    p_b = np.asarray(state_b.pressure)
    rel = np.abs(p_a - p_b) / np.maximum(np.abs(p_a), 1.0)
    # slightly looser than the npz path: cells exactly at the sg=0
    # switching boundary reclassify GASOIL<->OILONLY on resume (same
    # saturated point, different primary variable); reference restart
    # tolerances are cruder still (abs 2e-1 / rel 4e-5 on summaries)
    assert rel.max() < 2e-3
    assert np.abs(np.asarray(state_a.sw) - np.asarray(state_b.sw)).max() \
        < 2e-3
    assert np.array_equal(np.asarray(state_a.hcstate),
                          np.asarray(state_b.hcstate))
    # well state round-tripped through OPM_XWEL
    assert np.allclose(np.asarray(state_a.bhp), np.asarray(state_b.bhp),
                       rtol=1e-3)


@pytest.mark.compile_heavy
def test_deck_restart_keyword(tmp_path):
    """Deck RESTART keyword in SOLUTION auto-resumes from BASENAME.UNRST
    next to the deck (FlowMain.hpp:845-846 + InitConfig.getRestartStep)."""
    case = load_case(SPE1)
    out = str(tmp_path)
    sim_a = SimulatorFullyImplicitBlackoil(case, output_dir=out)
    state_a = sim_a.run(report_step_limit=6, write_restart=True)

    # craft a deck that RESTARTs from step 3 of the previous run
    with open(SPE1) as f:
        text = f.read()
    text = text.replace("SOLUTION", "SOLUTION\nRESTART\n 'SPE1CASE2' 3 /\n",
                        1)
    deck_path = os.path.join(out, "SPE1RST.DATA")
    with open(deck_path, "w") as f:
        f.write(text)
    from opm_tpu.io.eclstate import load_case as _lc
    case_b = _lc(deck_path)
    assert case_b.solution.restart == ("SPE1CASE2", 3)
    sim_b = SimulatorFullyImplicitBlackoil(case_b)
    state_b = sim_b.run(report_step_limit=6)
    p_a = np.asarray(state_a.pressure)
    p_b = np.asarray(state_b.pressure)
    assert (np.abs(p_a - p_b) / np.maximum(np.abs(p_a), 1.0)).max() < 2e-3


def test_init_egrid_roundtrip(tmp_path):
    """INIT/EGRID writer round-trip: PORV/TRANX match the grid; compare_ecl
    --init passes against itself and catches a perturbation."""
    from opm_tpu.grid import build_grid
    from opm_tpu.io.eclsum import read_init, write_egrid, write_init
    from opm_tpu.tools.compare_ecl import compare_init
    from opm_tpu.utils.units import si_factor

    case = load_case(SPE1)
    grid = build_grid(case)
    base = os.path.join(str(tmp_path), "T")
    write_init(base, grid, unit_system="FIELD")
    arrs = read_init(base + ".INIT")
    assert arrs["PORV"].shape[0] == np.prod(grid.dims)
    u_vol = 1.0 / si_factor("FIELD", "ReservoirVolume")
    assert np.allclose(arrs["PORV"][np.asarray(grid.global_cell)],
                       grid.pore_volume * u_vol, rtol=1e-6)
    # TRANX of cell (0,0,0): the x-face trans to cell (1,0,0)
    fc = np.asarray(grid.face_cells)
    fd = np.asarray(grid.face_dir)
    f0 = np.where((fd == 0) & (fc[:, 0] == 0))[0][0]
    u_tran = 1.0 / si_factor("FIELD", "Transmissibility")
    assert arrs["TRANX"][0] == pytest.approx(grid.trans[f0] * u_tran,
                                             rel=1e-6)
    n, fails = compare_init(base + ".INIT", base + ".INIT",
                            abs_tol=2e-2, rel_tol=1e-5)
    assert n > 5 and not fails
    # EGRID: geometry reconstructs the cartesian cell volumes
    write_egrid(base, case)
    from opm_tpu.io.eclsum import read_ecl_file
    kws = {name: vals for name, typ, vals in read_ecl_file(base + ".EGRID")}
    assert "COORD" in kws and "ZCORN" in kws
    from opm_tpu.grid.cornerpoint import cell_geometry, corner_coordinates
    u_len = si_factor("FIELD", "Length")
    corners = corner_coordinates(grid.dims,
                                 np.asarray(kws["COORD"]) * u_len,
                                 np.asarray(kws["ZCORN"]) * u_len)
    vol, _ = cell_geometry(corners)
    assert np.allclose(np.sort(vol.ravel()), np.sort(grid.volume),
                       rtol=1e-5)
