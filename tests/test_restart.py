"""Restart-consistency test: run, checkpoint mid-way, resume, compare with
the uninterrupted run (the reference's restart regression,
compareECLFiles.cmake:123-136 / run-restart-regressionTest.sh)."""
import os

import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

SPE1 = os.path.join(os.path.dirname(__file__), "..", "data", "SPE1CASE2.DATA")


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
    assert (tmp_path / "SPE1.SMSPEC").exists()
    assert (tmp_path / "SPE1.UNSMRY").exists()
