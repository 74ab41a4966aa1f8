"""SPE9 (Killough, SPE-29110) corner-point deck: geometry fidelity +
end-to-end schedule (the compareECLFiles.cmake:114-118 SPE9 regression
class; without ECL reference outputs, asserts the published problem's
structural features — dipping corner-point geometry, 26 wells, the
900-day schedule with rate cuts at day 300/360)."""
import os

import numpy as np
import pytest

from opm_tpu.grid import build_grid
from opm_tpu.io.eclstate import load_case
from opm_tpu.io.schedule import build_schedule

SPE9 = os.path.join(os.path.dirname(__file__), "..", "data", "SPE9.DATA")
FT = 0.3048
PSI = 6894.757293168361
STB = 0.158987294928
DAY = 86400.0


@pytest.fixture(scope="module")
def case():
    return load_case(SPE9)


@pytest.fixture(scope="module")
def grid(case):
    return build_grid(case)


def test_spe9_grid_geometry(grid):
    nx, ny, nz = grid.dims
    assert (nx, ny, nz) == (24, 25, 15)
    assert grid.nc == 9000
    # 300 ft x 300 ft cells with the published layer-1 thickness of 20 ft,
    # recovered from the CORNER geometry (not cbrt(volume))
    assert grid.dx[0] == pytest.approx(300 * FT, rel=1e-5)
    assert grid.dy[0] == pytest.approx(300 * FT, rel=1e-5)
    assert grid.dz[0] == pytest.approx(20 * FT, rel=1e-5)
    # 10-degree dip along x: cell-center depth difference between
    # x-neighbors = tan(10 deg) * 300 ft
    a0 = grid.active_index(0, 0, 0)
    a1 = grid.active_index(1, 0, 0)
    ddz = (grid.depth[a1] - grid.depth[a0]) / FT
    assert ddz == pytest.approx(np.tan(np.deg2rad(10.0)) * 300.0,
                            rel=1e-3)  # ZCORN written at 0.01 ft
    # prism volumes survive the dip shear
    assert grid.volume[a0] == pytest.approx(300 * 300 * 20 * FT**3,
                                            rel=1e-5)


def test_spe9_schedule(case):
    sched = build_schedule(case)
    assert sched.report_steps[-1].end_time == pytest.approx(900 * DAY)
    # 26 wells: 25 producers + water injector completed in layers 11-15
    w0 = {w.name: w for w in sched.report_steps[0].wells}
    assert len(w0) == 26
    inj = w0["INJ1"]
    assert inj.type == "INJECTOR"
    ks = sorted({c.k for c in inj.completions})
    assert ks == [10, 11, 12, 13, 14]
    # producer rate schedule: 1500 -> 100 at day 300 -> 1500 at day 360
    def orat_at(day):
        for s in sched.report_steps:
            if s.start_time <= day * DAY < s.end_time:
                return next(w for w in s.wells
                            if w.name == "P1").orat / (STB / DAY)
        raise AssertionError(day)
    assert orat_at(10) == pytest.approx(1500, rel=1e-6)
    assert orat_at(330) == pytest.approx(100, rel=1e-6)
    assert orat_at(400) == pytest.approx(1500, rel=1e-6)


def test_spe9_wi_uses_layer_thickness(grid, case):
    """The Peaceman WI must see the pancake geometry: a producer
    completion in layer 2 (15 ft thick, 300 ft areal) has WI proportional
    to k*h with h = 15 ft — the cbrt(volume) bug gave h ~ 110 ft."""
    from opm_tpu.io.schedule import build_schedule
    from opm_tpu.wells.wells import build_well_set

    sched = build_schedule(case)
    ws = build_well_set(sched.report_steps[0].wells, grid)
    iw = ws.names.index("P1")
    k_layer = 1   # first completed layer (k=2 in deck, 0-based 1)
    a = ws.perf_cell[iw][ws.perf_mask[iw]][0]
    # WI = 2 pi k h / (ln(r0/rw) + s); h = dz = 15 ft for a z-completion
    h = grid.dz[a]
    assert h == pytest.approx(15 * FT, rel=1e-6)
    kx, ky = grid.permx[a], grid.permy[a]
    r0 = 0.28 * np.sqrt(np.sqrt(ky / kx) * grid.dx[a] ** 2
                        + np.sqrt(kx / ky) * grid.dy[a] ** 2) \
        / ((ky / kx) ** 0.25 + (kx / ky) ** 0.25)
    wi_expect = 2 * np.pi * np.sqrt(kx * ky) * h / np.log(r0 / (0.5 * 0.5))
    assert ws.perf_wi[iw][0] == pytest.approx(wi_expect, rel=1e-6)


@pytest.mark.slow
def test_spe9_full_schedule():
    """Full 900-day SPE9 run: zero failed substeps, the day-300 rate cut
    visible in FOPR, pressure recovery during the cut, and water-injection
    voidage support keeping the field pressure bounded."""
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

    case = load_case(SPE9)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run()
    # chop-retry recovery is the designed failure path (a few chopped
    # substeps around the day-300/360 rate steps are normal); what must
    # hold is that the run completes the full schedule
    assert sim.report.failed_substeps <= 6
    t = sim.summary.series("time")
    fopr = sim.summary.series("FOPR") * DAY / STB   # STB/D
    fpr = sim.summary.series("FPR") / PSI
    # during the cut (300-360 d) total oil rate == 25 * 100 STB/D (all
    # producers can sustain 100 against the 1000 psi BHP floor)
    cut = (t > 300) & (t <= 360)
    assert cut.any()
    assert np.allclose(fopr[cut], 2500.0, rtol=1e-3)
    # the production cut slows the field pressure decline (absolute
    # recovery depends on the gas voidage of the stand-in perm field)
    i_cut = np.where(cut)[0]
    i0 = i_cut[0]
    slope_before = (fpr[i0 - 1] - fpr[i0 - 2]) / (t[i0 - 1] - t[i0 - 2])
    slope_cut = (fpr[i_cut[-1]] - fpr[i0 - 1]) / (t[i_cut[-1]] - t[i0 - 1])
    assert slope_cut > slope_before
    # and production resumes after day 360
    after = t > 400
    assert fopr[after].max() > 4000.0
    assert bool(np.all(np.isfinite(np.asarray(state.pressure))))


@pytest.mark.slow
def test_spe9_published_anchors():
    """Anchors against the published SPE9 behavior (Killough 1995,
    'Ninth SPE Comparative Solution Project: A Reexamination of
    Black-Oil Simulation', SPE 29110). The published PERMEABILITY field
    is an external geostatistical data file that is not redistributable
    here (data/SPE9.DATA carries a seeded lognormal stand-in with the
    published layer statistics — tools/make_spe9.py), so Killough's
    absolute rates cannot anchor this deck. What IS field-independent
    and published is anchored:
    * the day-300..360 field rate cut to exactly 25 x 100 stb/d (all
      participants reproduce it exactly — it is a specified control);
    * the water injector NEVER sustains its 5000 stb/d target — it is
      immediately BHP-limited (4000 psia), the headline SPE9 result all
      participants showed (Killough Fig. 10);
    * producers progressively fall off the 1500 stb/d target onto the
      1000 psi BHP floor, giving a monotone field-rate decline between
      schedule events (Fig. 6 shape).
    Plus 3%-tolerance REGRESSION PINS on this framework's converged
    trajectory so conservative physics drift still fails."""
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

    case = load_case(SPE9)
    sim = SimulatorFullyImplicitBlackoil(case, fused=True)
    sim.run()
    t = sim.summary.series("time")
    fopr = sim.summary.series("FOPR") * DAY / STB
    fwir = sim.summary.series("FWIR") * DAY / STB
    fpr = sim.summary.series("FPR") / PSI

    # published, field-independent
    cut = (t > 300) & (t <= 360)
    assert np.allclose(fopr[cut], 2500.0, rtol=1e-3)
    assert fwir.max() < 5000.0 * (1 - 1e-3)   # injector always BHP-limited
    pre_cut = (t > 5) & (t <= 300)
    assert np.all(np.diff(fopr[pre_cut]) < 1e-6)   # monotone decline
    assert fopr[0] < 25 * 1500.0               # off-target from day 1

    # regression pins (3%) from the converged stand-in-field trajectory
    def at(day):
        return fopr[int(np.argmin(np.abs(t - day)))]
    assert at(300) == pytest.approx(23497.7, rel=0.03)
    assert at(900) == pytest.approx(14576.5, rel=0.03)
    assert fpr[int(np.argmin(np.abs(t - 900)))] == pytest.approx(
        2869.4, rel=0.03)
