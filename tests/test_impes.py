"""IMPES-on-AD demonstrator (ImpesTPFAAD.cpp:206-302 role): implicit
pressure via jacfwd over the FI model's own residual functions, explicit
saturations."""
import numpy as np
import pytest

from opm_tpu.models.blackoil import make_well_device_arrays
from opm_tpu.models.impes import ImpesTpfaAd
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
from opm_tpu.sim.testcases import mini_blackoil_case

DAY = 86400.0


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    import opm_tpu.sim.init as im

    case = mini_blackoil_case(6, 6, 2, inj_rate=20000, prod_rate=5000)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = im.initial_state(sim.grid, sim.props, case,
                             len(sim.well_names))
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[0]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    state = sim._init_well_state(state, ws, True)
    # converge the well state once so IMPES and FI start identically
    state, _ = sim.solver.step(state, 0.25 * DAY, wd)
    return sim, state, wd


def test_impes_pressure_newton_converges(setup):
    sim, state, wd = setup
    impes = ImpesTpfaAd(sim.model)
    s2, iters, rn = impes.step(state, 1.0 * DAY, wd)
    assert rn < 1e-7
    assert 0 < iters <= 10
    assert np.isfinite(np.asarray(s2.pressure)).all()


def test_impes_matches_fully_implicit_small_dt(setup):
    """Splitting error is O(dt): for a small dt the IMPES state must track
    the fully-implicit one closely."""
    sim, state, wd = setup
    dt = 0.05 * DAY
    impes = ImpesTpfaAd(sim.model)
    s_imp, _, _ = impes.step(state, dt, wd)
    s_fi, _ = sim.solver.step(state, dt, wd)
    p_i = np.asarray(s_imp.pressure)
    p_f = np.asarray(s_fi.pressure)
    assert np.max(np.abs(p_i - p_f)) / np.abs(p_f).mean() < 2e-3
    assert np.max(np.abs(np.asarray(s_imp.sw) - np.asarray(s_fi.sw))) \
        < 2e-3


def test_impes_water_mass_conserved(setup):
    """The explicit water update is conservative by construction: total
    b_w*sw*pv change equals dt * (well water in - out)."""
    sim, state, wd = setup
    dt = 0.5 * DAY
    impes = ImpesTpfaAd(sim.model)
    s2, _, _ = impes.step(state, dt, wd)
    model = sim.model
    acc0 = np.asarray(model.accumulation(state))
    acc1 = np.asarray(model.accumulation(
        s2._replace(pressure=s2.pressure)))
    pv = np.asarray(model.pv)
    dmass_w = ((acc1[0] - acc0[0]) * pv).sum()
    # well source at the converged pressure
    import jax.numpy as jnp
    from opm_tpu.wells import standard as stdwells
    q = model.cell_quantities(s2)
    cdp = stdwells.connection_pressure_offsets(
        wd, model.well_cell_quantities(q), state.qs)
    cq = np.asarray(stdwells.perforation_fluxes(
        wd, model.well_cell_quantities(q), state.bhp, state.qs, cdp))
    src_w = cq[:, :, 0].sum()
    # sw clipping can only remove mass; unclipped cells balance exactly
    assert dmass_w == pytest.approx(dt * src_w, rel=1e-3, abs=1.0)
