"""Incompressible two-phase (sim_2p_incomp_ad analogue): Buckley-Leverett
front, conservation, gravity segregation."""
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.grid import cartesian_grid
from opm_tpu.models.twophase import TwophaseModel
from opm_tpu.props.incomp import IncompProps
from opm_tpu.sim.twophase import SimulatorIncompTwophase

DAY = 86400.0


def test_pressure_linear_1d():
    """Single-phase-like limit: uniform mobility -> linear pressure drop."""
    g = cartesian_grid((20, 1, 1), (100.0, 1.0, 1.0), perm=1e-13, poro=0.2)
    props = IncompProps(viscosity=(1e-3, 1e-3), density=(1000.0, 1000.0),
                        exponent=1.0)
    model = TwophaseModel(g, props, gravity_on=False)
    src = np.zeros(g.nc)
    q = 1e-5
    src[0] = q
    src[-1] = -q
    sw = jnp.full(g.nc, 0.5)
    p, flux, _, it = model.pressure_solve(sw, src)
    p = np.asarray(p)
    dp = np.diff(p)
    assert np.allclose(dp, dp[0], rtol=1e-6)     # linear profile
    # flux through every interior x-face equals q
    assert np.allclose(np.asarray(flux), q, rtol=1e-8)


def test_buckley_leverett():
    """Water flood in 1-D: front position matches the Welge shock speed and
    volumes are conserved (the physics sim_2p_incomp_ad demonstrates)."""
    nx = 100
    g = cartesian_grid((nx, 1, 1), (100.0, 1.0, 1.0), perm=1e-13, poro=0.2)
    props = IncompProps(viscosity=(1e-3, 1e-3), density=(1000.0, 800.0),
                        exponent=2.0)
    sim = SimulatorIncompTwophase(g, props, gravity_on=False,
                                  src=np.zeros(g.nc))
    q = g.pore_volume.sum() / (200 * DAY)   # 1 PV in 200 days
    sim.src[0] = q
    sim.src[-1] = -q
    sw0 = np.zeros(g.nc)
    state, rep = sim.run(sw0, dt=2 * DAY, num_steps=25)  # 0.25 PVI
    sw = np.asarray(state.sw)
    # conservation: injected water volume == sum(sw * pv) (sw0 = 0)
    injected = q * 50 * DAY
    stored = (sw * g.pore_volume).sum() + sum(
        wp * 2 * DAY for wp in rep.water_prod)
    assert stored == pytest.approx(injected, rel=1e-6)
    # monotone decreasing profile behind a sharp front
    assert sw[0] > 0.6
    assert np.all(np.diff(sw) < 1e-6)
    # Welge shock: fw(s)/(s) tangency for M=1, quadratic kr -> front
    # saturation ~0.707, speed = fw'(s_f) * v. After 0.25 PVI the front
    # sits near x/L = 0.25 * fw(sf)/sf ~ 0.35-0.45
    front = np.argmax(sw < 0.05) / nx
    assert 0.25 < front < 0.55, front


def test_gravity_segregation():
    """Closed vertical column: heavy water sinks below light oil."""
    g = cartesian_grid((1, 1, 30), (1.0, 1.0, 30.0), perm=1e-12, poro=0.3)
    props = IncompProps(viscosity=(1e-3, 1e-3), density=(1000.0, 700.0),
                        exponent=2.0)
    model = TwophaseModel(g, props, gravity_on=True)
    src = np.zeros(g.nc)
    sw = jnp.full(g.nc, 0.5)
    flux = jnp.zeros(g.nf)
    # no viscous flow: pure gravity transport
    for _ in range(60):
        sw, it, rn = model.transport_solve(sw, flux * 0.0, src, 5 * DAY)
    sw = np.asarray(sw)
    # deepest cells water-full, shallowest oil-full; total conserved
    assert sw[-1] > 0.95 and sw[0] < 0.05
    assert sw.mean() == pytest.approx(0.5, abs=1e-8)
    assert np.all(np.diff(sw) >= -1e-8)  # monotone with depth


def test_reorder_gravity_columns_match_implicit():
    """The reorder family's column-wise segregation
    (TransportSolverTwophaseReorder::solveGravity) agrees with the implicit
    transport's gravity path on a closed column."""
    from opm_tpu.models.reorder import ReorderTwophaseTransport
    g = cartesian_grid((2, 1, 24), (2.0, 1.0, 24.0), perm=1e-12, poro=0.3)
    props = IncompProps(viscosity=(1e-3, 2e-3), density=(1000.0, 750.0),
                        exponent=2.0)
    src = np.zeros(g.nc)
    dt = 5 * DAY

    reorder = ReorderTwophaseTransport(g, props)
    s_r = jnp.full(g.nc, 0.5)
    for _ in range(40):
        s_r, _ = reorder.solve_gravity(s_r, dt)
    s_r = np.asarray(s_r)

    model = TwophaseModel(g, props, gravity_on=True)
    s_i = jnp.full(g.nc, 0.5)
    for _ in range(40):
        s_i, _, _ = model.transport_solve(s_i, jnp.zeros(g.nf), src, dt)
    s_i = np.asarray(s_i)

    # both fully segregated and conservative
    assert (s_r * g.pore_volume).sum() == pytest.approx(
        0.5 * g.pore_volume.sum(), rel=1e-8)
    assert s_r.reshape(24, 2)[-1].min() > 0.95
    assert s_r.reshape(24, 2)[0].max() < 0.05
    # end states agree (same implicit equations, different solvers)
    assert np.max(np.abs(s_r - s_i)) < 5e-2


def test_incomp_reorder_driver_matches_implicit():
    """SimulatorIncompTwophase(transport='reorder') reproduces the
    implicit driver on the quarter-five-spot (sim_2p_incomp vs
    sim_2p_incomp_ad equivalence)."""
    g = cartesian_grid((10, 10, 1), (100.0, 100.0, 1.0), perm=1e-13,
                       poro=0.2)
    props = IncompProps(viscosity=(1e-3, 3e-3), density=(1000.0, 850.0),
                        exponent=2.0)
    src = np.zeros(g.nc)
    q = g.pore_volume.sum() / (300 * DAY)
    src[0] = q
    src[-1] = -q
    outs = []
    for tr in ("implicit", "reorder"):
        sim = SimulatorIncompTwophase(g, props, src, gravity_on=False,
                                      transport=tr)
        state, _ = sim.run(np.zeros(g.nc), dt=3 * DAY, num_steps=8)
        outs.append(np.asarray(state.sw))
    assert np.max(np.abs(outs[0] - outs[1])) < 1e-6
