"""Compressible two-phase (sim_2p_comp_reorder analogue): closed-box
pressurization, incompressible limit, surface-volume conservation, gravity
segregation columns."""
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.grid import cartesian_grid
from opm_tpu.models.twophase import TwophaseModel
from opm_tpu.props.comp_twophase import CompTwophaseProps
from opm_tpu.props.incomp import IncompProps
from opm_tpu.sim.comp_twophase import SimulatorCompressibleTwophase

DAY = 86400.0


def test_no_flow_equilibrium():
    """Zero source, no gravity: the pressure Newton returns immediately at
    the initial pressure (residual is exactly zero)."""
    g = cartesian_grid((5, 5, 1), (50.0, 50.0, 1.0), perm=1e-13)
    props = CompTwophaseProps.analytic()
    sim = SimulatorCompressibleTwophase(g, props, np.zeros(g.nc),
                                        gravity_on=False)
    st = sim.initial_state(np.full(g.nc, 2e7), np.full(g.nc, 0.3))
    st2, rep = sim.run(st, dt=10 * DAY, num_steps=1)
    assert np.allclose(np.asarray(st2.pressure), 2e7)
    assert np.allclose(np.asarray(st2.sw), 0.3)


def test_closed_box_pressurization():
    """Injection into a closed box raises pressure by ~ q dt / (pv ct)."""
    g = cartesian_grid((4, 4, 1), (40.0, 40.0, 1.0), perm=1e-12, poro=0.2)
    c_w, c_o = 5e-10, 5e-10
    props = CompTwophaseProps.analytic(c_w=c_w, c_o=c_o, p_ref=2e7)
    src = np.zeros(g.nc)
    pv_tot = g.pore_volume.sum()
    q = pv_tot * 1e-9          # slow volumetric injection
    src[0] = q
    sim = SimulatorCompressibleTwophase(g, props, src, gravity_on=False)
    sw0 = np.full(g.nc, 0.5)
    st = sim.initial_state(np.full(g.nc, 2e7), sw0)
    dt = 20 * DAY
    st2, rep = sim.run(st, dt=dt, num_steps=1)
    p2 = np.asarray(st2.pressure)
    ct = 0.5 * c_w + 0.5 * c_o
    dp_expect = q * dt / (pv_tot * ct)
    assert np.mean(p2) - 2e7 == pytest.approx(dp_expect, rel=0.05)
    assert rep.pressure_newton_iters >= 1


def test_incompressible_limit_matches_twophase():
    """With vanishing compressibility the quarter-five-spot water flood
    reproduces the incompressible stack's saturation field."""
    g = cartesian_grid((12, 12, 1), (120.0, 120.0, 1.0), perm=1e-13,
                       poro=0.2)
    mu = (1e-3, 4e-3)
    comp = CompTwophaseProps.analytic(c_w=1e-16, c_o=1e-16, mu=mu,
                                      p_ref=2e7)
    incomp = IncompProps(viscosity=mu, density=(1000.0, 800.0), exponent=2.0)
    src = np.zeros(g.nc)
    q = g.pore_volume.sum() / (400 * DAY)
    src[0] = q
    src[-1] = -q
    dt = 4 * DAY

    sim_c = SimulatorCompressibleTwophase(g, comp, src, gravity_on=False,
                                          pin_cell=0, pin_val=2e7)
    st = sim_c.initial_state(np.full(g.nc, 2e7), np.zeros(g.nc))
    st_c, _ = sim_c.run(st, dt=dt, num_steps=10)

    model_i = TwophaseModel(g, incomp, gravity_on=False)
    sw = jnp.zeros(g.nc)
    for _ in range(10):
        _, flux, _, _ = model_i.pressure_solve(sw, src)
        sw, _, _ = model_i.transport_solve(sw, flux, src, dt)

    # same physics; the two stacks differ only in the face-mobility
    # discretization of the pressure stage (arithmetic average in
    # ifs_tpfa vs phase-potential upwinding in cfs_tpfa), so the
    # saturation fields agree closely but not to solver tolerance
    diff = np.abs(np.asarray(st_c.sw) - np.asarray(sw))
    assert np.mean(diff) < 5e-3
    assert np.max(diff) < 3e-2


def test_surface_volume_conservation():
    """Total water surface volume obeys: d(sum pv z_w) = dt * injected
    surface rate - dt * produced surface rate."""
    g = cartesian_grid((10, 1, 1), (100.0, 1.0, 1.0), perm=1e-13, poro=0.2)
    props = CompTwophaseProps.analytic(c_w=4e-10, c_o=2e-9, p_ref=2e7)
    src = np.zeros(g.nc)
    q = g.pore_volume.sum() / (500 * DAY)
    src[0] = q
    src[-1] = -q
    sim = SimulatorCompressibleTwophase(g, props, src, gravity_on=False)
    st = sim.initial_state(np.full(g.nc, 2e7), np.zeros(g.nc))
    dt = 5 * DAY
    nsteps = 8
    model = sim.model

    stored0 = float((np.asarray(model.pore_volume(st.pressure))
                     * np.asarray(st.z[0])).sum())
    st2, rep = sim.run(st, dt=dt, num_steps=nsteps)
    stored1 = float((np.asarray(model.pore_volume(st2.pressure))
                     * np.asarray(st2.z[0])).sum())
    produced = sum(rep.water_prod_surface) * dt
    # injected water converts at the (evolving) injection-cell b_w; bound
    # with the initial-pressure value and a loose tolerance
    injected = float(q * np.asarray(props.b_w(st2.pressure))[0]) * dt * nsteps
    assert stored1 - stored0 + produced == pytest.approx(injected, rel=2e-2)


def test_gravity_segregation_column():
    """Mixed 50/50 vertical column segregates: water (heavy) accumulates at
    the bottom, water volume is conserved, profile is monotone."""
    g = cartesian_grid((1, 1, 16), (1.0, 1.0, 32.0), perm=5e-13, poro=0.25)
    props = CompTwophaseProps.analytic(c_w=4e-10, c_o=1e-9,
                                       rho_s=(1000.0, 700.0), p_ref=2e7)
    sim = SimulatorCompressibleTwophase(g, props, np.zeros(g.nc),
                                        gravity_on=True)
    sw = np.full(g.nc, 0.5)
    p = 2e7 + 900.0 * 9.80665 * g.depth       # rough hydrostatic
    st = sim.initial_state(p, sw)
    model = sim.model
    s = jnp.asarray(sw)
    total0 = float((np.asarray(s) * g.pore_volume).sum())
    for _ in range(30):
        s, _ = model.gravity_segregation(s, st.pressure, 5 * DAY)
    s = np.asarray(s)
    assert (s * g.pore_volume).sum() == pytest.approx(total0, rel=1e-8)
    assert np.all(np.diff(s) > -1e-9)         # monotone with depth
    assert s[-1] > 0.9 and s[0] < 0.1         # segregated end state


def test_rock_compressibility_pv():
    """comprock variant: with ROCK compressibility the same injection gives
    a smaller pressure rise (extra pore-volume storage)."""
    from opm_tpu.props.pvt import RockPVT
    g = cartesian_grid((4, 1, 1), (40.0, 1.0, 1.0), perm=1e-12, poro=0.2)
    props = CompTwophaseProps.analytic(c_w=5e-10, c_o=5e-10, p_ref=2e7)
    src = np.zeros(g.nc)
    src[0] = g.pore_volume.sum() * 1e-9
    rock = RockPVT.from_tables([dict(p_ref=2e7, comp=1e-9)])
    st0p = np.full(g.nc, 2e7)
    sw0 = np.full(g.nc, 0.5)
    outs = []
    for rk in (None, rock):
        sim = SimulatorCompressibleTwophase(g, props, src, gravity_on=False,
                                            rock=rk)
        st = sim.initial_state(st0p, sw0)
        st2, _ = sim.run(st, dt=20 * DAY, num_steps=1)
        outs.append(float(np.mean(np.asarray(st2.pressure))))
    assert outs[1] < outs[0] - 1.0
