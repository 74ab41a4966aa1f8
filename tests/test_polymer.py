"""Polymer flooding (sim_poly2p_* analogue): Todd-Longstaff properties,
coupled (s,c) transport, conservation and retardation."""
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.grid import cartesian_grid
from opm_tpu.props.incomp import IncompProps
from opm_tpu.props.polymer import PolymerProperties
from opm_tpu.sim.polymer import PolymerInflow, SimulatorPolymer

DAY = 86400.0


def _props():
    visc = jnp.asarray([[0.0, 1.0], [1.0, 4.0], [5.0, 20.0]])
    ads = jnp.asarray([[0.0, 0.0], [5.0, 2e-5]])
    poly = PolymerProperties(c_max=5.0, mix_param=1.0, rock_density=2000.0,
                             dead_pore_vol=0.05, res_factor=1.0,
                             visc_table=visc, ads_table=ads)
    props = IncompProps(viscosity=(0.5e-3, 2e-3), density=(1000.0, 850.0),
                        exponent=2.0)
    return props, poly


def test_todd_longstaff_limits():
    _, poly = _props()
    mu_w = 0.5e-3
    # no polymer: effective viscosity = water viscosity
    mw0, mp0 = poly.effective_viscosities(jnp.asarray(0.0), mu_w)
    assert float(mw0) == pytest.approx(mu_w, rel=1e-12)
    # c_max, omega = 1 (fully mixed): both = mu_m(cmax) = 20 mu_w
    mwm, mpm = poly.effective_viscosities(jnp.asarray(5.0), mu_w)
    assert float(mwm) == pytest.approx(20 * mu_w, rel=1e-9)
    assert float(mpm) == pytest.approx(20 * mu_w, rel=1e-9)
    # viscosity increases monotonically with c
    cs = jnp.linspace(0, 5.0, 20)
    mws = jnp.stack([poly.effective_viscosities(ci, mu_w)[0] for ci in cs])
    assert np.all(np.diff(np.asarray(mws)) > -1e-15)


def test_polymer_slug_conservation_and_retardation():
    nx = 60
    g = cartesian_grid((nx, 1, 1), (60.0, 1.0, 1.0), perm=1e-13, poro=0.25)
    props, poly = _props()
    src = np.zeros(g.nc)
    q = g.pore_volume.sum() / (100 * DAY)
    src[0] = q
    src[-1] = -q
    sim = SimulatorPolymer(g, props, poly, src,
                           PolymerInflow(0.0, 1e30, 2.0))
    state, rep = sim.run(np.zeros(g.nc), dt=2 * DAY, num_steps=15)
    sw = np.asarray(state.sw)
    c = np.asarray(state.c)
    # polymer stays inside water: c <= c_max, zero beyond the water front
    assert c.max() <= 5.0 + 1e-9
    water_front = np.argmax(sw < 1e-6)
    poly_front = np.argmax(c < 1e-6)
    assert 0 < poly_front <= water_front  # retarded by adsorption + dps
    # mass balance: injected = in solution + adsorbed + produced
    dps = poly.dead_pore_vol
    rock = poly.rock_density * (1 - g.poro) / g.poro
    in_solution = ((1 - dps) * sw * c * g.pore_volume).sum()
    adsorbed = (np.asarray(poly.adsorption(jnp.asarray(c),
                                           state.cmax)) * rock
                * g.pore_volume).sum()
    total = in_solution + adsorbed + rep.produced_polymer
    assert total == pytest.approx(rep.injected_polymer, rel=5e-3)


def test_polymer_slows_water():
    """Higher water viscosity from polymer -> slower water front."""
    nx = 40
    g = cartesian_grid((nx, 1, 1), (40.0, 1.0, 1.0), perm=1e-13, poro=0.25)
    props, poly = _props()
    src = np.zeros(g.nc)
    q = g.pore_volume.sum() / (100 * DAY)
    src[0] = q
    src[-1] = -q
    sim_p = SimulatorPolymer(g, props, poly, src,
                             PolymerInflow(0.0, 1e30, 5.0))
    st_p, _ = sim_p.run(np.zeros(g.nc), dt=2 * DAY, num_steps=10)
    sim_0 = SimulatorPolymer(g, props, poly, src,
                             PolymerInflow(0.0, 1e30, 0.0))
    st_0, _ = sim_0.run(np.zeros(g.nc), dt=2 * DAY, num_steps=10)
    # with polymer, injected water is more viscous -> piston-like, the
    # no-polymer flood fingers further (front further along)
    f_p = np.argmax(np.asarray(st_p.sw) < 0.02)
    f_0 = np.argmax(np.asarray(st_0.sw) < 0.02)
    assert f_p <= f_0
    # and saturations behind the polymer front are higher (better sweep)
    assert np.asarray(st_p.sw)[2] > np.asarray(st_0.sw)[2]


def test_plyshlog_shear_thinning():
    """PLYSHLOG: high water velocity reduces the polymer viscosity
    contribution (PolymerProperties computeShearMultLog capability)."""
    import jax.numpy as jnp
    import numpy as np

    from opm_tpu.props.polymer import PolymerProperties

    poly = PolymerProperties(
        c_max=4.0,
        visc_table=jnp.asarray([[0.0, 1.0], [4.0, 10.0]]),
        shear_table=jnp.asarray([[1e-7, 1.0], [1e-5, 0.8], [1e-3, 0.3]]))
    c = jnp.full(3, 2.0)
    v = jnp.asarray([1e-7, 1e-5, 1e-3])
    z = np.asarray(poly.shear_mult(v))
    assert np.allclose(z, [1.0, 0.8, 0.3])
    # log interpolation: halfway in log-space between 1e-5 and 1e-3
    z_mid = float(poly.shear_mult(jnp.asarray([1e-4]))[0])
    assert abs(z_mid - 0.55) < 1e-12
    # shear-thinned multiplier stays >= 1 and decreases with velocity
    m = np.asarray(poly.visc_mult_shear(c, v))
    assert (np.diff(m) < 0).all() and (m >= 1.0).all()
    # effective water mobility factor increases (thinner solution)
    f = np.asarray(poly.water_mob_factor(c, 1e-3, v_w=v))
    assert (np.diff(f) > 0).all()


def test_polymer_gravity_segregation():
    """Coupled (s, c) column segregation (solveGravity /
    GravityColumnSolverPolymer role): water sinks carrying its polymer,
    polymer mass (solution + adsorbed) is conserved, and c stays inside
    the water."""
    import jax.numpy as jnp

    from opm_tpu.models.polymer import PolymerTwophaseModel

    g = cartesian_grid((1, 1, 12), (1.0, 1.0, 24.0), perm=1e-12, poro=0.25)
    props, poly = _props()
    model = PolymerTwophaseModel(g, props, poly, gravity_on=True)
    nc = g.nc
    # mixed column, polymer only in the upper half's water
    s = jnp.full(nc, 0.5)
    c = jnp.asarray(np.where(np.arange(nc) < 6, 2.0, 0.0))
    cmax = c
    rock = poly.rock_density * (1 - g.poro) / g.poro

    def poly_mass(s_, c_):
        sol = (1 - poly.dead_pore_vol) * np.asarray(s_) * np.asarray(c_) \
            * g.pore_volume
        ads = np.asarray(poly.adsorption(jnp.asarray(c_),
                                         jnp.maximum(cmax, c_))) * rock \
            * g.pore_volume
        return sol.sum() + ads.sum()

    m0 = poly_mass(s, c)
    DAY = 86400.0
    for _ in range(25):
        s, c, _ = model.gravity_segregation_polymer(s, c, cmax, 5 * DAY)
        cmax = jnp.maximum(cmax, c)
    s_np = np.asarray(s)
    c_np = np.asarray(c)
    # water segregated downward (slower than clean water: the polymer
    # thickens it)
    assert s_np[-1] > 0.85 and s_np[0] < 0.15
    # polymer followed the water down: the initially-clean bottom half now
    # holds a substantial share of the dissolved polymer (counter-current
    # migration is slow; initially it held none)
    bottom = (c_np[-6:] * s_np[-6:] * g.pore_volume[-6:]).sum()
    total = (c_np * s_np * g.pore_volume).sum()
    assert bottom > 0.25 * total
    assert c_np.max() <= poly.c_max * 1.1 + 1e-9
    # total polymer conserved through the segregation
    m1 = poly_mass(s, c)
    assert m1 == pytest.approx(m0, rel=5e-2)


def test_implicit_transport_matches_reorder():
    """SinglePointUpwindTwoPhasePolymer / ImplicitTransport role: the
    global-Newton coupled (s, c) solve must converge to the same
    discrete solution as the wavefront-reordered sweeps (both discretize
    with single-point upwind on the same fixed total flux)."""
    from opm_tpu.models.polymer import PolymerTwophaseModel

    nx = 30
    g = cartesian_grid((nx, 1, 1), (30.0, 1.0, 1.0), perm=1e-13, poro=0.25)
    props, poly = _props()
    model = PolymerTwophaseModel(g, props, poly, gravity_on=False)
    src = np.zeros(g.nc)
    q = g.pore_volume.sum() / (120 * DAY)
    src[0] = q
    src[-1] = -q
    src_c = np.zeros(g.nc)
    src_c[0] = q * 2.0          # inject at 2 kg/m3
    s0 = np.full(g.nc, 0.1)
    c0 = np.zeros(g.nc)
    cmax0 = np.zeros(g.nc)
    p, flux, q_bc, _ = model.pressure_solve_polymer(
        jnp.asarray(s0), c0, cmax0, src)
    dt = 4 * DAY

    s_imp, c_imp, cmax_imp, iters, rn = model.implicit_transport(
        s0, c0, cmax0, flux, jnp.asarray(src), jnp.asarray(src_c), dt)
    assert float(rn) < 1e-8
    dtpv = dt / (np.asarray(model.porosity) * np.asarray(model.volume))
    # reorder path through the sweep transport entry
    out = model._polymer_transport(jnp.asarray(s0), jnp.asarray(c0),
                                   jnp.asarray(cmax0), flux,
                                   jnp.asarray(src), jnp.asarray(src_c),
                                   jnp.asarray(dtpv), sweeps=60)
    s_re, c_re = np.asarray(out[0]), np.asarray(out[1])
    assert np.max(np.abs(np.asarray(s_imp) - s_re)) < 1e-5
    assert np.max(np.abs(np.asarray(c_imp) - c_re)) < 1e-4
    # physics: injected polymer front behind the water front
    assert np.asarray(c_imp)[0] > 1.0
    assert np.asarray(s_imp)[0] > s0[0]
