"""Compressible polymer flooding (sim_poly2p_comp_reorder analogue):
zero-polymer limit, incompressible limit, slug conservation/retardation."""
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.grid import cartesian_grid
from opm_tpu.props.comp_twophase import CompTwophaseProps
from opm_tpu.props.incomp import IncompProps
from opm_tpu.props.polymer import PolymerProperties
from opm_tpu.sim.comp_twophase import SimulatorCompressibleTwophase
from opm_tpu.sim.polymer import (PolymerInflow, SimulatorCompressiblePolymer,
                                 SimulatorPolymer)

DAY = 86400.0


def _poly():
    visc = jnp.asarray([[0.0, 1.0], [1.0, 4.0], [5.0, 20.0]])
    ads = jnp.asarray([[0.0, 0.0], [5.0, 2e-5]])
    return PolymerProperties(c_max=5.0, mix_param=1.0, rock_density=2000.0,
                             dead_pore_vol=0.05, res_factor=1.0,
                             visc_table=visc, ads_table=ads)


def _case(nx=40, pvi_days=100):
    g = cartesian_grid((nx, 1, 1), (float(nx), 1.0, 1.0), perm=1e-13,
                       poro=0.25)
    src = np.zeros(g.nc)
    q = g.pore_volume.sum() / (pvi_days * DAY)
    src[0] = q
    src[-1] = -q
    return g, src


def test_zero_polymer_matches_comp_twophase():
    """c_inj = 0 reduces exactly to the compressible two-phase stack."""
    g, src = _case()
    cprops = CompTwophaseProps.analytic(c_w=4e-10, c_o=1.5e-9,
                                        mu=(0.5e-3, 2e-3), p_ref=2e7)
    poly = _poly()
    sim_p = SimulatorCompressiblePolymer(g, cprops, poly, src,
                                         PolymerInflow(0.0, 1e30, 0.0),
                                         gravity_on=False)
    st = sim_p.initial_state(np.full(g.nc, 2e7), np.zeros(g.nc))
    st_p, _ = sim_p.run(st, dt=2 * DAY, num_steps=8)

    sim_t = SimulatorCompressibleTwophase(g, cprops, src, gravity_on=False)
    st2 = sim_t.initial_state(np.full(g.nc, 2e7), np.zeros(g.nc))
    st_t, _ = sim_t.run(st2, dt=2 * DAY, num_steps=8)

    assert np.max(np.abs(np.asarray(st_p.c))) < 1e-12
    assert np.max(np.abs(np.asarray(st_p.sw) - np.asarray(st_t.sw))) < 1e-6
    assert np.max(np.abs(np.asarray(st_p.pressure)
                         - np.asarray(st_t.pressure))) < 1.0


def test_incompressible_limit_matches_polymer():
    """Vanishing compressibility reproduces SimulatorPolymer's (s, c)."""
    g, src = _case()
    poly = _poly()
    mu = (0.5e-3, 2e-3)
    cprops = CompTwophaseProps.analytic(c_w=1e-16, c_o=1e-16, mu=mu,
                                        rho_s=(1000.0, 850.0), p_ref=2e7)
    iprops = IncompProps(viscosity=mu, density=(1000.0, 850.0), exponent=2.0)

    sim_c = SimulatorCompressiblePolymer(g, cprops, poly, src,
                                         PolymerInflow(0.0, 1e30, 2.0),
                                         gravity_on=False, pin_cell=0,
                                         pin_val=2e7)
    st = sim_c.initial_state(np.full(g.nc, 2e7), np.zeros(g.nc))
    st_c, _ = sim_c.run(st, dt=2 * DAY, num_steps=10)

    sim_i = SimulatorPolymer(g, iprops, poly, src,
                             PolymerInflow(0.0, 1e30, 2.0),
                             gravity_on=False)
    st_i, _ = sim_i.run(np.zeros(g.nc), dt=2 * DAY, num_steps=10)

    assert np.max(np.abs(np.asarray(st_c.sw) - np.asarray(st_i.sw))) < 2e-2
    assert np.max(np.abs(np.asarray(st_c.c) - np.asarray(st_i.c))) < 0.15
    # fronts at the same cell
    assert (np.argmax(np.asarray(st_c.c) < 1e-6)
            == np.argmax(np.asarray(st_i.c) < 1e-6))


def test_comp_polymer_slug_conservation():
    """Injected polymer = in-solution + adsorbed + produced (compressible
    accounting with b factors; loose tolerance for the evolving pressure)."""
    g, src = _case(nx=50)
    poly = _poly()
    cprops = CompTwophaseProps.analytic(c_w=4e-10, c_o=1e-9,
                                        mu=(0.5e-3, 2e-3), p_ref=2e7)
    sim = SimulatorCompressiblePolymer(g, cprops, poly, src,
                                       PolymerInflow(0.0, 1e30, 2.0),
                                       gravity_on=False)
    st = sim.initial_state(np.full(g.nc, 2e7), np.zeros(g.nc))
    st, rep = sim.run(st, dt=2 * DAY, num_steps=12)
    sw = np.asarray(st.sw)
    c = np.asarray(st.c)
    assert c.max() <= 5.0 + 1e-9
    # retardation: polymer front strictly behind the water front
    water_front = np.argmax(sw < 1e-6)
    poly_front = np.argmax(c < 1e-6)
    assert 0 < poly_front <= water_front
    dps = poly.dead_pore_vol
    rock = poly.rock_density * (1 - g.poro) / g.poro
    pv = np.asarray(sim.model.pore_volume(st.pressure))
    in_solution = ((1 - dps) * sw * c * pv).sum()
    adsorbed = (np.asarray(poly.adsorption(jnp.asarray(c), st.cmax)) * rock
                * pv).sum()
    total = in_solution + adsorbed + rep.produced_polymer
    assert total == pytest.approx(rep.injected_polymer, rel=3e-2)
