"""Thermal PVT wrappers (Thermal*PvtWrapper analogue)."""
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.props.comp_twophase import CompTwophaseProps
from opm_tpu.props.thermal import ThermalWrapper


def test_thermal_viscosity_scaling():
    base = CompTwophaseProps.analytic(mu=(1e-3, 4e-3), p_ref=2e7)
    # WATVISCT: viscosity halves from 300K to 400K
    visct = np.array([[300.0, 1.0e-3], [400.0, 0.5e-3]])
    w300 = ThermalWrapper.wrap(base.water, 300.0, visct=visct,
                               viscref_p=2e7)
    w350 = ThermalWrapper.wrap(base.water, 350.0, visct=visct,
                               viscref_p=2e7)
    mu300 = float(w300.mu(jnp.asarray(2e7)))
    mu350 = float(w350.mu(jnp.asarray(2e7)))
    # at the reference temperature row the correction is visct/mu_ref = 1
    assert mu300 == pytest.approx(1e-3, rel=1e-12)
    assert mu350 == pytest.approx(0.75e-3, rel=1e-12)
    # b unchanged without a density record
    assert float(w300.b(jnp.asarray(2e7))) == pytest.approx(
        float(base.water.b(jnp.asarray(2e7))), rel=1e-12)


def test_thermal_density_expansion():
    base = CompTwophaseProps.analytic(p_ref=2e7)
    dent = dict(t_ref=293.15, c1=3e-4, c2=3e-6)
    dT = 50.0
    w = ThermalWrapper.wrap(base.water, 293.15 + dT, dent=dent)
    alpha = 1 + 3e-4 * dT + 3e-6 * dT * dT
    assert float(w.b(jnp.asarray(2e7))) == pytest.approx(
        float(base.water.b(jnp.asarray(2e7))) / alpha, rel=1e-12)
    # oil THERMEX1 linear expansion
    o = ThermalWrapper.wrap(base.oil, 293.15 + dT, thermex1=2e-4,
                            tref=293.15)
    assert float(o.b(jnp.asarray(2e7))) == pytest.approx(
        float(base.oil.b(jnp.asarray(2e7))) / (1 + 2e-4 * dT), rel=1e-12)


def test_thermal_deck_roundtrip():
    from opm_tpu.io.eclstate import load_case_string
    deck = """
RUNSPEC
DIMENS
 2 1 1 /
OIL
WATER
THERMAL
METRIC
TABDIMS
 1 1 /
GRID
DXV
 10.0 10.0 /
DYV
 10.0 /
DZV
 5.0 /
TOPS
 2*1000.0 /
PORO
 2*0.3 /
PERMX
 2*100.0 /
PROPS
PVTW
 200.0 1.02 4.0E-5 0.5 0.0 /
PVCDO
 200.0 1.05 6.0E-5 2.0 0.0 /
DENSITY
 800.0 1000.0 1.0 /
VISCREF
 200.0 0.0 /
WATVISCT
 20.0 0.6
 100.0 0.3 /
OILVISCT
 20.0 2.2
 100.0 1.0 /
WATDENT
 20.0 3.0E-4 3.0E-6 /
RTEMP
 80.0 /
END
"""
    case = load_case_string(deck)
    t = case.tables
    assert "WATVISCT" in t and "OILVISCT" in t
    assert t["WATVISCT"][0][0, 0] == pytest.approx(293.15)
    assert t["WATDENT"][0]["c1"] == pytest.approx(3e-4)
    assert t["RTEMP"] == pytest.approx(80.0 + 273.15)
    from opm_tpu.props.thermal import ThermalCompTwophaseProps
    props = ThermalCompTwophaseProps.from_case_thermal(case, t["RTEMP"])
    # reference semantics (ThermalOilPvtWrapper.hpp:138-163): at the
    # VISCREF pressure, mu(p_ref, T) = visct(T) exactly — the table value
    # replaces the isothermal one there
    mu = float(props.mu_w(jnp.asarray(200.0e5)))
    table_mu = np.interp(80.0 + 273.15, [293.15, 373.15], [0.6e-3, 0.3e-3])
    assert mu == pytest.approx(table_mu, rel=1e-9)


def test_thermal_props_in_compressible_sim():
    """Integration: hotter (less viscous) injected water advances further
    through the full compressible simulator."""
    from opm_tpu.grid import cartesian_grid
    from opm_tpu.sim.comp_twophase import SimulatorCompressibleTwophase

    DAY = 86400.0
    g = cartesian_grid((24, 1, 1), (24.0, 1.0, 1.0), perm=1e-13, poro=0.25)
    visct = np.array([[300.0, 1.0e-3], [450.0, 0.25e-3]])
    fronts = {}
    for T in (300.0, 430.0):
        props = CompTwophaseProps.analytic(c_w=4e-10, c_o=1e-9,
                                           mu=(1e-3, 3e-3), p_ref=2e7)
        props.water = ThermalWrapper.wrap(props.water, T, visct=visct,
                                          viscref_p=2e7)
        src = np.zeros(g.nc)
        q = g.pore_volume.sum() / (200 * DAY)
        src[0] = q
        src[-1] = -q
        sim = SimulatorCompressibleTwophase(g, props, src, gravity_on=False)
        st = sim.initial_state(np.full(g.nc, 2e7), np.zeros(g.nc))
        st, _ = sim.run(st, dt=2 * DAY, num_steps=12)
        fronts[T] = int(np.argmax(np.asarray(st.sw) < 0.05))
    assert fronts[430.0] > fronts[300.0]
