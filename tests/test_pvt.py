"""PVT evaluation vs hand-computed table values (the role of
/root/reference/tests/test_boprops_ad.cpp)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case
from opm_tpu.props.blackoil import BlackoilProps

PSI = 6894.757293168361
CP = 1e-3
STB = 0.158987294928
MSCF = 28.316846592
RS = MSCF / STB   # Mscf/stb -> sm3/sm3
SPE1 = os.path.join(os.path.dirname(__file__), "..", "data", "SPE1CASE2.DATA")


@pytest.fixture(scope="module")
def props():
    return BlackoilProps.from_case(load_case(SPE1))


def test_pvtw(props):
    # at reference pressure: b = 1/Bref, mu = mu_ref
    p = jnp.asarray([4014.7 * PSI])
    assert float(props.b_water(p, 0)[0]) == pytest.approx(1 / 1.029, rel=1e-12)
    assert float(props.mu_water(p, 0)[0]) == pytest.approx(0.31 * CP)
    # compressibility expansion
    p2 = jnp.asarray([5014.7 * PSI])
    x = 3.13e-6 * 1000.0
    assert float(props.b_water(p2, 0)[0]) == pytest.approx(
        (1 + x + x * x / 2) / 1.029, rel=1e-12)


def test_pvdg_interpolation(props):
    # exactly at a node: b = 1/Bg
    p = jnp.asarray([2014.7 * PSI])
    b_exp = 1.0 / (1.614 * STB / MSCF)
    assert float(props.b_gas(p, jnp.zeros(1), 0)[0]) == pytest.approx(
        b_exp, rel=1e-12)
    assert float(props.mu_gas(p, jnp.zeros(1), 0)[0]) == pytest.approx(
        0.0189 * CP, rel=1e-12)
    # midpoint: 1/B and 1/(B mu) interpolate linearly
    pm = jnp.asarray([(2014.7 + 2514.7) / 2 * PSI])
    ib = 0.5 * (1 / 1.614 + 1 / 1.294) / (STB / MSCF)
    assert float(props.b_gas(pm, jnp.zeros(1), 0)[0]) == pytest.approx(
        ib, rel=1e-12)


def test_pvto_saturated(props):
    # node: rs = 0.93 Mscf/stb at 3014.7 psia, Bo = 1.565, mu = 0.594
    p = jnp.asarray([3014.7 * PSI])
    rs = props.rs_sat(p, 0)
    assert float(rs[0]) == pytest.approx(0.93 * RS, rel=1e-12)
    b = props.b_oil(p, rs, 0)
    assert float(b[0]) == pytest.approx(1 / 1.565, rel=1e-12)
    assert float(props.mu_oil(p, rs, 0)[0]) == pytest.approx(0.594 * CP,
                                                             rel=1e-12)


def test_pvto_undersaturated(props):
    # rs = 1.27 record has undersaturated branch: at p=5014.7, Bo=1.671
    rs = jnp.asarray([1.27 * RS])
    p = jnp.asarray([5014.7 * PSI])
    assert float(props.b_oil(p, rs, 0)[0]) == pytest.approx(1 / 1.671,
                                                            rel=1e-9)
    assert float(props.mu_oil(p, rs, 0)[0]) == pytest.approx(0.549 * CP,
                                                             rel=1e-9)
    # at 9014.7: Bo=1.579, mu=0.74
    p2 = jnp.asarray([9014.7 * PSI])
    assert float(props.b_oil(p2, rs, 0)[0]) == pytest.approx(1 / 1.579,
                                                             rel=1e-9)


def test_pvto_undersat_borrowing(props):
    """Records without undersaturated data borrow the relative compressibility
    of the nearest record that has it: b must increase with p at fixed rs."""
    rs = jnp.asarray([0.371 * RS])
    p1 = jnp.asarray([1014.7 * PSI])
    p2 = jnp.asarray([3014.7 * PSI])
    b1 = float(props.b_oil(p1, rs, 0)[0])
    b2 = float(props.b_oil(p2, rs, 0)[0])
    assert b2 > b1
    assert b1 == pytest.approx(1 / 1.295, rel=1e-12)


def test_rs_sat_differentiable(props):
    drs_dp = jax.grad(lambda p: props.rs_sat(p, 0))(4500.0 * PSI)
    # between nodes 4014.7 (1.27) and 5014.7 (1.618): slope in Mscf/stb/psi
    slope = (1.618 - 1.27) / 1000.0 * RS / PSI
    assert float(drs_dp) == pytest.approx(slope, rel=1e-9)


def test_densities(props):
    LBF3 = 16.018463373960142
    p = jnp.asarray([4014.7 * PSI])
    rs = props.rs_sat(p, 0)
    rho_o = float(props.rho_oil(p, rs, 0)[0])
    expected = (53.66 * LBF3 + 1.27 * RS * 0.0533 * LBF3) / 1.695
    assert rho_o == pytest.approx(expected, rel=1e-9)


def test_rock(props):
    p = jnp.asarray([14.7 * PSI])
    assert float(props.pv_mult(p, 0)[0]) == pytest.approx(1.0)
    p2 = jnp.asarray([1014.7 * PSI])
    x = 3e-6 * 1000
    assert float(props.pv_mult(p2, 0)[0]) == pytest.approx(1 + x + x * x / 2)


def test_rocktab():
    """ROCKTAB pv/trans multipliers (RockCompressibility poroMult/transMult)."""
    import jax.numpy as jnp
    import numpy as np

    from opm_tpu.props.pvt import RockTabPVT

    rt = RockTabPVT.from_tables([np.array(
        [[1e5, 0.9, 0.5], [1e7, 1.0, 1.0], [2e7, 1.05, 1.2]])])
    p = jnp.asarray([1e5, 1e7, 2e7, 1.5e7])
    assert np.allclose(np.asarray(rt.pv_mult(p, 0)),
                       [0.9, 1.0, 1.05, 1.025])
    assert np.allclose(np.asarray(rt.trans_mult(p, 0)),
                       [0.5, 1.0, 1.2, 1.1])
