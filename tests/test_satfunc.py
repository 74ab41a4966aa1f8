"""Saturation functions vs table values (role of
/root/reference/tests/test_satfunc.cpp)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.io.eclstate import load_case
from opm_tpu.props.blackoil import BlackoilProps

SPE1 = os.path.join(os.path.dirname(__file__), "..", "data", "SPE1CASE2.DATA")


@pytest.fixture(scope="module")
def sf():
    return BlackoilProps.from_case(load_case(SPE1)).satfunc


def z(n=1):
    return jnp.zeros(n, dtype=jnp.int32)


def test_endpoints(sf):
    assert float(sf.swco[0]) == pytest.approx(0.12)


def test_krw_nodes(sf):
    sw = jnp.asarray([0.3])
    krw, kro, krg = sf.relperm(sw, 1 - sw, jnp.zeros(1), z())
    assert float(krw[0]) == pytest.approx(4.18388429752066e-7)
    # two-phase oil-water: kro = krow(sw) (sg = 0)
    assert float(kro[0]) == pytest.approx(0.98)
    assert float(krg[0]) == pytest.approx(0.0)


def test_krg_nodes(sf):
    sw = jnp.asarray([0.12])  # connate
    sg = jnp.asarray([0.2])
    krw, kro, krg = sf.relperm(sw, 1 - sw - sg, sg, z())
    assert float(krg[0]) == pytest.approx(0.075)
    # connate water: kro = krog(sg)
    assert float(kro[0]) == pytest.approx(0.35)


def test_three_phase_oil_interpolation(sf):
    """ECL default: kro = ((sw-swco) krow + sg krog)/(sw-swco+sg)."""
    sw = jnp.asarray([0.32])
    sg = jnp.asarray([0.15])
    krw, kro, krg = sf.relperm(sw, 1 - sw - sg, sg, z())
    # krow(0.32): interp between 0.3 (0.98) and 0.36 (0.7)
    krow = 0.98 + (0.32 - 0.3) / 0.06 * (0.7 - 0.98)
    # krog(0.15): interp between 0.12 (0.7) and 0.2 (0.35)
    krog = 0.7 + (0.15 - 0.12) / 0.08 * (0.35 - 0.7)
    expected = ((0.32 - 0.12) * krow + 0.15 * krog) / (0.32 - 0.12 + 0.15)
    assert float(kro[0]) == pytest.approx(expected, rel=1e-12)


def test_clamping(sf):
    # beyond table ends: clamp
    sw = jnp.asarray([1.1])
    krw, _, _ = sf.relperm(sw, jnp.zeros(1) - 0.1, jnp.zeros(1), z())
    assert float(krw[0]) == pytest.approx(1e-5)
