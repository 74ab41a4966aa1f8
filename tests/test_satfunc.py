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


def test_family2_matches_family1():
    """SWFN/SGFN/SOF3 built from the SPE1 SWOF/SGOF data must evaluate to
    the same relperm/capillary (family-2 resampling correctness)."""
    import numpy as np
    from opm_tpu.io.eclstate import load_case
    from opm_tpu.props.satfunc import SatFuncFamily1
    case = load_case(SPE1)
    swof = case.tables["SWOF"][0]
    sgof = case.tables["SGOF"][0]
    swco = swof[0, 0]
    # family-2 tables: SWFN (sw, krw, pcow); SGFN (sg, krg, pcgo);
    # SOF3 over so: krow at so=1-sw (reverse sw rows), krog at so=1-sg-swco
    swfn = [swof[:, [0, 1, 3]]]
    sgfn = [sgof[:, [0, 1, 3]]]
    so_w = (1.0 - swof[:, 0])[::-1]
    krow_w = swof[:, 2][::-1]
    so_g = (1.0 - sgof[:, 0] - swco)[::-1]
    krog_g = sgof[:, 2][::-1]
    so = np.unique(np.concatenate([so_w, so_g]))
    sof3 = [np.column_stack([so, np.interp(so, so_w, krow_w),
                             np.interp(so, so_g, krog_g)])]
    f1 = SatFuncFamily1.from_tables([swof], [sgof])
    f2 = SatFuncFamily1.from_family2(swfn, sgfn, sof3)
    rng = np.random.RandomState(0)
    sw = jnp.asarray(rng.uniform(0.12, 0.9, 50))
    sg = jnp.asarray(rng.uniform(0.0, 0.5, 50))
    sg = jnp.minimum(sg, 1.0 - sw)
    reg = jnp.zeros(50, dtype=jnp.int32)
    k1 = f1.relperm(sw, 1 - sw - sg, sg, reg)
    k2 = f2.relperm(sw, 1 - sw - sg, sg, reg)
    for a, b in zip(k1, k2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_endpoint_scaling():
    """Two-point horizontal + vertical scaling (satfuncEPS_* analogue)."""
    import numpy as np
    from opm_tpu.io.eclstate import load_case
    from opm_tpu.props.satfunc import EndpointScaling, SatFuncFamily1
    case = load_case(SPE1)
    f = SatFuncFamily1.from_case(case)
    n = 4
    f.eps = EndpointScaling(
        swl=jnp.full(n, 0.2),          # shift connate 0.12 -> 0.2
        swu=jnp.full(n, 0.9),          # max 1.0 -> 0.9
        krw_max=jnp.full(n, 2e-5))     # table max 1e-5 -> 2e-5
    reg = jnp.zeros(n, dtype=jnp.int32)
    # at the scaled connate, krw == 0; at scaled max, krw == scaled maximum
    sw = jnp.asarray([0.2, 0.9, 0.55, 0.1])
    krw, kro, krg = f.relperm(sw, 1 - sw, jnp.zeros(n), reg)
    assert float(krw[0]) == pytest.approx(0.0, abs=1e-12)
    assert float(krw[1]) == pytest.approx(2e-5, rel=1e-9)
    # midpoint maps to table midpoint 0.56: krw_tab(0.56)*2
    from opm_tpu.props.satfunc import _interp_reg
    sw_tab = 0.12 + (0.55 - 0.2) * (1.0 - 0.12) / (0.9 - 0.2)
    expect = float(_interp_reg(f.sw, f.krw, jnp.asarray([sw_tab]),
                               jnp.zeros(1, dtype=jnp.int32))[0]) * 2.0
    assert float(krw[2]) == pytest.approx(expect, rel=1e-9)


def test_killough_gas_hysteresis():
    """Killough scanning curve: on drainage (sg == sgmax) krg equals the
    drainage table; after gas retreat krg is reduced and vanishes at the
    Land trapped saturation (EHYSTR/IMBNUM capability,
    BlackoilPropsAdFromDeck::updateSatHyst + EclHysteresisTwoPhaseLaw)."""
    import jax.numpy as jnp
    import numpy as np

    from opm_tpu.props.satfunc import HysteresisConfig, SatFuncFamily1

    # region 0 = drainage (sgcr 0.0), region 1 = imbibition (sgcr 0.3)
    sgof_d = [[0.0, 0.0, 0.9, 0.0], [0.3, 0.2, 0.4, 0.0],
              [0.8, 0.9, 0.0, 0.0]]
    sgof_i = [[0.0, 0.0, 0.9, 0.0], [0.3, 0.0, 0.4, 0.0],
              [0.8, 0.9, 0.0, 0.0]]
    swof = [[0.2, 0.0, 0.9, 0.0], [1.0, 1.0, 0.0, 0.0]]
    sf = SatFuncFamily1.from_tables(
        [np.asarray(swof), np.asarray(swof)],
        [np.asarray(sgof_d), np.asarray(sgof_i)])
    nc = 5
    sf.hyst = HysteresisConfig(imbnum=jnp.ones(nc, dtype=jnp.int32))
    reg = jnp.zeros(nc, dtype=jnp.int32)
    sgmax = jnp.full(nc, 0.6)
    sg = jnp.asarray([0.6, 0.5, 0.4, 0.3, 0.2])
    sw = jnp.full(nc, 0.2)
    so = 1.0 - sw - sg

    _, _, krg_h = sf.relperm(sw, so, sg, reg, sgmax=sgmax)
    _, _, krg_d = sf.relperm(sw, so, sg, reg)
    krg_h = np.asarray(krg_h)
    krg_d = np.asarray(krg_d)
    # on the drainage branch they agree
    assert np.isclose(krg_h[0], krg_d[0])
    # scanning curve lies below drainage after retreat
    assert (krg_h[1:] <= krg_d[1:] + 1e-12).all()
    assert krg_h[1] < krg_d[1]
    # trapped gas: sg_trap for sgmax=0.6 with C from the curves
    sgcr_d, sgcr_i, sgtab = 0.0, 0.3, 0.8
    C = 1.0 / (sgcr_i - sgcr_d) - 1.0 / (sgtab - sgcr_d)
    sg_trap = sgcr_d + (0.6 - sgcr_d) / (1.0 + C * (0.6 - sgcr_d))
    # below the trapped saturation the scanning krg is ~0
    assert krg_h[np.asarray(sg) <= sg_trap + 1e-9].max() < 1e-10
    # monotone in sg
    assert (np.diff(krg_h[::-1]) >= -1e-12).all()
