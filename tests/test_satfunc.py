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


def _hyst_family():
    """Two-region stack: region 0 = drainage, region 1 = imbibition with
    higher critical (trapped) nonwetting saturations for BOTH gas
    (sgcr 0.0 -> 0.3) and oil (sowcr 0.2 -> 0.4), plus distinct pcow
    bounding curves for the pc-scanning test."""
    import numpy as np

    # krow = 0 at sw >= 0.8 (drainage, sowcr 0.2) / sw >= 0.6 (imb, 0.4)
    from opm_tpu.props.satfunc import SatFuncFamily1

    swof_d = [[0.2, 0.0, 0.9, 2.0e5], [0.5, 0.2, 0.4, 1.0e5],
              [0.8, 0.6, 0.0, 0.4e5], [1.0, 1.0, 0.0, 0.0]]
    swof_i = [[0.2, 0.0, 0.9, 1.0e5], [0.5, 0.2, 0.15, 0.5e5],
              [0.6, 0.3, 0.0, 0.3e5], [1.0, 1.0, 0.0, 0.0]]
    sgof_d = [[0.0, 0.0, 0.9, 0.0], [0.3, 0.2, 0.4, 0.0],
              [0.8, 0.9, 0.0, 0.0]]
    sgof_i = [[0.0, 0.0, 0.9, 0.0], [0.3, 0.0, 0.4, 0.0],
              [0.8, 0.9, 0.0, 0.0]]
    return SatFuncFamily1.from_tables(
        [np.asarray(swof_d), np.asarray(swof_i)],
        [np.asarray(sgof_d), np.asarray(sgof_i)])


def test_hysteresis_cycle_land_endpoints_all_phases():
    """VERDICT r4 #5: two-way drainage-imbibition cycle with Killough
    scanning on BOTH nonwetting phases (gas via sgmax, oil via somax),
    Land-trapping endpoints, wetting water on its bounding curve, and
    Killough curvature pc scanning (EHYSTR item 1)."""
    import jax.numpy as jnp
    import numpy as np

    from opm_tpu.props.satfunc import HysteresisConfig

    sf = _hyst_family()
    nc = 5
    sf.hyst = HysteresisConfig(imbnum=jnp.ones(nc, dtype=jnp.int32),
                               kr_model=2, pc_hyst=True, curvature=0.1)
    reg = jnp.zeros(nc, dtype=jnp.int32)

    # ---- gas (memory sgmax = 0.6), water fixed at connate ----
    sgmax = jnp.full(nc, 0.6)
    sg = jnp.asarray([0.6, 0.5, 0.4, 0.34286, 0.2])
    sw = jnp.full(nc, 0.2)
    so = 1.0 - sw - sg
    krw_h, kro_h, krg_h = sf.relperm(sw, so, sg, reg, sgmax=sgmax,
                                     somax=jnp.full(nc, float(so[0])))
    krw_d, kro_d, krg_d = sf.relperm(sw, so, sg, reg)
    krg_h, krg_d = np.asarray(krg_h), np.asarray(krg_d)
    assert np.isclose(krg_h[0], krg_d[0])          # drainage branch
    assert krg_h[1] < krg_d[1]                     # scanning below drainage
    # Land trapped gas: C = 1/(0.3-0) - 1/(0.8-0); sg_trap(0.6)
    C = 1.0 / 0.3 - 1.0 / 0.8
    sg_trap = 0.6 / (1.0 + C * 0.6)
    v_trap = sf.relperm(sw, so, jnp.full(nc, sg_trap), reg,
                        sgmax=sgmax)[2]
    assert float(np.asarray(v_trap)[0]) == pytest.approx(0.0, abs=1e-10)

    # ---- oil (memory somax = 0.6): water flood pushes so down ----
    somax = jnp.full(nc, 0.6)
    so2 = jnp.asarray([0.6, 0.5, 0.45, 0.4, 0.35])
    sw2 = 1.0 - so2                                # two-phase ow
    sg2 = jnp.zeros(nc)
    krw_h2, kro_h2, _ = sf.relperm(sw2, so2, sg2, reg, somax=somax)
    krw_d2, kro_d2, _ = sf.relperm(sw2, so2, sg2, reg)
    kro_h2, kro_d2 = np.asarray(kro_h2), np.asarray(kro_d2)
    assert np.isclose(kro_h2[0], kro_d2[0], rtol=1e-9)  # reversal point
    assert (kro_h2[1:] <= kro_d2[1:] + 1e-12).all()
    assert kro_h2[2] < kro_d2[2]
    # Land trapped oil: sowcr_d 0.2, sowcr_i 0.4, so_tab_max 0.8
    Co = 1.0 / (0.4 - 0.2) - 1.0 / (0.8 - 0.2)
    dso = 0.6 - 0.2
    so_trap = 0.2 + dso / (1.0 + Co * dso)
    v = sf.relperm(1.0 - jnp.full(nc, so_trap), jnp.full(nc, so_trap),
                   sg2, reg, somax=somax)[1]
    assert float(np.asarray(v)[0]) == pytest.approx(0.0, abs=1e-10)
    # ---- water (wetting) stays on its bounding drainage curve ----
    assert np.allclose(np.asarray(krw_h2), np.asarray(krw_d2))

    # ---- pc scanning: drainage at the reversal sw, imbibition at sw_ma,
    # in between strictly between the bounding curves ----
    sw_hy = 1.0 - 0.6                              # = 0.4
    pcd = np.asarray(sf.capillary(sw2, sg2, reg)[0])
    pci = np.asarray(sf.capillary(sw2, sg2, jnp.ones(nc, jnp.int32))[0])
    pch = np.asarray(sf.capillary(sw2, sg2, reg, somax=somax)[0])
    at_rev = np.isclose(np.asarray(sw2), sw_hy)
    assert np.allclose(pch[at_rev], pcd[at_rev], rtol=1e-9)
    mid = ~at_rev
    assert (pch[mid] <= pcd[mid] + 1e-9).all()
    assert (pch[mid] >= pci[mid] - 1e-9).all()
    pch_ma = np.asarray(sf.capillary(jnp.full(nc, 1.0), sg2, reg,
                                     somax=somax)[0])
    pci_ma = np.asarray(sf.capillary(jnp.full(nc, 1.0), sg2,
                                     jnp.ones(nc, jnp.int32))[0])
    assert np.allclose(pch_ma, pci_ma, atol=1e-9)


def test_hysteresis_carlson_model():
    """Carlson scanning (EHYSTR item 2 = 0/1): shifted imbibition curve
    passes through the reversal point and lies at/below drainage."""
    import jax.numpy as jnp
    import numpy as np

    from opm_tpu.props.satfunc import HysteresisConfig

    sf = _hyst_family()
    nc = 4
    sf.hyst = HysteresisConfig(imbnum=jnp.ones(nc, dtype=jnp.int32),
                               kr_model=0, pc_hyst=False)
    reg = jnp.zeros(nc, dtype=jnp.int32)
    sgmax = jnp.full(nc, 0.6)
    sg = jnp.asarray([0.6, 0.5, 0.4, 0.3])
    sw = jnp.full(nc, 0.2)
    so = 1.0 - sw - sg
    _, _, krg_h = sf.relperm(sw, so, sg, reg, sgmax=sgmax)
    _, _, krg_d = sf.relperm(sw, so, sg, reg)
    krg_h, krg_d = np.asarray(krg_h), np.asarray(krg_d)
    assert np.isclose(krg_h[0], krg_d[0])
    assert (krg_h[1:] <= krg_d[1:] + 1e-12).all()
    assert krg_h[1] < krg_d[1]
    assert (krg_h >= -1e-15).all()
