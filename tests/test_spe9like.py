"""SPE9-scale regression: 9000 heterogeneous cells, 26 wells, capillary
pressure, water zone (exercises the CPR path, dead-well fallback, and the
degenerate water-cell regularization; the flow_legacy SPE9 case analogue)."""
import numpy as np
import pytest

from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil, \
    fluid_in_place
from opm_tpu.sim.init import initial_state
from opm_tpu.sim.testcases import spe9like_case

DAY = 86400.0
STB = 0.158987294928


@pytest.mark.slow
def test_spe9like_runs_and_conserves():
    case = spe9like_case()
    sim = SimulatorFullyImplicitBlackoil(case)
    assert sim.solver.linear_solver == "cpr"
    state0 = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    fip0 = fluid_in_place(sim.model, state0)
    state = sim.run(report_step_limit=3)
    fip1 = fluid_in_place(sim.model, state)

    rows = sim.summary.rows
    times = [0.0] + [r["time"] * DAY for r in rows]
    net = np.zeros(3)
    for i, r in enumerate(rows):
        dt = times[i + 1] - times[i]
        net += dt * np.array([r["FWIR"] - r["FWPR"], r["FOIR"] - r["FOPR"],
                              r["FGIR"] - r["FGPR"]])
    dfip = fip1 - fip0
    for ph in range(3):
        scale = max(abs(fip0[ph]), abs(net[ph]), 1.0)
        assert abs(dfip[ph] - net[ph]) / scale < 1e-2, (ph, dfip, net)

    # water injector active, producers on target or BHP-limited
    r = rows[-1]
    assert r["FWIR"] * DAY / STB > 1000
    assert 0 < r["FOPR"] * DAY / STB < 25 * 1500 * 1.001
    # equilibration put a water zone below the WOC
    sw = np.asarray(state0.sw)
    deep = sim.grid.depth > 9950 * 0.3048
    assert np.all(sw[deep] > 0.99)


@pytest.mark.slow
def test_swatinit_scaling():
    """SWATINIT: initial sw honored, pcow rescaled per cell."""
    from opm_tpu.sim.testcases import spe9like_deck
    from opm_tpu.io.eclstate import load_case_string
    import re
    deck = spe9like_deck()
    # inject a SWATINIT array right after PORO (transition-zone-rich case)
    n = 24 * 25 * 15
    deck = deck.replace("PROPS", f"SWATINIT\n {n}*0.30 /\nPROPS", 1)
    case = load_case_string(deck)
    sim = SimulatorFullyImplicitBlackoil(case)
    st = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    sw = np.asarray(st.sw)
    # cells in the oil zone with pc > 0 take the requested 0.30
    depth_ft = sim.grid.depth / 0.3048
    oil_zone = depth_ft < 9900
    frac = (np.abs(sw[oil_zone] - 0.30) < 1e-9).mean()
    assert frac > 0.5, frac
    assert sim.props.satfunc.pcw_mult is not None


def test_swatinit_endscale_wells_e2e():
    """Regression (advisor r4, high): a SWATINIT or ENDSCALE deck with
    wells crashed inside well_cell_quantities_local — the perf-local
    saturations (nperf,) hit the full-grid (nc,) pcw_mult / EPS arrays
    baked into the satfunc ('mul got incompatible shapes for
    broadcasting'). Fixed by satfunc.local_view(pc_f). This steps the
    simulator end-to-end with BOTH features active."""
    import numpy as np

    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.sim.testcases import mini_blackoil_deck

    nx, ny, nz = 6, 6, 2
    n = nx * ny * nz
    deck = mini_blackoil_deck(nx=nx, ny=ny, nz=nz, tsteps="3*20")
    deck = deck.replace("TABDIMS\n/", "ENDSCALE\n/\nTABDIMS\n/", 1)
    deck = deck.replace("PROPS", f"SWATINIT\n {n}*0.3 /\nPROPS", 1)
    deck = deck.replace("DENSITY",
                        f"KRW\n {n}*0.9 /\nSWL\n {n}*0.15 /\nDENSITY", 1)
    case = load_case_string(deck)
    sim = SimulatorFullyImplicitBlackoil(case)
    assert sim.props.satfunc.eps is not None
    assert sim.props.satfunc.eps.krw_max is not None
    assert sim.props.satfunc.eps.swl is not None
    state = sim.run(report_step_limit=2)
    # SWATINIT pcow multiplier is installed by initial_state (inside run)
    assert sim.props.satfunc.pcw_mult is not None
    assert np.isfinite(np.asarray(state.pressure)).all()
    assert np.isfinite(np.asarray(state.bhp)).all()
    # the producer actually flows
    assert sim.summary.rows[-1]["FOPR"] > 0


@pytest.mark.compile_heavy
def test_hysteresis_e2e():
    """EHYSTR + IMBNUM end-to-end: the deck parses, sgmax threads through
    the fused Newton path, and the run stays conservative. Gas injected then
    retreating under hysteresis must leave MORE trapped gas (lower gas
    mobility) than the drainage-only run."""
    import jax.numpy as jnp
    import numpy as np

    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.testcases import mini_blackoil_deck

    deck = mini_blackoil_deck(nx=6, ny=6, nz=2, tsteps="4*20")
    # two satfunc regions: region 2 = imbibition curve (sgcr 0.2)
    deck = deck.replace("TABDIMS\n/", "TABDIMS\n 2 /")
    deck = deck.replace("""SWOF
 0.12 0       1     0
 0.3  0.0002  0.8   0
 0.5  0.005   0.35  0
 0.7  0.05    0.05  0
 0.88 0.15    0.0   0
 1.0  0.30    0.0   0 /""",
                        """SWOF
 0.12 0       1     0
 0.3  0.0002  0.8   0
 0.5  0.005   0.35  0
 0.7  0.05    0.05  0
 0.88 0.15    0.0   0
 1.0  0.30    0.0   0 /
 0.12 0       1     0
 0.3  0.0002  0.8   0
 0.5  0.005   0.35  0
 0.7  0.05    0.05  0
 0.88 0.15    0.0   0
 1.0  0.30    0.0   0 /""")
    deck = deck.replace("""SGOF
 0    0     1     0
 0.02 0     0.95  0
 0.2  0.08  0.35  0
 0.4  0.3   0.05  0
 0.6  0.6   0.005 0
 0.88 0.95  0.0   0 /""",
                        """SGOF
 0    0     1     0
 0.02 0     0.95  0
 0.2  0.08  0.35  0
 0.4  0.3   0.05  0
 0.6  0.6   0.005 0
 0.88 0.95  0.0   0 /
 0    0     1     0
 0.2  0     0.35  0
 0.4  0.3   0.05  0
 0.6  0.6   0.005 0
 0.88 0.95  0.0   0 /
EHYSTR
 0.1 0 /""")
    n = 6 * 6 * 2
    deck = deck.replace("SOLUTION",
                        f"REGIONS\nSATNUM\n {n}*1 /\nIMBNUM\n {n}*2 /\n"
                        "SOLUTION", 1)
    case = load_case_string(deck)
    sim = SimulatorFullyImplicitBlackoil(case)
    assert sim._hysteresis
    state = sim.run(report_step_limit=3)
    assert state.sgmax is not None
    sg = np.asarray(state.sgmax)
    assert np.isfinite(np.asarray(state.pressure)).all()
    assert (sg >= 0).all() and (sg <= 1).all()


@pytest.mark.compile_heavy
def test_hysteresis_span_matches_per_step():
    """The span path updates the sgmax/somax hysteresis memory at
    report-step start on device (fused_span._report_step); spans-on must
    reproduce the per-step trajectory and memory arrays."""
    import os as _os

    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.testcases import mini_blackoil_deck

    deck = mini_blackoil_deck(nx=5, ny=5, nz=2,
                          tsteps="2 3 5 10 2*15")
    deck = deck.replace("TABDIMS\n/", "TABDIMS\n 2 /")
    # region 2 = imbibition curves (higher critical gas)
    deck = deck.replace("""SGOF
 0    0     1     0
 0.02 0     0.95  0
 0.2  0.08  0.35  0
 0.4  0.3   0.05  0
 0.6  0.6   0.005 0
 0.88 0.95  0.0   0 /""",
                        """SGOF
 0    0     1     0
 0.02 0     0.95  0
 0.2  0.08  0.35  0
 0.4  0.3   0.05  0
 0.6  0.6   0.005 0
 0.88 0.95  0.0   0 /
 0    0     1     0
 0.2  0     0.35  0
 0.4  0.3   0.05  0
 0.6  0.6   0.005 0
 0.88 0.95  0.0   0 /
EHYSTR
 0.1 2 /""")
    swof = deck[deck.index("SWOF"):deck.index("SGOF")]
    tab = swof[len("SWOF"):].strip()
    deck = deck.replace(swof, "SWOF\n " + tab + "\n " + tab + "\n", 1)
    n = 5 * 5 * 2
    deck = deck.replace("SOLUTION",
                        f"REGIONS\nSATNUM\n {n}*1 /\nIMBNUM\n {n}*2 /\n"
                        "SOLUTION", 1)
    case = load_case_string(deck)

    def run(span):
        old = _os.environ.get("OPM_TPU_SPAN")
        if not span:
            _os.environ["OPM_TPU_SPAN"] = "1"
        try:
            sim = SimulatorFullyImplicitBlackoil(case, fused=True)
            st = sim.run()
            return sim, st
        finally:
            if not span:
                if old is None:
                    _os.environ.pop("OPM_TPU_SPAN", None)
                else:
                    _os.environ["OPM_TPU_SPAN"] = old

    sim_h, st_h = run(span=False)
    assert sim_h._hysteresis
    sim_s, st_s = run(span=True)
    assert sim_s._span_runner is not None, "hysteresis steps did not span"
    # regression: chunk-padding steps used to run one extra memory
    # update from the final state (span sgmax included the last step's
    # end state, which the per-step path never samples)
    np.testing.assert_allclose(np.asarray(st_s.sgmax),
                               np.asarray(st_h.sgmax), rtol=1e-6,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_s.somax),
                               np.asarray(st_h.somax), rtol=1e-6,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_s.pressure),
                               np.asarray(st_h.pressure), rtol=1e-5)
    assert float(np.asarray(st_s.sgmax).max()) > 0.0
