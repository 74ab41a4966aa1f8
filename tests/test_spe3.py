"""SPE3-class gas-condensate (VAPOIL) end-to-end: the rv <-> sg switching
path the reference exercises through its SPE3 regression
(compareECLFiles.cmake:107-112; switching semantics
BlackoilModelBase_impl.hpp:1232-1356). Drives a full depletion below the
dew point: undersaturated wet gas -> condensate dropout -> retrograde
liquid accumulation, with component mass conservation."""
import numpy as np
import pytest

from opm_tpu.models.state import (HC_GASOIL, HC_GASONLY, saturations)
from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil, \
    fluid_in_place
from opm_tpu.sim.testcases import spe3like_case

DAY = 86400.0
PSI = 6894.757293168361


@pytest.fixture(scope="module")
def run():
    case = spe3like_case()
    sim = SimulatorFullyImplicitBlackoil(case)
    import opm_tpu.sim.init as im
    state0 = im.initial_state(sim.grid, sim.props, case, 1)
    fip0 = fluid_in_place(sim.model, state0)
    state = sim.run()
    return case, sim, state0, fip0, state


def test_initializes_undersaturated_gas(run):
    case, sim, state0, fip0, state = run
    hc0 = np.asarray(state0.hcstate)
    assert (hc0 == HC_GASONLY).all()          # whole column is wet gas
    # undersaturated: rv (primary x) strictly below rv_sat at initial p
    rv0 = np.asarray(state0.x)
    rvs0 = np.asarray(sim.model.props.rv_sat(state0.pressure,
                                             sim.model.pvtnum))
    assert (rv0 < rvs0).all() and (rv0 > 0).all()
    sw0, so0, sg0 = [np.asarray(a) for a in saturations(state0)]
    assert so0.max() == 0.0 and sg0.min() > 0.8


def test_condensate_drops_out(run):
    """Depletion below the dew point condenses liquid: GASONLY cells
    switch to GASOIL and immobile condensate accumulates (retrograde)."""
    case, sim, state0, fip0, state = run
    hc = np.asarray(state.hcstate)
    assert (hc == HC_GASOIL).sum() > 200      # most cells switched
    sw, so, sg = [np.asarray(a) for a in saturations(state)]
    assert so.max() > 1e-3                    # condensate present
    assert so.max() < 0.05                    # ...but below mobility
    # remaining dry-gas cells keep a physical rv
    if (hc == HC_GASONLY).any():
        assert np.asarray(state.x)[hc == HC_GASONLY].min() >= 0.0


def test_retrograde_oil_rate(run):
    """Constant-GRAT depletion of a retrograde condensate: the produced
    oil-gas ratio tracks rv downward (liquid stays in the reservoir), so
    surface FOPR declines monotonically while reservoir condensate
    accumulates — the retrograde signature in black-oil form."""
    case, sim, state0, fip0, state = run
    fopr = sim.summary.series("FOPR") * DAY / 0.158987
    assert fopr[-1] < 0.5 * fopr[0]           # producing leaner gas
    # near-monotone decline (small switching wiggles allowed)
    assert np.all(np.diff(fopr) < 0.05 * fopr[0])
    fpr = sim.summary.series("FPR") / PSI
    assert fpr[-1] < 0.5 * fpr[0]             # deep depletion happened


def test_oil_component_mass_conservation(run):
    """Oil surface-volume balance: FIP decline == integral of produced
    oil (vapor + condensate both counted by the perforation rv transfer,
    StandardWells computeWellFlux)."""
    case, sim, state0, fip0, state = run
    fip_end = fluid_in_place(sim.model, state)
    produced_oil = fip0[1] - fip_end[1]
    assert produced_oil > 0
    # The MB tolerance is PORE-VOLUME-relative (tol_mb 1e-5 of pvSum per
    # substep, getConvergence:1770) while the oil component of a lean
    # condensate is ~2e-3 of pore volume — so the per-run closure bound on
    # the OIL component is O(10%) relative even though the field mass
    # balance is at reference tolerance. Gas (the dominant component)
    # must close tightly.
    t = sim.summary.series("time") * DAY
    fopr = sim.summary.series("FOPR")
    tt = np.concatenate([[0.0], t])
    oil_int = np.trapezoid(np.concatenate([[fopr[0]], fopr]), tt)
    assert oil_int == pytest.approx(produced_oil, rel=0.20)
    fgpr = sim.summary.series("FGPR")
    gas_int = np.trapezoid(np.concatenate([[fgpr[0]], fgpr]), tt)
    produced_gas = fip0[2] - fip_end[2]
    assert gas_int == pytest.approx(produced_gas, rel=1e-3)


# ---------------------------------------------------------------------------
# Gas cycling + blowdown (the PUBLISHED SPE3 study shape, Kenyon & Behie:
# deplete below the dew point, reinject dry separator gas, then blow the
# field down) — the harder VAPOIL direction: rv RISES where the dry front
# repressurizes saturated cells / re-vaporizes dropped-out condensate,
# then falls again in blowdown. Reference regression class:
# compareECLFiles.cmake:107-112; switching semantics
# BlackoilModelBase_impl.hpp:1232-1356.
# ---------------------------------------------------------------------------
DEPL_STEPS = "5 10 3*15 6*30"     # 240 days of depletion (11 steps)
CYCLE_TSTEPS = "10*30"            # 300 days of full dry-gas reinjection
BLOWDOWN_STEPS = "6*30"           # 180 days of blowdown
N_DEPL = 11
N_CYCLE_END = 21                  # report steps 11..20 are the cycle


@pytest.fixture(scope="module")
def cycled():
    case = spe3like_case(tsteps=DEPL_STEPS, cycling=True,
                         cycle_tsteps=CYCLE_TSTEPS,
                         blowdown_tsteps=BLOWDOWN_STEPS)
    sim = SimulatorFullyImplicitBlackoil(case)
    import opm_tpu.sim.init as im
    state0 = im.initial_state(sim.grid, sim.props, case,
                              len(sim.well_names))
    fip0 = fluid_in_place(sim.model, state0)
    snaps = []   # (t_days, rv, hcstate, so, pressure) per report step
    from opm_tpu.models.state import rs_rv

    def _collect(state, step):
        rv = np.asarray(rs_rv(state, sim.props, sim.model.pvtnum)[1])
        hc = np.asarray(state.hcstate)
        so = np.asarray(saturations(state)[1])
        p = np.asarray(state.pressure)
        snaps.append((step.end_time / DAY, rv, hc, so, p))

    sim.events.event("report_step_completed").add(_collect)
    state = sim.run()
    return case, sim, state0, fip0, state, snaps


def test_cycling_maintains_pressure(cycled, run):
    """Full dry-gas reinjection arrests the depletion-period pressure
    decline (vs the pure-depletion run at the same simulation time)."""
    _, sim_c, _, _, _, _ = cycled
    _, sim_d, _, _, _ = run
    t_c = sim_c.summary.series("time")
    t_d = sim_d.summary.series("time")
    fpr_c = sim_c.summary.series("FPR") / PSI
    fpr_d = sim_d.summary.series("FPR") / PSI
    t_cmp = t_c[N_CYCLE_END - 1]          # end of the cycling period
    (j,) = np.where(t_d == t_cmp)[0]
    assert fpr_c[N_CYCLE_END - 1] > fpr_d[j] + 100.0
    fgir = sim_c.summary.series("FGIR")
    assert fgir[N_DEPL:N_CYCLE_END].min() > 0.0   # injector ran
    assert fgir[:N_DEPL].max() == 0.0             # ...but not before


def test_rv_rises_under_injection(cycled):
    """The anti-depletion signature: rv INCREASES somewhere in the field
    while the injector runs (repressurized saturated cells track rv_sat
    upward; swept condensate re-vaporizes into undersaturated dry gas).
    Pure depletion can only decrease rv."""
    _, sim, _, _, _, snaps = cycled
    # scale: the deck's RVVD 0.0030 stb/Mscf is ~1.7e-5 sm3/sm3 in SI, so
    # "rv rose" means a rise that is a solid FRACTION of rv, not of 1.
    rv0 = snaps[0][1]
    rv_scale = float(rv0.max())
    # cumulative per-cell rise across the cycling period: cells that stay
    # saturated while the dry-gas flood repressurizes them track rv_sat(p)
    # upward step after step
    cum = np.maximum(snaps[N_CYCLE_END - 1][1] - snaps[N_DEPL - 1][1], 0.0)
    for k in range(N_DEPL, N_CYCLE_END):
        cum = np.maximum(cum, snaps[k][1] - snaps[N_DEPL - 1][1])
    rose = float(cum.max())
    assert rose > 0.10 * rv_scale, \
        f"rv never rose during injection (max rise {rose:.3e} vs " \
        f"scale {rv_scale:.3e})"
    # and during pure depletion it indeed only fell
    fell_only = all(float((snaps[k][1] - snaps[k - 1][1]).max())
                    <= 1e-3 * rv_scale for k in range(1, N_DEPL))
    assert fell_only


def test_condensate_revaporizes_in_swept_zone(cycled):
    """Cells swept by the dry-gas front lose their dropped-out condensate:
    so DECREASES during the cycling period (re-vaporization), and the
    field's total condensate volume shrinks."""
    _, sim, _, _, _, snaps = cycled
    pv = np.asarray(getattr(sim.model, "pv_out", sim.model.pv))
    drop = 0.0
    for k in range(N_DEPL, N_CYCLE_END):
        so_prev = snaps[k - 1][3]
        so_k = snaps[k][3]
        drop = max(drop, float((so_prev - so_k).max()))
    assert drop > 1e-4, "no condensate re-vaporization seen during cycling"
    cond_depl_end = float((snaps[N_DEPL - 1][3] * pv).sum())
    cond_cycle_end = float((snaps[N_CYCLE_END - 1][3] * pv).sum())
    assert cond_cycle_end < cond_depl_end


def test_blowdown_after_shut(cycled):
    """After the injector shuts, the field blows down: FGIR -> 0, FPR
    declines, and condensate drops out again (so rises)."""
    _, sim, _, _, state, snaps = cycled
    fgir = sim.summary.series("FGIR")
    fpr = sim.summary.series("FPR") / PSI
    assert fgir[N_CYCLE_END:].max() == 0.0
    assert fpr[-1] < fpr[N_CYCLE_END - 1] - 100.0
    so_end = np.asarray(saturations(state)[1])
    so_cycle_end = snaps[N_CYCLE_END - 1][3]
    assert so_end.max() > so_cycle_end.max()


def test_gas_balance_through_control_switches(cycled):
    """Component balance across BOTH control switches (injector OPEN at
    day 240, SHUT at day 540): gas FIP decline equals produced minus
    injected. Right-rectangle integration is EXACT here: rates are
    end-of-step sampled and piecewise constant per report step (constant
    GRAT/RATE controls), and unlike the trapezoid it does not smear the
    switch discontinuities."""
    _, sim, state0, fip0, state, _ = cycled
    fip_end = fluid_in_place(sim.model, state)
    t = sim.summary.series("time") * DAY
    dt = np.diff(np.concatenate([[0.0], t]))
    net = sim.summary.series("FGPR") - sim.summary.series("FGIR")
    net_int = float((net * dt).sum())
    assert net_int == pytest.approx(fip0[2] - fip_end[2], rel=2e-3)


def test_spe3_deck_file_loads_and_matches_synthetic():
    """data/SPE3.DATA (the on-disk ECL deck for this regression class) must
    parse to the same case the synthetic generator builds: same grid,
    VAPOIL phase config, PVTG table shape, and EQUIL/RVVD records."""
    import os

    from opm_tpu.io.eclstate import load_case

    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "SPE3.DATA")
    case_f = load_case(path)
    case_s = spe3like_case()
    assert case_f.runspec.dims == case_s.runspec.dims == (9, 9, 4)
    assert case_f.runspec.phases == case_s.runspec.phases
    assert case_f.runspec.vapoil and not case_f.runspec.disgas
    import jax

    leaves_f = jax.tree.leaves(case_f.tables["PVTG"])
    leaves_s = jax.tree.leaves(case_s.tables["PVTG"])
    assert len(leaves_f) == len(leaves_s)
    for a, b in zip(leaves_f, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    eq_f, eq_s = case_f.solution.equil[0], case_s.solution.equil[0]
    assert eq_f == eq_s
    np.testing.assert_allclose(case_f.solution.rvvd[0],
                               case_s.solution.rvvd[0])


def test_spe3_regression_pins(run):
    """Trajectory pins for the gas-condensate run (3% tolerance).

    Kenyon 1987 ('Third SPE Comparative Solution Project: Gas Cycling
    of Retrograde Condensate Reservoirs', JPT 39(8):981-997) published
    the SPE3 solution for ITS deck — a 9x9x4 grid with a specific
    PVT/kr data set this synthetic stand-in does not reproduce (the
    real SPE3 tables are licensed opm-tests data; this case,
    sim/testcases.spe3like_case, keeps the PHYSICS class: undersaturated
    wet gas depleting through the dew point with retrograde dropout,
    asserted qualitatively by the other tests here). Published absolute
    values therefore cannot anchor this deck; these pins freeze the
    converged trajectory of this framework instead, so conservative
    physics drift (PVT, rv switching, kr) still fails the suite."""
    _, sim, _, _, _ = run
    import numpy as np
    t = sim.summary.series("time")
    fpr = sim.summary.series("FPR") / PSI
    fopr = sim.summary.series("FOPR") * DAY / 0.158987294928

    def at(series, day):
        return series[int(np.argmin(np.abs(t - day)))]
    assert at(fpr, 210) == pytest.approx(2847.5, rel=0.03)
    assert at(fpr, 720) == pytest.approx(1106.6, rel=0.03)
    assert at(fopr, 210) == pytest.approx(75.09, rel=0.03)
    assert at(fopr, 720) == pytest.approx(25.68, rel=0.03)
