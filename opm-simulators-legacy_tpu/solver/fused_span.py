"""Fused report-step spans: the whole adaptive-substepping state machine
on device, scanned over chunks of report steps.

The reference runs one report step per AdaptiveTimeStepping::step call with
the substep/chop-retry loop on the host (AdaptiveTimeStepping_impl.hpp:
183-373).  On TPU through a dispatch tunnel that structure is latency-bound:
~300 ms of host round trips per report step on a 300-cell SPE1 whose device
compute is microseconds.  The TPU-native shape is to push the WHOLE report
step — substep while-loop, failure chopping, iteration-count dt control,
event dt reset — into one XLA program, and lax.scan it over a fixed-size
chunk of report steps, emitting per-step summary vectors on device.  One
host round trip per CHUNK of report steps instead of several per substep.

Semantics mirror solver/timestepping.py step() exactly — ALL THREE step
controllers (AdaptiveTimeStepping_impl.hpp:118-158): on failure restore
state, dt = max(dt*restart_factor, min_dt), up to solver_restart_max
retries; on success the next dt comes from the iterationcount controller
(dt *= clamp(target/its)), the PID-on-solution-change controller (error
history threaded through the scan carry AND handed back to the host so
span and per-step paths stay interchangeable mid-run), or pid+iteration;
growth is capped by failed_growth right after a restart; suggested_dt
carries across report steps.  A report step that exhausts its retries
marks the chunk `fatal` from that step on; the host falls back to the
per-step path for the whole span (state at span start is still on the
host).

Report steps are padded to the chunk length with zero durations (the
substep loop exits immediately; the host drops the pad rows) so every chunk
compiles to the same executable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.wells.wells import (CTRL_BHP, CTRL_GRAT, CTRL_LRAT, CTRL_ORAT,
                                 CTRL_SURFACE_RATE, CTRL_WRAT, GAS, OIL,
                                 WATER)


def reset_well_state(state, wd):
    """Device analogue of SimulatorFullyImplicitBlackoil._init_well_state
    (first=False): reset controls/targets to the schedule, re-seed bhp for
    BHP-controlled wells, and give all-zero-rate wells a control-consistent
    rate guess (WellStateFullyImplicitBlackoil::init semantics)."""
    ctrl = wd["primary_control"]
    tgt = wd["primary_target"]
    open_ = wd["open"].astype(bool)
    is_inj = wd["is_injector"].astype(bool)
    p_ref = state.pressure[wd["perf_cell"][:, 0]]   # shallowest perforation

    bhp = state.bhp
    bhp = jnp.where(open_ & (ctrl == CTRL_BHP), tgt, bhp)
    bhp = jnp.where(open_ & (ctrl != CTRL_BHP) & (bhp == 0.0),
                    p_ref * jnp.where(is_inj, 1.05, 0.95), bhp)

    # fresh-well rate guess (only where qs is identically zero)
    qs_zero = ~jnp.any(state.qs != 0.0, axis=1)
    inj_guess = wd["comp_frac"] * jnp.where(
        ctrl == CTRL_SURFACE_RATE, tgt, 0.0)[:, None]
    phase = jnp.select([ctrl == CTRL_ORAT, ctrl == CTRL_WRAT,
                        ctrl == CTRL_GRAT, ctrl == CTRL_LRAT],
                       [OIL, WATER, GAS, OIL], default=-1)
    prod_guess = jnp.where(
        (phase[:, None] == jnp.arange(3)[None, :]), -tgt[:, None], 0.0)
    guess = jnp.where(is_inj[:, None], inj_guess, prod_guess)
    qs = jnp.where((open_ & qs_zero)[:, None], guess, state.qs)

    # per-report-step group target distribution (device twin of the host's
    # resolve_group_controls re-resolution each report step,
    # wells/groups.py: guide rates = the members' CURRENT phase rates,
    # falling back to the span-start guides — which carry the host's
    # explicit-WGRUPCON / potentials fallbacks — when nothing flows yet)
    for spec in wd.get("groups", ()):
        code, pv, total, mask, guides0, sign = spec[:6]
        # gpv: the GUIDE-RATE phase vector (None = explicit/static guides,
        # WGRUPCON); distinct from pv, the CONTROL phase vector (LRAT
        # controls water+oil but guides on oil, groups.py _PHASE_OF)
        gpv = spec[6] if len(spec) > 6 else None
        m = (mask > 0.0) & open_
        if gpv is None:
            g = jnp.where(m, guides0, 0.0)
        else:
            cur = jnp.maximum(sign * (state.qs @ gpv), 0.0)
            g = jnp.where(m, cur, 0.0)
            g = jnp.where(jnp.sum(g) > 0.0, g, jnp.where(m, guides0, 0.0))
        share = g / jnp.maximum(jnp.sum(g), 1e-300)
        ctrl = jnp.where(m, jnp.full_like(ctrl, code), ctrl)
        tgt = jnp.where(m, total * share, tgt)

    # closed (SHUT/STOP) wells mirror _init_well_state: BHP-classified
    # with bhp pinned AT the limit (a zero bhp can never escape the
    # relative dbhp chop) and zero rates
    closed = ~open_
    bhp = jnp.where(closed, wd["bhp_limit"], bhp)
    qs = jnp.where(closed[:, None], 0.0, qs)
    ctrl = jnp.where(closed, CTRL_BHP, ctrl)
    tgt = jnp.where(closed, wd["bhp_limit"], tgt)
    return state._replace(bhp=bhp, qs=qs, control=ctrl, target=tgt)


class SpanStats(NamedTuple):
    """Per-report-step counters (stacked over the chunk)."""
    substeps: jnp.ndarray
    failed: jnp.ndarray
    newtons: jnp.ndarray
    linears: jnp.ndarray
    fatal: jnp.ndarray


def summary_arrays(model, state, region_spec=None, block_cells=None):
    """Device-side summary payload per report step:
    (qs, bhp, fpr, fip, region, block) with region = (rpr, rfip) per-FIPNUM
    reductions and block = requested cell pressures (None when the deck's
    SUMMARY section doesn't ask for them).  The host expands these into the
    SummaryCollector row (field rates, GOR/WCT ratios, cumulatives)."""
    pv = getattr(model, "pv_out", model.pv)
    fpr = jnp.sum(state.pressure * pv) / jnp.sum(pv)
    vol = model.accumulation(state) * pv[None, :]          # (3, nc)
    fip = jnp.sum(vol, axis=1)
    region = None
    if region_spec is not None:
        fipnum, nreg = region_spec
        fipnum = jnp.asarray(np.asarray(fipnum), dtype=jnp.int32)
        ok = fipnum >= 0
        reg = jnp.where(ok, fipnum, 0)
        wpv = jnp.where(ok, pv, 0.0)
        rpv = jax.ops.segment_sum(wpv, reg, num_segments=nreg)
        rppv = jax.ops.segment_sum(state.pressure * wpv, reg,
                                   num_segments=nreg)
        rpr = rppv / jnp.maximum(rpv, 1e-300)
        rfip = jax.ops.segment_sum(
            jnp.where(ok[None, :], vol, 0.0).T, reg,
            num_segments=nreg)                              # (nreg, 3)
        region = (rpr, rfip)
    block = None
    if block_cells:
        cells = jnp.asarray([c for _, c in block_cells], dtype=jnp.int32)
        block = state.pressure[cells]
    return state.qs, state.bhp, fpr, fip, region, block


class FusedSpanRunner:
    """Owns the jitted chunk program for one (solver, ts-params, chunk)."""

    def __init__(self, solver, ts_params, chunk: int = 16, *,
                 region_spec=None, block_cells=None, emit_states=False,
                 hysteresis=False, vappars=False):
        self.solver = solver
        self.p = ts_params
        self.chunk = chunk
        self.region_spec = region_spec
        self.block_cells = tuple(block_cells or ())
        self.emit_states = emit_states    # stack per-step states (restart/
        #                                   vtk/matlab output with spans on)
        self.hysteresis = hysteresis      # sgmax update at step start
        self.vappars = vappars            # somax update at step start
        # cache key for reuse across Simulator instances (sim/blackoil.py)
        self.summary_key = (None if region_spec is None
                            else int(region_spec[1]), self.block_cells,
                            emit_states, hysteresis, vappars)
        self._jit = jax.jit(self._span)

    # -- device program ---------------------------------------------------
    def _solution_change(self, s0, s1):
        """Device twin of timestepping._solution_change (the PID error
        measure): rms relative pressure change + rms saturation-like
        change — bit-compatible so span and per-step PID trajectories
        stay interchangeable."""
        ep = jnp.sqrt(jnp.mean(((s1.pressure - s0.pressure)
                                / jnp.maximum(jnp.abs(s1.pressure), 1.0))
                               ** 2))
        es = jnp.sqrt(jnp.mean((s1.sw - s0.sw) ** 2))
        xs = jnp.maximum(jnp.abs(s1.x), 1.0)
        es = es + jnp.sqrt(jnp.mean(((s1.x - s0.x) / xs) ** 2))
        return jnp.maximum(ep + es, 1e-12)

    def _report_step(self, state, dt_sugg, errs, duration, event, wd):
        p = self.p
        solver = self.solver
        # PAD steps (duration 0, chunk-length filler) must be pure
        # no-ops: without the guard they ran the hysteresis-memory
        # update and the well-state reset one extra time from the FINAL
        # state — the span's sgmax then included the last step's end
        # state (the host path, like the reference's per-report-step
        # updateSatHyst, never samples it) and the emitted final well
        # controls were reset to the schedule.
        live = duration > 0.0

        def _keep(new_state):
            return jax.tree.map(lambda a, b: jnp.where(live, a, b),
                                new_state, state)

        if self.hysteresis:
            # updateSatHyst at report-step start (SimulatorBase_impl.hpp:146)
            from opm_tpu.models.state import saturations as _sats
            state = _keep(state._replace(
                sgmax=jnp.maximum(state.sgmax, _sats(state)[2])))
        if self.vappars or self.hysteresis:
            # satOilMax + oil-hysteresis reversal memory
            from opm_tpu.models.state import saturations as _sats
            state = _keep(state._replace(
                somax=jnp.maximum(state.somax, _sats(state)[1])))
        state = _keep(reset_well_state(state, wd))
        dt0 = jnp.minimum(jnp.minimum(dt_sugg, duration), p.max_dt)
        if p.event_reset:
            dt0 = jnp.where(event, jnp.minimum(p.initial_dt, duration), dt0)

        def cond(c):
            (_s, remaining, _dt, _errs, _restarts, _jf, _nsub, _nfail,
             _nnewt, _nlin, fatal) = c
            return (remaining > 1e-6) & ~fatal

        def body(c):
            (s, remaining, dt, errs, restarts, just_failed, nsub, nfail,
             nnewt, nlin, fatal) = c
            dt_try = jnp.minimum(dt, remaining)
            s2, done, bad, it, lin, _hist = solver._fused_substep(
                s, dt_try, wd)
            success = done & ~bad
            restarts2 = jnp.where(success, restarts, restarts + 1)
            fatal = fatal | (~success & (restarts2 > p.solver_restart_max))
            # failure: chop (AdaptiveTimeStepping_impl.hpp:244-372)
            dt_fail = jnp.maximum(dt_try * p.restart_factor, p.min_dt)
            # success: the configured step controller
            its = jnp.maximum(it - 1, 1)
            if p.controller.startswith("pid"):
                # PID on relative solution change (PIDTimeStepControl):
                # dt' = dt (e1/e2)^kP (tol/e2)^kI (e1^2/(e2 e0))^kD
                e = self._solution_change(s, s2)
                errs2 = jnp.stack([errs[1], errs[2], e])
                e0, e1, e2 = errs2[0], errs2[1], errs2[2]
                factor = ((e1 / e2) ** p.pid_kP
                          * (p.pid_tol / e2) ** p.pid_kI
                          * ((e1 * e1) / (e2 * e0)) ** p.pid_kD)
                if p.controller == "pid+iteration":
                    factor = jnp.where(
                        its > p.target_iterations,
                        jnp.minimum(factor, p.target_iterations / its),
                        factor)
                grow = jnp.clip(factor, 0.1, p.growth_factor)
            else:
                # iteration-count growth (SimpleIterationCount semantics)
                errs2 = errs
                grow = jnp.minimum(
                    p.growth_factor,
                    jnp.maximum(0.1, p.target_iterations / its))
            cap = jnp.where(just_failed, p.failed_growth, p.growth_factor)
            dt_ok = jnp.clip(dt_try * jnp.minimum(grow, cap),
                             p.min_dt, p.max_dt)
            s = jax.tree.map(lambda a, b: jnp.where(success, a, b), s2, s)
            errs = jnp.where(success, errs2, errs)
            remaining = remaining - jnp.where(success, dt_try, 0.0)
            dt = jnp.where(success, dt_ok, dt_fail)
            return (s, remaining, dt, errs, restarts2, ~success,
                    nsub + success.astype(jnp.int32),
                    nfail + (~success).astype(jnp.int32),
                    nnewt + jnp.where(success, jnp.maximum(it - 1, 0), 0),
                    nlin + jnp.where(success, lin, 0), fatal)

        z = jnp.asarray(0, dtype=jnp.int32)
        init = (state, duration, dt0, errs, z, jnp.asarray(False),
                z, z, z, z, jnp.asarray(False))
        (state, _rem, dt, errs, _re, _jf, nsub, nfail, nnewt, nlin,
         fatal) = jax.lax.while_loop(cond, body, init)
        # pad steps (duration 0) must not clobber the carried suggestion:
        # dt0 was clamped to the zero duration before the loop exited
        dt = jnp.where(duration > 0.0, dt, dt_sugg)
        return state, dt, errs, SpanStats(nsub, nfail, nnewt, nlin, fatal)

    def _span(self, state, durations, events, dt_sugg, errs, wd):
        def scan_body(carry, inp):
            state, dt_sugg, errs, fatal_in = carry
            duration, event = inp
            # a fatal earlier step poisons the rest of the chunk: zero the
            # remaining durations so their substep loops exit immediately
            duration = jnp.where(fatal_in, 0.0, duration)
            state, dt_sugg, errs, stats = self._report_step(
                state, dt_sugg, errs, duration, event, wd)
            fatal = fatal_in | stats.fatal
            summ = summary_arrays(self.solver.model, state,
                                  self.region_spec, self.block_cells)
            out_state = None
            if self.emit_states:
                # derived output quantities computed ON DEVICE per step and
                # stacked with the states — the host pulls everything in one
                # batched transfer per chunk instead of re-deriving rs/rv
                # through per-step device round trips (VERDICT r3 #2: the
                # 4.4x output-on penalty was tunnel-latency, not bytes)
                from opm_tpu.models.state import rs_rv, saturations
                model = self.solver.model
                sw_, so_, sg_ = saturations(state)
                rs_, rv_ = rs_rv(state, model.props, model.pvtnum)
                out_state = (state, (sw_, sg_, rs_, rv_))
            # per-step stepper state (dt suggestion + PID error history):
            # lets the host RESUME mid-chunk — e.g. the econ-limit rewind
            # commits steps up to the first violation and restarts there
            return ((state, dt_sugg, errs, fatal),
                    (summ, stats, out_state, (dt_sugg, errs)))

        (state, dt_sugg, errs, _f), (summs, stats, states,
                                     stepper) = jax.lax.scan(
            scan_body, (state, dt_sugg, errs, jnp.asarray(False)),
            (durations, events))
        return state, dt_sugg, errs, summs, stats, states, stepper

    # -- host front end ---------------------------------------------------
    def run_chunk(self, state, durations, events, suggested_dt, wd,
                  pid_errors=None):
        """durations/events: python sequences with len <= chunk; returns
        (state, suggested_dt, pid_errors, summaries, stats, states,
        stepper) with pad rows dropped.  summaries is a list of
        (qs, bhp, fpr, fip, region, block) numpy tuples per real report
        step; states is the stacked per-step (state, (sw, sg, rs, rv))
        pytree (emit_states) or None; stepper = (dt_sugg (n,),
        pid_errors (n, 3)) per step, for mid-chunk resume (econ rewind).
        Raises nothing — the caller checks stats.fatal."""
        n = len(durations)
        assert n <= self.chunk
        dur = np.zeros(self.chunk)
        ev = np.zeros(self.chunk, dtype=bool)
        dur[:n] = durations
        ev[:n] = events
        if pid_errors is None:
            pid_errors = [self.p.pid_tol] * 3
        state, dt_sugg, errs, summs, stats, states, stepper = self._jit(
            state, jnp.asarray(dur), jnp.asarray(ev),
            jnp.asarray(float(suggested_dt)),
            jnp.asarray(np.asarray(pid_errors, dtype=np.float64)), wd)
        stats = SpanStats(*[np.asarray(a)[:n] for a in stats])
        qs, bhp, fpr, fip, region, block = jax.tree.map(np.asarray, summs)
        summaries = [
            (qs[i], bhp[i], fpr[i], fip[i],
             None if region is None else (region[0][i], region[1][i]),
             None if block is None else block[i])
            for i in range(n)]
        stepper = (np.asarray(stepper[0])[:n], np.asarray(stepper[1])[:n])
        return (state, float(dt_sugg), [float(e) for e in np.asarray(errs)],
                summaries, stats, states, stepper)
