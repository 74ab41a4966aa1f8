"""SimulatorFullyImplicitBlackoil: the report-step driver.

Counterpart of /root/reference/opm/autodiff/SimulatorBase_impl.hpp:89-324:
report-step loop, per-step well rebuild (WellsManager analogue), adaptive
sub-stepping, FIP reporting, summary collection, and timing
(SimulatorReport). Also FlowMain's setup pipeline condensed
(/root/reference/opm/autodiff/FlowMain.hpp:131-180): grid+props from deck,
state init, simulator run.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, replace as dc_replace
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.grid import build_grid
from opm_tpu.io.eclstate import EclipseCase, load_case
from opm_tpu.io.schedule import build_schedule
from opm_tpu.models.blackoil import (BlackoilModel, ModelParams,
                                     make_well_device_arrays)
from opm_tpu.models.state import (GAS, OIL, WATER, BlackoilState, rs_rv,
                                  saturations)
from opm_tpu.parallel.io_gather import host_value, is_io_process
from opm_tpu.props.blackoil import BlackoilProps
from opm_tpu.sim.init import initial_state
from opm_tpu.solver.newton import NonlinearSolver, SolverReport
from opm_tpu.solver.timestepping import (AdaptiveTimeStepping,
                                         TimeStepControlParams)
from opm_tpu.wells.wells import (CTRL_BHP, CTRL_GRAT, CTRL_LRAT, CTRL_ORAT,
                                 CTRL_RESERVOIR_RATE, CTRL_RESV,
                                 CTRL_SURFACE_RATE, CTRL_THP, CTRL_WRAT,
                                 WellSet, build_well_set)

DAY = 86400.0


def _well_sets_equal(a: WellSet, b: WellSet) -> bool:
    """True when two padded WellSets describe identical device arrays —
    the condition for fusing consecutive report steps into one device
    span (the wells' wd pytree is a pure function of the WellSet)."""
    if a.names != b.names or a.nw != b.nw or a.max_perf != b.max_perf:
        return False
    import dataclasses
    for f in dataclasses.fields(a):
        x, y = getattr(a, f.name), getattr(b, f.name)
        if not isinstance(x, np.ndarray):
            continue
        eq = (np.array_equal(x, y, equal_nan=True)
              if x.dtype.kind in "fc" else np.array_equal(x, y))
        if not eq:
            return False
    return True


@dataclass
class SimulatorReportTotals:
    """Aggregated timing/iteration report (SimulatorReport analogue)."""
    total_time: float = 0.0
    assemble_time: float = 0.0
    linear_solve_time: float = 0.0
    substeps: int = 0
    failed_substeps: int = 0
    newton_iterations: int = 0
    linear_iterations: int = 0


class SummaryCollector:
    """Accumulates well/field time series (the BlackoilOutputWriter summary
    role, SimulatorFullyImplicitBlackoilOutput.hpp:206).

    With `requests` (the deck SUMMARY section, io/eclstate.py
    summary_requests) the collector additionally computes every requested
    vector it supports — per-well ratios/cumulatives, per-FIPNUM region
    pressure and in-place volumes, block pressures — and
    `requested_keys`/`unsupported` drive the ECL writer's vector selection
    and the PRT warning (the reference's SummaryConfig role, SURVEY §2.J)."""

    def __init__(self, well_names: List[str], requests=None, grid=None):
        self.well_names = well_names
        self.rows: List[dict] = []
        self._totals = dict(FOPT=0.0, FWPT=0.0, FGPT=0.0, FWIT=0.0,
                            FGIT=0.0, FLPT=0.0)
        self._last_t = 0.0
        self.requested_keys: Optional[List[str]] = None
        self.unsupported: List[str] = []
        self._need: set = set()
        self._block = []              # [(key, active_cell_index)]
        self._fipnum = None
        self._nreg = 1
        self._well_totals = {}        # key -> per-well cumulative array
        self._record_jit = {}         # id(model) -> jitted summary_arrays
        if requests:
            from opm_tpu.io.summaryconfig import block_cells, expand_requests
            nreg = 1
            ijk_to_cell = None
            if grid is not None:
                fip = (np.zeros(grid.nc, dtype=np.int64)
                       if grid.fipnum is None else np.asarray(grid.fipnum))
                if grid.active_mask is not None:
                    self._fipnum = np.where(np.asarray(grid.active_mask),
                                            fip, -1)
                else:
                    self._fipnum = fip
                nreg = int(fip.max()) + 1 if fip.size else 1
                nx, ny, nz = grid.dims
                cart = np.full(nx * ny * nz, -1, dtype=np.int64)
                rc = grid.real_cells
                cart[np.asarray(grid.global_cell)[rc]] = rc

                def ijk_to_cell(i, j, k, _cart=cart, _d=(nx, ny, nz)):
                    nx_, ny_, nz_ = _d
                    if not (0 <= i < nx_ and 0 <= j < ny_ and 0 <= k < nz_):
                        return None
                    c = _cart[(k * ny_ + j) * nx_ + i]
                    return None if c < 0 else int(c)

            self._nreg = nreg
            keys, unsup, need = expand_requests(
                requests, well_names, nreg, ijk_to_cell)
            self.requested_keys = keys
            self.unsupported = unsup
            self._need = need
            if ijk_to_cell is not None:
                self._block = block_cells(keys, ijk_to_cell)
            if "well_totals" in need:
                nw = len(well_names)
                for k in ("WOPT", "WWPT", "WGPT", "WWIT", "WGIT"):
                    self._well_totals[k] = np.zeros(nw)

    def region_spec(self):
        """(fipnum, nreg) when region vectors are requested, else None —
        the device-side span program computes the per-region reductions
        from this (solver/fused_span.py summary extras)."""
        if "region" in self._need and self._fipnum is not None:
            return self._fipnum, self._nreg
        return None

    def block_spec(self):
        """[(key, cell)] block-pressure requests (device extras input)."""
        return self._block if "block" in self._need else []

    def record(self, t, state: BlackoilState, model, extra=None):
        """One summary row from the device state.

        VERDICT r4 #8: the old implementation made ~5 separate device
        pulls per report step (qs, bhp, pressure, accumulation, region
        reductions) — each a tunnel round trip on the per-step path
        (multi-process runs, event subscribers, RESV steps). Now ONE
        jitted device program (the span path's summary_arrays) computes
        (qs, bhp, fpr, fip, region, block) and one batched host_tree
        pull fetches it. Collective-safe: every process executes the
        same jit + gather."""
        import jax

        from opm_tpu.parallel.io_gather import host_tree
        from opm_tpu.solver.fused_span import summary_arrays

        key = id(model)
        fn = self._record_jit.get(key)
        if fn is None:
            region_spec = (None if self.region_spec() is None
                           else (self._fipnum, self._nreg))
            block_cells = self._block or None
            fn = jax.jit(lambda s: summary_arrays(
                model, s, region_spec=region_spec,
                block_cells=block_cells))
            self._record_jit[key] = fn
        qs, bhp, fpr, fip, region, block = host_tree(fn(state))
        return self.record_arrays(t, np.asarray(qs), np.asarray(bhp),
                                  float(fpr), np.asarray(fip), extra,
                                  region=region, block=block)

    def record_arrays(self, t, qs, bhp, fpr, fip, extra=None, *,
                      region=None, block=None):
        """Build a summary row from precomputed arrays (the device-side
        span path computes (qs, bhp, fpr, fip) on-chip, one pull per
        chunk of report steps — solver/fused_span.py)."""
        qs = np.asarray(qs)
        bhp = np.asarray(bhp)
        row = dict(time=t / DAY)
        row["FPR"] = float(fpr)
        # field rates: production reported positive (OPM sign convention:
        # qs negative for producers)
        prod = np.clip(-qs, 0.0, None)
        inj = np.clip(qs, 0.0, None)
        row["FOPR"] = prod[:, OIL].sum()
        row["FWPR"] = prod[:, WATER].sum()
        row["FGPR"] = prod[:, GAS].sum()
        row["FLPR"] = row["FOPR"] + row["FWPR"]
        row["FOIR"] = inj[:, OIL].sum()
        row["FWIR"] = inj[:, WATER].sum()
        row["FGIR"] = inj[:, GAS].sum()
        fopr = row["FOPR"]
        row["FGOR"] = row["FGPR"] / fopr if fopr > 1e-12 else 0.0
        row["FWCT"] = (row["FWPR"] / (row["FWPR"] + fopr)
                       if row["FWPR"] + fopr > 1e-12 else 0.0)
        # cumulative totals (rectangle rule over report steps)
        dt = t - self._last_t
        self._last_t = t
        self._totals["FOPT"] += row["FOPR"] * dt
        self._totals["FWPT"] += row["FWPR"] * dt
        self._totals["FGPT"] += row["FGPR"] * dt
        self._totals["FWIT"] += row["FWIR"] * dt
        self._totals["FGIT"] += row["FGIR"] * dt
        self._totals["FLPT"] += row["FLPR"] * dt
        row.update(self._totals)
        if self._well_totals:
            self._well_totals["WOPT"] += prod[:, OIL] * dt
            self._well_totals["WWPT"] += prod[:, WATER] * dt
            self._well_totals["WGPT"] += prod[:, GAS] * dt
            self._well_totals["WWIT"] += inj[:, WATER] * dt
            self._well_totals["WGIT"] += inj[:, GAS] * dt
        # fluid in place (FOIP/FWIP/FGIP field totals; the reference prints
        # FIP per report step, BlackoilModelBase_impl.hpp:2459 +
        # SimulatorBase FIP report)
        row["FWIP"] = float(fip[WATER])
        row["FOIP"] = float(fip[OIL])
        row["FGIP"] = float(fip[GAS])
        for iw, name in enumerate(self.well_names):
            row[f"WBHP:{name}"] = bhp[iw]
            row[f"WOPR:{name}"] = prod[iw, OIL]
            row[f"WWPR:{name}"] = prod[iw, WATER]
            row[f"WGPR:{name}"] = prod[iw, GAS]
            row[f"WGIR:{name}"] = inj[iw, GAS]
            row[f"WWIR:{name}"] = inj[iw, WATER]
            gor = prod[iw, GAS] / prod[iw, OIL] if prod[iw, OIL] > 1e-12 \
                else 0.0
            row[f"WGOR:{name}"] = gor
            if self.requested_keys is not None:
                liq = prod[iw, OIL] + prod[iw, WATER]
                row[f"WLPR:{name}"] = liq
                row[f"WWCT:{name}"] = (prod[iw, WATER] / liq
                                       if liq > 1e-12 else 0.0)
                row[f"WGLR:{name}"] = (prod[iw, GAS] / liq
                                       if liq > 1e-12 else 0.0)
                row[f"WOIR:{name}"] = inj[iw, OIL]
                # THP is only defined through a VFP back-solve; wells
                # without VFP report 0 (the reference does the same for
                # missing THP lookups)
                row.setdefault(f"WTHP:{name}", 0.0)
                for k, tot in self._well_totals.items():
                    row[f"{k}:{name}"] = tot[iw]
        if region is not None:
            rpr, rfip = region
            for r in range(self._nreg):
                row[f"RPR:{r + 1}"] = float(rpr[r])
                row[f"ROIP:{r + 1}"] = float(rfip[r, OIL])
                row[f"RWIP:{r + 1}"] = float(rfip[r, WATER])
                row[f"RGIP:{r + 1}"] = float(rfip[r, GAS])
        if block is not None:
            for (key, _c), val in zip(self._block, np.asarray(block)):
                row[key] = float(val)
        if extra:
            row.update(extra)
        self.rows.append(row)
        return row

    def series(self, key):
        return np.array([r.get(key, np.nan) for r in self.rows])

    def to_csv(self, path):
        keys = sorted({k for r in self.rows for k in r},
                      key=lambda k: (k != "time", k))
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for r in self.rows:
                f.write(",".join(f"{r.get(k, float('nan')):.10g}"
                                 for k in keys) + "\n")


def fluid_in_place(model, state: BlackoilState, regions=None):
    """Surface-volume FIP per phase (computeFluidInPlace,
    BlackoilModelBase_impl.hpp:2459). With `regions` (nc,) 0-based FIPNUM,
    returns (nreg, 3) per-region volumes (the reference's per-FIPNUM
    report, SimulatorBase_impl.hpp FIPUNIT output); else field totals (3,).

    Jitted per model: an eager accumulation() is hundreds of op-by-op
    dispatches — ruinous through the TPU tunnel when called per report
    step."""
    import jax

    if not hasattr(model, "_acc_jit"):
        model._acc_jit = jax.jit(model.accumulation)
    from opm_tpu.parallel.io_gather import host_value as _hv
    acc = _hv(model._acc_jit(state)).T               # (nc, 3)
    pv = np.asarray(getattr(model, "pv_out", model.pv))
    vol = acc * pv[:, None]
    if regions is None:
        return vol.sum(axis=0)  # (3,) w,o,g surface volumes
    regions = np.asarray(regions)
    nreg = int(regions.max()) + 1
    out = np.zeros((nreg, 3))
    np.add.at(out, regions, vol)
    return out


class SimulatorFullyImplicitBlackoil:
    def __init__(self, case: EclipseCase, *,
                 params: Optional[ModelParams] = None,
                 ts_params: Optional[TimeStepControlParams] = None,
                 output_dir: Optional[str] = None,
                 fused: Optional[bool] = None,
                 mesh=None):
        """mesh: a jax.sharding.Mesh over the cell axis for global-view
        domain decomposition — single-process multi-device OR multi-process
        (after parallel.distributed.initialize_distributed; the reference's
        MPI redistribution, FlowMain.hpp:252-284 +
        RedistributeDataHandles.hpp).  Cell-axis state arrays are sharded
        over it, well/scalar state replicated; every host pull goes through
        the collective-safe io_gather.host_value, and files are written by
        the IO process only."""
        self.case = case
        self.mesh = mesh
        self.grid = build_grid(case)
        self.props = BlackoilProps.from_case(case)
        if self.props.satfunc is not None:
            from opm_tpu.props.satfunc import (EndpointScaling,
                                               HysteresisConfig)
            eps = EndpointScaling.from_case(case, self.grid.global_cell)
            if eps is not None:
                self.props.satfunc.eps = eps
            hyst = HysteresisConfig.from_case(case, self.grid.global_cell)
            if hyst is not None:
                self.props.satfunc.hyst = hyst
        self._hysteresis = (self.props.satfunc is not None
                            and self.props.satfunc.hyst is not None)
        self.model = BlackoilModel(self.grid, self.props, params)
        self._thpres_default_pairs = []
        if case.solution.thpres:
            # per-face threshold pressures between equilibration regions
            # (thresholdPressures.hpp:47,321; applied in the flux assembly)
            eql = np.asarray(self.grid.eqlnum)
            fc = self.grid.face_cells
            thp = np.zeros(len(fc))
            for (r1, r2, val) in case.solution.thpres:
                m = (((eql[fc[:, 0]] == r1 - 1) & (eql[fc[:, 1]] == r2 - 1))
                     | ((eql[fc[:, 0]] == r2 - 1)
                        & (eql[fc[:, 1]] == r1 - 1)))
                if val is None:
                    # defaulted: computeMaxDp (thresholdPressures.hpp:47)
                    # — filled from the equilibrated initial state
                    self._thpres_default_pairs.append(m)
                else:
                    thp[m] = val
            self.model.threshold_dp = jnp.asarray(thp)
        self.schedule = build_schedule(case)
        self.output_dir = output_dir
        # global well superset: fixed shapes across the whole schedule
        names = []
        max_perf = 1
        for step in self.schedule.report_steps:
            for w in step.wells:
                if w.name not in names:
                    names.append(w.name)
                max_perf = max(max_perf, len(w.completions))
        self.well_names = names
        self.max_perf = max_perf
        self._econ_shut: set = set()
        # (i, j, k) completions closed by WECON workover, per well name
        self._econ_closed_conns: Dict[str, set] = {}
        self.ts = AdaptiveTimeStepping(ts_params, tuning=self.schedule.tuning)
        # TUNING record 3 NEWTMX: deck-driven max Newton iterations per
        # substep (the reference's newton-max-iterations parameter)
        if self.schedule.tuning and self.schedule.tuning.get("newtmx"):
            self.model.params.max_iter = int(self.schedule.tuning["newtmx"])
        self.solver = NonlinearSolver(self.model)
        from opm_tpu.utils.events import EventSource
        self.events = EventSource("timestep_completed",
                                  "report_step_completed")
        self._step_timing: list = []
        if fused is None:
            # on TPU the host<->device round trips dominate; fuse the whole
            # Newton loop into one device program
            import jax as _jax
            fused = _jax.default_backend() != "cpu"
        self.fused = fused
        self.summary = SummaryCollector(
            names, requests=getattr(case, "summary_requests", None),
            grid=self.grid)
        self.report = SimulatorReportTotals()

    # ------------------------------------------------------------------
    def _check_econ_limits(self, step_wells, state, ws=None, wd=None):
        """WECON economic limits: rate violations shut the producer; a
        max-water-cut violation follows the workover procedure, closing
        the worst-offending connection (checkRateEconLimits /
        checkMaxWaterCutLimit, StandardWells_impl.hpp:1209-1380,
        wells/econ.py)."""
        from opm_tpu.wells import standard as stdwells
        from opm_tpu.wells.econ import check_econ_limits

        qs = host_value(state.qs)
        idx = {n: i for i, n in enumerate(self.well_names)}
        # per-connection rates are only needed for ratio workovers; compute
        # them lazily and JITTED (an eager evaluation here cost ~2 s of
        # dispatch per report step even on WECON-free decks)
        need_cq = any(
            w.type == "PRODUCER" and w.status.upper() == "OPEN"
            and np.isfinite(w.econ_max_wct)
            and w.econ_workover in ("CON", "+CON")
            for w in step_wells)
        cq = None
        if need_cq and ws is not None and wd is not None:
            if not hasattr(self, "_econ_cq_jit"):
                import jax as _jax

                def _cq(state_, wd_):
                    q = self.model.cell_quantities(state_)
                    cellq = self.model.well_cell_quantities(q)
                    cdp = stdwells.connection_pressure_offsets(
                        wd_, cellq, state_.qs)
                    return stdwells.perforation_fluxes(
                        wd_, cellq, state_.bhp, state_.qs, cdp)

                self._econ_cq_jit = _jax.jit(_cq)
            cq = np.asarray(self._econ_cq_jit(state, wd))  # (nw, mp, 3)
        for w in step_wells:
            if w.type != "PRODUCER" or w.status.upper() != "OPEN" or \
                    w.name in self._econ_shut:
                continue
            i = idx.get(w.name)
            if i is None:
                continue
            qo = max(-qs[i, OIL], 0.0)
            qw = max(-qs[i, WATER], 0.0)
            qg = max(-qs[i, GAS], 0.0)
            if cq is not None:
                perf_qw = np.clip(-cq[i, :, WATER], 0.0, None)
                perf_qo = np.clip(-cq[i, :, OIL], 0.0, None)
                open_mask = np.asarray(ws.perf_mask[i])
            else:
                perf_qw = np.array([qw])
                perf_qo = np.array([qo])
                open_mask = np.array([True])
            res = check_econ_limits(
                qo, qw, qg, perf_qw, perf_qo, open_mask,
                min_orat=w.econ_min_orat, min_grat=w.econ_min_grat,
                max_wct=w.econ_max_wct, max_gor=w.econ_max_gor,
                workover=w.econ_workover)
            if res.shut_well:
                self._econ_shut.add(w.name)
            elif res.closed_connections:
                # closed_connections index the padded perf arrays, which
                # build_well_set fills depth-sorted (wells/wells.py) — NOT
                # deck COMPDAT order; recover (i,j,k) from perf_cell.
                closed = self._econ_closed_conns.setdefault(w.name, set())
                pm = np.asarray(ws.perf_mask[i])
                pc = np.asarray(ws.perf_cell[i])
                for k in res.closed_connections:
                    if k < pm.shape[0] and pm[k]:
                        ci, cj, ck = self.grid.ijk(int(pc[k]))
                        closed.add((int(ci), int(cj), int(ck)))
                if len(closed) >= len(w.completions):
                    self._econ_shut.add(w.name)

    # ------------------------------------------------------------------
    def _field_voidage(self, state) -> float:
        """Total reservoir voidage rate of producers (for VREP), from the
        rate converter (computeWellVoidageRates,
        BlackoilModelBase_impl.hpp:2548)."""
        from opm_tpu.wells.rateconv import (region_averages,
                                            voidage_coefficients)
        region = jnp.zeros(self.model.nc, dtype=jnp.int32)
        p_avg, rs_avg, rv_avg = region_averages(self.model, state, region)
        coef = np.asarray(voidage_coefficients(self.props, p_avg, rs_avg,
                                               rv_avg))[0]
        qs = host_value(state.qs)
        prod = np.clip(-qs, 0.0, None)
        return float((prod * coef[None, :]).sum())

    # ------------------------------------------------------------------
    def _out_base(self) -> str:
        """Output-file basename: the deck filename (ECL convention),
        falling back to the deck TITLE for synthetic cases."""
        import os as _os
        if getattr(self.case, "path", None):
            return _os.path.splitext(_os.path.basename(self.case.path))[0]
        return (self.case.runspec.title or "CASE").split()[0] or "CASE"

    def _well_set_for(self, step) -> WellSet:
        return build_well_set(step.wells, self.grid, max_perf=self.max_perf,
                              name_order=self.well_names)

    def _pad_well_set(self, ws: WellSet) -> WellSet:
        """Extend arrays to the global well count (missing wells shut)."""
        nw = len(self.well_names)
        if ws.nw == nw and ws.names == self.well_names:
            return ws
        idx = {n: i for i, n in enumerate(ws.names)}

        def pad2(a, fill=0.0):
            out = np.full((nw,) + a.shape[1:], fill, dtype=a.dtype)
            for i, n in enumerate(self.well_names):
                if n in idx:
                    out[i] = a[idx[n]]
            return out

        return WellSet(
            names=list(self.well_names), nw=nw, max_perf=ws.max_perf,
            perf_cell=pad2(ws.perf_cell), perf_mask=pad2(ws.perf_mask, False),
            perf_wi=pad2(ws.perf_wi), perf_depth=pad2(ws.perf_depth),
            is_injector=pad2(ws.is_injector, False),
            comp_frac=pad2(ws.comp_frac), control=pad2(ws.control),
            target=pad2(ws.target), bhp_limit=pad2(ws.bhp_limit, 1e5),
            thp_limit=pad2(ws.thp_limit, np.nan),
            ref_depth=pad2(ws.ref_depth), open_mask=pad2(ws.open_mask, False),
            rate_targets=pad2(ws.rate_targets, np.nan),
            inj_rate_target=pad2(ws.inj_rate_target, np.nan),
            inj_resv_target=pad2(ws.inj_resv_target, np.nan),
            polymer_conc=pad2(ws.polymer_conc),
            is_history=pad2(ws.is_history, False))

    def _init_well_state(self, state: BlackoilState, ws: WellSet,
                         first: bool) -> BlackoilState:
        """Reset controls to the schedule and give fresh wells a sane guess
        (WellStateFullyImplicitBlackoil::init semantics)."""
        nw = ws.nw
        control_np = np.asarray(ws.control, dtype=np.int32).copy()
        target_np = np.asarray(ws.target, dtype=np.float64).copy()
        bhp = host_value(state.bhp).copy()
        qs = host_value(state.qs).copy()
        p = host_value(state.pressure)
        for iw in range(nw):
            if not ws.open_mask[iw]:
                # SHUT/STOP wells are kept in the padded set with their
                # residuals pinned (well_residuals: rates -> 0, bhp ->
                # bhp_limit). Classify them as BHP-type so the control
                # norm scales the pinned pressure residual as a pressure
                # (/1e5), and start bhp AT the limit: a zero bhp can never
                # escape the relative dbhp chop (update_state dpMaxRel).
                control_np[iw] = CTRL_BHP
                target_np[iw] = ws.bhp_limit[iw]
                bhp[iw] = ws.bhp_limit[iw]
                qs[iw] = 0.0
                continue
            c0 = ws.perf_cell[iw][ws.perf_mask[iw]]
            p_ref = p[c0[0]] if len(c0) else 1e7
            if ws.control[iw] == CTRL_BHP:
                bhp[iw] = ws.target[iw]
            elif first or bhp[iw] == 0.0:
                bhp[iw] = p_ref * (1.05 if ws.is_injector[iw] else 0.95)
            if first or not np.any(qs[iw]):
                t = ws.target[iw]
                if ws.is_injector[iw]:
                    qs[iw] = ws.comp_frac[iw] * (
                        t if ws.control[iw] == CTRL_SURFACE_RATE else 0.0)
                else:
                    sgn = {CTRL_ORAT: OIL, CTRL_WRAT: WATER,
                           CTRL_GRAT: GAS, CTRL_LRAT: OIL}.get(
                               int(ws.control[iw]))
                    if sgn is not None:
                        qs[iw, sgn] = -t
        return state._replace(bhp=jnp.asarray(bhp), qs=jnp.asarray(qs),
                              control=jnp.asarray(control_np),
                              target=jnp.asarray(target_np))

    # ------------------------------------------------------------------
    def _apply_geo_modifiers(self, mods):
        """GEO_MODIFIER schedule events rebuild DerivedGeology
        (SimulatorBase_impl.hpp:258-268 / GeoProps update): mutate the
        case's multiplier state, rebuild the grid, and re-create model +
        solver. This is a deliberate re-trace boundary — transmissibility
        is baked into the compiled programs (stencils, GMG hierarchy)."""
        case = self.case
        nx, ny, nz = case.runspec.dims
        ncg = nx * ny * nz

        def ensure(name):
            if name not in case.grid_arrays:
                case.grid_arrays[name] = np.ones(ncg)
            return case.grid_arrays[name]

        def box_idx(b):
            if b is None:
                return slice(None)
            i1, i2, j1, j2, k1, k2 = b
            ii = np.arange(i1, i2 + 1)
            jj = np.arange(j1, j2 + 1)
            kk = np.arange(k1, k2 + 1)
            K, J, I = np.meshgrid(kk, jj, ii, indexing="ij")
            return ((K * ny + J) * nx + I).ravel()

        for mod in mods:
            if mod[0] == "MULTFLT":
                for nm, v in mod[1]:
                    case.fault_mults[nm] = v
            elif mod[0] == "ARRAY":
                _, name, vals = mod
                a = ensure(name)
                a[: len(vals)] = vals
            elif mod[0] == "EQUALS":
                _, name, value, b = mod
                ensure(name)[box_idx(b)] = value
            elif mod[0] == "MULTIPLY":
                _, name, value, b = mod
                ensure(name)[box_idx(b)] *= value
        old_thr = self.model.threshold_dp
        old_nc, old_nf = self.grid.nc, self.grid.nf
        self.grid = build_grid(case)
        if self.grid.nc != old_nc or self.grid.nf != old_nf:
            raise ValueError(
                "schedule geology modifier changed the active topology "
                f"(nc {old_nc}->{self.grid.nc}, nf {old_nf}->"
                f"{self.grid.nf}); only transmissibility/pore-volume "
                "changes are supported mid-run")
        self.model = BlackoilModel(self.grid, self.props,
                                   self.model.params)
        self.model.threshold_dp = old_thr
        self.solver = NonlinearSolver(self.model)
        self._span_runner = None

    # ------------------------------------------------------------------
    def _well_potentials(self, state):
        """Phase potentials per well at the BHP limits (guide-rate
        fallback; computeWellPotentials)."""
        from opm_tpu.wells import standard as stdwells
        try:
            ws = self._pad_well_set(self._well_set_for(
                self.schedule.report_steps[0]))
            wd = make_well_device_arrays(ws, self.grid.gravity)
            q = self.model.cell_quantities(state)
            cellq = self.model.well_cell_quantities(q)
            cdp = stdwells.connection_pressure_offsets(wd, cellq, state.qs)
            pots = np.asarray(stdwells.well_potentials(wd, cellq, cdp))
            return {n: pots[i] for i, n in enumerate(self.well_names)}
        except Exception:
            return None

    def _wire_vfp(self, wd, ws, state, step):
        """Attach VFP lookup data to wd when the step needs it: active THP
        control OR wells with THP limits (first-broken-constraint switching
        evaluates the THP constraint on device,
        StandardWells_impl.hpp:712-790). Includes the hydrostatic datum
        correction (computeHydrostaticCorrection, :918-960):
        dp = rho_wellbore * g * (bhp_ref_depth - table_datum_depth) with
        the mixture density at the reference-depth-adjacent (shallowest)
        connection — explicit per report step, like cdp."""
        self._vfp_report = None
        if not self.case.vfp_tables:
            return
        from opm_tpu.wells import standard as stdwells
        tables = tuple(self.case.vfp_tables[k]
                       for k in sorted(self.case.vfp_tables))
        tid_to_slot = {t.table_id: i for i, t in enumerate(tables)}
        slots = np.array(
            [tid_to_slot.get(
                next((w.vfp_table for w in step.wells
                      if w.name == n), 0), -1)
             for n in self.well_names], dtype=np.int32)
        if not np.any(slots >= 0):
            return
        need_vfp = bool(
            np.any(ws.control == CTRL_THP)
            or np.any(np.isfinite(ws.thp_limit) & ws.open_mask))
        if not hasattr(self, "_vfp_rho_jit"):
            def _rho_top(state_, wd_):
                q = self.model.cell_quantities(state_)
                cellq = self.model.well_cell_quantities(q)
                return stdwells.wellbore_mixture_density(
                    wd_, cellq, state_.qs)[:, 0]
            self._vfp_rho_jit = jax.jit(_rho_top)
        rho_top = np.asarray(self._vfp_rho_jit(
            state, {k: wd[k] for k in
                    ("perf_cell", "perf_mask", "comp_frac",
                     "is_injector", "open", "perf_wi", "perf_depth",
                     "ref_depth", "bhp_limit", "gravity")}))
        datum = np.array([tables[s].datum_depth if s >= 0 else 0.0
                          for s in slots])
        dp_corr = np.where(
            slots >= 0,
            rho_top * float(self.grid.gravity)
            * (np.asarray(ws.ref_depth) - datum), 0.0)
        # reporting stash: THP is back-computed from the converged
        # BHP/rates at summary time for EVERY well with an assigned VFP
        # table, not only THP-controlled ones (the reference back-computes
        # THP after each update, StandardWells_impl.hpp:613-703; without
        # this WTHP was hard-zero on BHP/rate-controlled VFP wells)
        self._vfp_report = (tables, slots, dp_corr)
        if need_vfp:
            wd["vfp"] = (tables, jnp.asarray(slots), jnp.asarray(dp_corr))

    def _thp_report_extra(self, qs, bhp):
        """WTHP summary values: invert the well's VFP table for THP at the
        converged rates/BHP (datum-corrected), per report step
        (StandardWells_impl.hpp:613-703 — the reference back-computes THP
        from the converged BHP after each well-state update). Returns an
        extra-row dict or None."""
        vfp = getattr(self, "_vfp_report", None)
        if vfp is None:
            return None
        tables, slots, dp_corr = vfp
        qs = np.asarray(qs)
        bhp = np.asarray(bhp)
        extra = {}
        for iw, name in enumerate(self.well_names):
            s = int(slots[iw])
            if s < 0:
                continue
            thp = tables[s].thp_at(jnp.asarray(qs[iw]),
                                   jnp.asarray(bhp[iw] - dp_corr[iw]))
            extra[f"WTHP:{name}"] = float(thp)
        return extra or None

    def _econ_violations(self, econ_wells, qs):
        """Well-level WECON checks from one span step's emitted qs row —
        report-step granularity exactly like the per-step path's
        _check_econ_limits (CON-workover wells never enter spans, so
        per-connection rates are not needed). Returns names to shut."""
        from opm_tpu.wells.econ import check_econ_limits
        qs = np.asarray(qs)
        idx = {n: i for i, n in enumerate(self.well_names)}
        out = []
        for w in econ_wells:
            i = idx.get(w.name)
            if i is None or w.name in self._econ_shut:
                continue
            qo = max(-qs[i, OIL], 0.0)
            qw = max(-qs[i, WATER], 0.0)
            qg = max(-qs[i, GAS], 0.0)
            res = check_econ_limits(
                qo, qw, qg, np.array([qw]), np.array([qo]),
                np.array([True]),
                min_orat=w.econ_min_orat, min_grat=w.econ_min_grat,
                max_wct=w.econ_max_wct, max_gor=w.econ_max_gor,
                workover=w.econ_workover)
            if res.shut_well:
                out.append(w.name)
        return out

    def _write_step_outputs(self, state, step, writer, write_restart,
                            write_vtk, write_matlab, *, derived=None,
                            on_host=False):
        """Per-report-step output (restart checkpoint + UNRST accumulation,
        VTK, Matlab) from a state pytree — shared by the per-step path and
        the fused-span path. `derived` = (sw, sg, rs, rv) precomputed ON
        DEVICE (the span program stacks them with the states so the whole
        chunk arrives in one batched pull); `on_host` marks state/derived
        as already-gathered numpy, skipping the per-step transfers that
        made output-on runs cost 4.4x (VERDICT r3 #2 — the reference hides
        output cost behind its writer thread,
        SimulatorFullyImplicitBlackoilOutput.hpp:318)."""
        if not ((write_restart or write_vtk or write_matlab)
                and self.output_dir):
            return
        if not on_host:
            if derived is None:
                # rs/rv need PVT table lookups — evaluate jitted on device
                # BEFORE the host pull (numpy inputs to jnp would bounce
                # back through the device per step)
                if not hasattr(self, "_derived_jit"):
                    from opm_tpu.models.state import (rs_rv as _rsrv,
                                                      saturations as _sats)

                    def _derived(state_):
                        sw_, so_, sg_ = _sats(state_)
                        rs_, rv_ = _rsrv(state_, self.props,
                                         self.model.pvtnum)
                        return sw_, sg_, rs_, rv_

                    self._derived_jit = jax.jit(_derived)
                derived = self._derived_jit(state)
            # collective gather on ALL processes (host_value allgathers
            # sharded leaves; output_dir is rank-uniform, only the WRITES
            # are IO-rank-gated below)
            state = jax.tree.map(host_value, state)
            derived = jax.tree.map(host_value, derived)
        if not is_io_process():
            return
        sw_, sg_, rs_, rv_ = (np.asarray(a) for a in derived)
        import os
        os.makedirs(self.output_dir, exist_ok=True)
        if write_restart:
            from opm_tpu.io.restart import save_restart
            host_state = jax.tree.map(np.asarray, state)
            writer.submit(
                save_restart,
                os.path.join(self.output_dir,
                             f"restart_{step.index:04d}.npz"),
                host_state, report_step=step.index,
                time=step.end_time,
                suggested_dt=self.ts.suggested_dt)
            # accumulate ECL unified-restart solution steps
            p_unit = (1e-5 if self.case.runspec.unit_system
                      == "METRIC" else 1.0 / 6894.757293168361)
            xwel = np.concatenate([
                np.asarray(state.bhp)[:, None],
                np.asarray(state.qs),
                np.asarray(state.control, dtype=np.float64)[:, None],
                np.asarray(state.target)[:, None]], axis=1)
            # embedded grids: ECL restart arrays cover the REAL
            # active cells only (padding is an internal layout)
            rc = (slice(None) if self.grid.active_mask is None
                  else self.grid.real_cells)
            self._unrst_steps.append(dict(
                seqnum=step.index,
                time_days=step.end_time / DAY,
                PRESSURE=np.asarray(state.pressure)[rc] * p_unit,
                SWAT=sw_[rc], SGAS=sg_[rc],
                RS=rs_[rc], RV=rv_[rc],
                # well state + stepper extras (SI), the analogue of
                # the reference's OPM_XWEL/OPM_EXTRA restart data
                OPM_XWEL=xwel.reshape(-1),
                OPM_EXTRA=np.asarray([self.ts.suggested_dt])))
        if write_vtk:
            from opm_tpu.io.vtk import write_vtr
            writer.submit(
                write_vtr,
                os.path.join(self.output_dir,
                             f"step_{step.index:04d}.vtr"),
                self.grid,
                dict(PRESSURE=np.asarray(state.pressure),
                     SWAT=sw_, SGAS=sg_))
        if write_matlab:
            # Matlab sub-writer (BlackoilMatlabWriter,
            # SimulatorFullyImplicitBlackoilOutput.hpp:175-195):
            # per-variable NNN.txt dumps + estimated cell velocity
            from opm_tpu.grid.grid import estimate_cell_velocity
            from opm_tpu.io.matlab import (output_state_matlab,
                                           output_well_state_matlab)
            so_m = 1.0 - sw_ - sg_
            q_m = self.model.cell_quantities(state)
            flux_m = np.asarray(
                self.model.face_fluxes(q_m)).sum(axis=0)
            vel = estimate_cell_velocity(self.grid, flux_m)
            rc_m = (slice(None) if self.grid.active_mask is None
                    else self.grid.real_cells)
            sat = np.stack([sw_[rc_m], so_m[rc_m], sg_[rc_m]], axis=1)
            writer.submit(
                output_state_matlab, self.output_dir, step.index,
                pressure=np.asarray(state.pressure)[rc_m],
                saturation=sat, rs=rs_[rc_m],
                rv=rv_[rc_m], velocity=vel[rc_m])
            writer.submit(
                output_well_state_matlab, self.output_dir,
                step.index, bhp=np.asarray(state.bhp),
                wellrates=np.asarray(state.qs))

    def _shard_state(self, state: BlackoilState) -> BlackoilState:
        """Lay the state out over self.mesh: cell-axis arrays sharded,
        well/scalar arrays replicated.  Works for single- AND multi-process
        meshes (make_array_from_callback only touches the addressable
        shards, so each process materializes its local cells only)."""
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self.mesh
        axis = mesh.axis_names[0]

        def put(x, spec):
            if x is None:
                return None
            xh = host_value(x)
            sh = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(
                xh.shape, sh, lambda idx, _x=xh: _x[idx])

        cell = P(axis)
        repl = P()
        return state._replace(
            pressure=put(state.pressure, cell), sw=put(state.sw, cell),
            x=put(state.x, cell), hcstate=put(state.hcstate, cell),
            sgmax=put(state.sgmax, cell), somax=put(state.somax, cell),
            bhp=put(state.bhp, repl), qs=put(state.qs, repl),
            control=put(state.control, repl), target=put(state.target, repl))

    def run(self, state: Optional[BlackoilState] = None, *,
            report_step_limit: Optional[int] = None, verbose: bool = False,
            restart_file: Optional[str] = None,
            restart_step: Optional[int] = None,
            write_restart: bool = False, write_vtk: bool = False,
            write_matlab: bool = False):
        """Run the schedule. restart_file resumes mid-run from a prior
        run's checkpoint — either the private .npz format or an ECL
        .UNRST (with restart_step selecting the SEQNUM); a deck RESTART
        keyword triggers the same automatically (the RESTART/SKIPREST
        capability, SimulatorBase_impl.hpp:96-131, FlowMain.hpp:845-846).
        write_restart emits npz checkpoints + the unified ECL restart per
        report step into output_dir."""
        t_start = time.perf_counter()
        nw = len(self.well_names)
        self._unrst_steps = []
        if restart_file is None and state is None \
                and self.case.solution.restart is not None:
            base, rstep = self.case.solution.restart
            import os as _os
            root = _os.path.dirname(self.case.path or ".")
            for cand in (_os.path.join(root, base + ".UNRST"),
                         base + ".UNRST"):
                if _os.path.exists(cand):
                    restart_file = cand
                    restart_step = rstep
                    break
        # async output worker (the reference's BlackoilOutputWriter
        # asyncOutput_ / ThreadHandle): report-step writes overlap the next
        # step's device work
        from opm_tpu.utils.threadhandle import ThreadHandle
        writer = ThreadHandle()
        prt = None
        if self.output_dir and is_io_process():
            import os as _os2
            _os2.makedirs(self.output_dir, exist_ok=True)
            from opm_tpu.io.prt import PrtLogger
            prt = PrtLogger(
                _os2.path.join(self.output_dir, self._out_base() + ".PRT"),
                self.case.runspec.title or "")
            for m in self.summary.unsupported:
                prt.warning(f"SUMMARY mnemonic not supported, ignored: {m}")
        start_step = 0
        if restart_file is not None:
            if restart_file.upper().endswith(".UNRST"):
                from opm_tpu.io.restart import load_restart_unrst
                state, meta = load_restart_unrst(
                    restart_file, restart_step, self.case, self.props,
                    self.model)
            else:
                from opm_tpu.io.restart import load_restart
                state, meta = load_restart(restart_file)
            start_step = meta["report_step"] + 1
            self.ts.suggested_dt = meta["suggested_dt"]
        elif state is None:
            state = initial_state(self.grid, self.props, self.case, nw)
        state = self._shard_state(state)
        if self._thpres_default_pairs:
            # defaulted THPRES: the sustained equilibrium pressure jump
            # across the barrier — max |p1 - p2| over the region interface
            # (computeMaxDp from equilibrated columns,
            # thresholdPressures.hpp:47)
            fc = self.grid.face_cells
            p0 = host_value(state.pressure)
            dp_face = np.abs(p0[fc[:, 0]] - p0[fc[:, 1]])
            thp = np.asarray(self.model.threshold_dp)
            for m in self._thpres_default_pairs:
                if m.any():
                    thp = np.where(m, dp_face[m].max(), thp)
            self.model.threshold_dp = jnp.asarray(thp)
            self._thpres_default_pairs = []
        steps = self.schedule.report_steps
        if report_step_limit is not None:
            steps = steps[:report_step_limit]
        steps = steps[start_step:]
        first = start_step == 0
        if self._hysteresis and state.sgmax is None:
            from opm_tpu.models.state import saturations as _sats
            state = state._replace(sgmax=_sats(state)[2])
        self._vappars = (getattr(self.props, "vap1", 0.0) > 0.0
                         or getattr(self.props, "vap2", 0.0) > 0.0)
        # somax memory serves both VAPPARS and the oil-kr/pc hysteresis
        # scanning curves (updateSatHyst + satOilMax in the reference)
        if (self._vappars or self._hysteresis) and state.somax is None:
            from opm_tpu.models.state import saturations as _sats
            state = state._replace(somax=_sats(state)[1])
        # fused report-step spans: consecutive steps with identical wells
        # and no host-side per-step logic run as one lax.scan chunk on
        # device (solver/fused_span.py) — one round trip per chunk
        import os as _os
        span_chunk = int(_os.environ.get("OPM_TPU_SPAN", "16"))
        # spans are the default at EVERY size: the round-2 axon-runtime
        # crash of the 132k scan-of-while program no longer reproduces
        # (retested round 3: chunk=4 and chunk=16 both run 132k clean),
        # and spans WIN at scale — SPE10-132k 600-day e2e with summary
        # output measured 48.6 s span-on vs ~110 s per-substep dispatch
        # (v5e). OPM_TPU_SPAN_MAX_CELLS=N restores a cell-count gate
        # (0 = no gate) if a runtime regresses.
        span_max_nc = int(_os.environ.get("OPM_TPU_SPAN_MAX_CELLS",
                                          "0")) or (1 << 62)
        has_subscribers = any(
            ev._handlers for ev in self.events._events.values())
        # spans now cover restart/vtk/matlab output (per-step states come
        # back stacked from the device scan), hysteresis/VAPPARS memory
        # (updated in the device report-step body), and all three step
        # controllers (PID error history threaded through the scan carry);
        # only per-substep event subscribers still force per-step dispatch
        use_spans = (self.fused and span_chunk > 1
                     and not has_subscribers
                     and self.model.nc <= span_max_nc
                     and jax.process_count() == 1)
        span_emit_states = write_restart or write_vtk or write_matlab
        self._span_runner = None

        def _step_wells_for(stp):
            step_wells = stp.wells
            if self._econ_shut or self._econ_closed_conns:
                # wells/connections shut by economic limits stay shut
                step_wells = [w.copy() for w in step_wells]
                for w in step_wells:
                    if w.name in self._econ_shut:
                        w.status = "SHUT"
                    closed = self._econ_closed_conns.get(w.name)
                    if closed:
                        for c in w.completions:
                            if (c.i, c.j, c.k) in closed:
                                c.status = "SHUT"
            return step_wells

        def _nan_eq(x, y):
            if isinstance(x, float) and isinstance(y, float):
                return x == y or (np.isnan(x) and np.isnan(y))
            if isinstance(x, dict) and isinstance(y, dict):
                return (x.keys() == y.keys()
                        and all(_nan_eq(x[k2], y[k2]) for k2 in x))
            return x == y

        def _groups_equal(a, b):
            import dataclasses
            if set(a) != set(b):
                return False
            return all(
                _nan_eq(getattr(a[g], f.name), getattr(b[g], f.name))
                for g in a for f in dataclasses.fields(a[g]))

        def _step_fusable(stp, step_wells):
            """Span eligibility (VERDICT r3 #7: group-control and
            econ-limit steps now RIDE the span fast path — groups
            redistribute on device each report step, econ limits are
            checked per step from the span's emitted rates with a
            mid-chunk rewind on the first violation). Still excluded:
            geo-modifier steps (re-trace boundary), RESV/REIN/VREP
            injection groups (host rate-converter work per step), and
            CON-workover WECON wells (need per-connection rates)."""
            if stp.geo_mods:
                return False
            if stp.groups and any(w.control == "GRUP" for w in step_wells):
                if any((g.inj_control or "NONE") in ("RESV", "REIN", "VREP")
                       for g in stp.groups.values()):
                    return False
            for w in step_wells:
                if w.type == "PRODUCER" and w.status.upper() == "OPEN" and (
                        np.isfinite(w.econ_max_wct)
                        and w.econ_workover in ("CON", "+CON")):
                    return False
            return True

        def _step_econ(step_wells):
            return [w for w in step_wells
                    if w.type == "PRODUCER" and w.status.upper() == "OPEN"
                    and (np.isfinite(w.econ_min_orat)
                         or np.isfinite(w.econ_min_grat)
                         or np.isfinite(w.econ_max_wct)
                         or np.isfinite(w.econ_max_gor))]

        i_step = 0
        while i_step < len(steps):
            step = steps[i_step]
            if step.geo_mods:
                self._apply_geo_modifiers(step.geo_mods)
            if self._hysteresis:
                # hysteresis memory update at report-step start (the
                # reference's updateSatHyst, SimulatorBase_impl.hpp:146)
                from opm_tpu.models.state import saturations as _sats
                state = state._replace(
                    sgmax=jnp.maximum(state.sgmax, _sats(state)[2]))
            if self._vappars or self._hysteresis:
                # satOilMax update (the reference's updateSatOilMax; also
                # the oil-kr/pc hysteresis reversal memory)
                from opm_tpu.models.state import saturations as _sats
                state = state._replace(
                    somax=jnp.maximum(state.somax, _sats(state)[1]))
            step_wells = _step_wells_for(step)
            raw_wells = step_wells     # pre-group-resolution (span chaining)
            group_collect = []
            if step.groups and any(w.control == "GRUP" for w in step_wells):
                # distribute group targets to GRUP wells
                from opm_tpu.wells.groups import resolve_group_controls
                rates = {n: host_value(state.qs)[i]
                         for i, n in enumerate(self.well_names)}
                voidage = self._field_voidage(state)
                pots = self._well_potentials(state)
                step_wells = resolve_group_controls(step_wells, step.groups,
                                                    rates, voidage,
                                                    potentials=pots,
                                                    collect=group_collect)
            ws = self._pad_well_set(build_well_set(
                step_wells, self.grid, max_perf=self.max_perf,
                name_order=self.well_names))
            wd = make_well_device_arrays(ws, self.grid.gravity)
            if group_collect:
                # in-Newton group reallocation arrays (update_controls)
                from opm_tpu.wells.groups import make_group_device_arrays
                wd["groups"] = make_group_device_arrays(group_collect,
                                                        self.well_names)
            state = self._init_well_state(state, ws, first)
            first = False
            self._wire_vfp(wd, ws, state, step)
            # ---- fused span fast path ---------------------------------
            if use_spans and _step_fusable(step, step_wells) and not np.any(
                    np.isin(ws.control, (CTRL_RESV, CTRL_RESERVOIR_RATE))) \
                    and not (np.any(ws.control == CTRL_THP)
                             and "vfp" not in wd):
                span_steps = [step]
                ws_cmp = ws
                if group_collect:
                    # chaining compares the UNRESOLVED well sets (GRUP
                    # controls intact) — the device re-distributes targets
                    # each report step, so only the schedule inputs need
                    # to match across the chunk
                    ws_cmp = self._pad_well_set(build_well_set(
                        raw_wells, self.grid, max_perf=self.max_perf,
                        name_order=self.well_names))
                j = i_step + 1
                while j < len(steps) and len(span_steps) < span_chunk:
                    nstep = steps[j]
                    nwells = _step_wells_for(nstep)
                    if not _step_fusable(nstep, nwells):
                        break
                    n_grp = bool(nstep.groups
                                 and any(w.control == "GRUP"
                                         for w in nwells))
                    if n_grp != bool(group_collect):
                        break
                    if group_collect and not _groups_equal(nstep.groups,
                                                           step.groups):
                        break
                    nws = self._pad_well_set(build_well_set(
                        nwells, self.grid, max_perf=self.max_perf,
                        name_order=self.well_names))
                    if not _well_sets_equal(ws_cmp, nws):
                        break
                    span_steps.append(nstep)
                    j += 1
                if len(span_steps) >= 2:
                    from opm_tpu.solver.fused_span import FusedSpanRunner
                    # econ-limit wells: the span emits per-step states so
                    # the first violation can rewind mid-chunk (exactly
                    # report-step-granular, like the per-step path)
                    econ_wells = _step_econ(step_wells)
                    runner_emit = span_emit_states or bool(econ_wells)
                    # cache the runner ON THE SOLVER: a fresh runner means a
                    # fresh jax.jit wrapper, and re-tracing the chunk
                    # program costs ~20 s — reuse must survive across
                    # Simulator instances sharing a solver (bench warm-up)
                    region_spec = self.summary.region_spec()
                    block_cells = self.summary.block_spec()
                    skey = (None if region_spec is None
                            else int(region_spec[1]),
                            tuple(block_cells), runner_emit,
                            self._hysteresis, self._vappars)
                    runner = getattr(self.solver, "_span_runner", None)
                    if (runner is None or runner.chunk != span_chunk
                            or runner.p != self.ts.p
                            or runner.summary_key != skey):
                        runner = FusedSpanRunner(
                            self.solver, self.ts.p, span_chunk,
                            region_spec=region_spec,
                            block_cells=block_cells,
                            emit_states=runner_emit,
                            hysteresis=self._hysteresis,
                            vappars=self._vappars)
                        self.solver._span_runner = runner
                    self._span_runner = runner
                    t0s = time.perf_counter()
                    pid_errs = (self.ts.pid.errors
                                if self.ts.pid is not None else None)
                    (new_state, dt_sugg, pid_errs, summaries, stats,
                     span_states, stepper) = self._span_runner.run_chunk(
                        state,
                        [s.end_time - s.start_time for s in span_steps],
                        [bool(s.events) for s in span_steps],
                        self.ts.suggested_dt, wd, pid_errors=pid_errs)
                    if not stats.fatal.any():
                        # WECON scan over the emitted per-step rates: the
                        # chunk commits up to (and including) the first
                        # violating step, shuts the well, and resumes at
                        # the next step with the updated well set
                        shut_at = None
                        if econ_wells:
                            for k in range(len(span_steps)):
                                names = self._econ_violations(
                                    econ_wells, summaries[k][0])
                                if names:
                                    shut_at = (k, names)
                                    break
                        if shut_at is None:
                            n_commit = len(span_steps)
                            state = new_state
                            self.ts.suggested_dt = dt_sugg
                            if self.ts.pid is not None:
                                self.ts.pid.errors = pid_errs
                        else:
                            k_s, names = shut_at
                            n_commit = k_s + 1
                            state = jax.tree.map(
                                lambda a, _k=k_s: a[_k], span_states[0])
                            self.ts.suggested_dt = float(stepper[0][k_s])
                            if self.ts.pid is not None:
                                self.ts.pid.errors = [
                                    float(e) for e in stepper[1][k_s]]
                            self._econ_shut.update(names)
                        wall = (time.perf_counter() - t0s) / n_commit
                        if prt is not None:
                            prt.span(span_steps[0].index,
                                     span_steps[n_commit - 1].index,
                                     int(stats.substeps[:n_commit].sum()),
                                     int(stats.failed[:n_commit].sum()),
                                     int(stats.newtons[:n_commit].sum()))
                        # ONE batched device->host pull for the whole
                        # chunk's stacked states + derived arrays (the
                        # per-step pulls were the 4.4x output-on penalty)
                        span_host = None
                        if span_emit_states and span_states is not None:
                            span_host = jax.tree.map(host_value,
                                                     span_states)
                        for k, s2 in enumerate(span_steps[:n_commit]):
                            self.report.substeps += int(stats.substeps[k])
                            self.report.failed_substeps += int(
                                stats.failed[k])
                            self.report.newton_iterations += int(
                                stats.newtons[k])
                            self.report.linear_iterations += int(
                                stats.linears[k])
                            self._step_timing.append(
                                (s2.index, s2.end_time / DAY, wall,
                                 int(stats.substeps[k]),
                                 int(stats.newtons[k])))
                            qs_k, bhp_k, fpr_k, fip_k, reg_k, blk_k = \
                                summaries[k]
                            row = self.summary.record_arrays(
                                s2.end_time, qs_k, bhp_k, fpr_k, fip_k,
                                self._thp_report_extra(qs_k, bhp_k),
                                region=reg_k, block=blk_k)
                            if span_host is not None:
                                st_k = jax.tree.map(
                                    lambda a, _k=k: np.asarray(a)[_k],
                                    span_host[0])
                                der_k = tuple(np.asarray(a)[k]
                                              for a in span_host[1])
                                self._write_step_outputs(
                                    st_k, s2, writer, write_restart,
                                    write_vtk, write_matlab,
                                    derived=der_k, on_host=True)
                            if prt is not None:
                                prt.report_step(
                                    s2.index, s2.end_time / DAY, row,
                                    fip=[row["FWIP"], row["FOIP"],
                                         row["FGIP"]])
                            if verbose:
                                print(f"step {s2.index:4d} "
                                      f"t={s2.end_time / DAY:9.1f} d "
                                      f"newton={int(stats.newtons[k]):3d} "
                                      f"FPR={row['FPR'] / 1e5:8.2f} bar "
                                      f"FOPR={row['FOPR'] * DAY:10.1f} "
                                      f"FGOR={row['FGOR']:8.2f}")
                        i_step += n_commit
                        continue
                    # fatal chunk: fall through to the per-step path (the
                    # span-start state is untouched)
            if np.any((ws.control == CTRL_RESV)
                      | (ws.control == CTRL_RESERVOIR_RATE)):
                # RESV voidage coefficients from current region averages
                # (computeRESV, SimulatorBase_impl.hpp:196)
                from opm_tpu.wells.rateconv import well_resv_coefficients
                wd["resv_coef"] = well_resv_coefficients(self.model, state,
                                                         ws)
                hist = ws.is_history & ~ws.is_injector & ws.open_mask
                if np.any(hist):
                    # WCONHIST: the RESV target is the sum of the OBSERVED
                    # surface rates at reservoir conditions
                    # (SimulatorBase_impl.hpp:569-596 historyRates ->
                    # inner_product with the voidage coefficients)
                    coef = np.asarray(wd["resv_coef"])
                    q_obs = np.nan_to_num(
                        ws.rate_targets[:, [1, 0, 2]])   # (w, o, g) order
                    tgt = np.where(hist, (coef * q_obs).sum(axis=1),
                                   np.asarray(ws.target))
                    ws = dc_replace(ws, target=tgt)
                    wd["primary_target"] = jnp.asarray(tgt)
                    state = state._replace(target=jnp.asarray(tgt))
            def solve_fn(s, dt):
                rep = SolverReport()
                stepper = (self.solver.step_fused if self.fused
                           else self.solver.step)
                s2, rep = stepper(s, dt, wd, report=rep)
                self.report.assemble_time += rep.assemble_time
                self.report.linear_solve_time += rep.linear_solve_time
                return s2, rep

            had_event = bool(step.events)
            t_step0 = time.perf_counter()

            def _substep_cb(s, tl, dts, sr, _step=step):
                self.events.signal("timestep_completed", s, tl, dts)
                if prt is not None:
                    prt.substep(_step.index,
                                (_step.start_time + tl) / DAY, dts / DAY,
                                sr.iterations, sr.converged,
                                sr.convergence_history)

            def _fail_cb(tl, dts, exc, _step=step):
                if prt is not None:
                    prt.substep(_step.index,
                                (_step.start_time + tl) / DAY, dts / DAY,
                                0, False, None,
                                failure=type(exc).__name__)

            state, subrep = self.ts.step(
                solve_fn, state, step.end_time - step.start_time,
                had_event=had_event, substep_callback=_substep_cb,
                failure_callback=_fail_cb)
            self._step_timing.append(
                (step.index, step.end_time / DAY,
                 time.perf_counter() - t_step0, subrep.substeps,
                 subrep.total_newton))
            self.events.signal("report_step_completed", state, step)
            self.report.substeps += subrep.substeps
            self.report.failed_substeps += subrep.failed_substeps
            self.report.newton_iterations += subrep.total_newton
            self.report.linear_iterations += subrep.total_linear
            row = self.summary.record(
                step.end_time, state, self.model,
                extra=self._thp_report_extra(state.qs, state.bhp))
            if prt is not None:
                prt.report_step(step.index, step.end_time / DAY, row,
                                fip=[row["FWIP"], row["FOIP"],
                                     row["FGIP"]])
            self._check_econ_limits(step_wells, state, ws, wd)
            self._write_step_outputs(state, step, writer, write_restart,
                                     write_vtk, write_matlab)
            if verbose:
                r = self.summary.rows[-1]
                print(f"step {step.index:4d} t={step.end_time / DAY:9.1f} d "
                      f"newton={subrep.total_newton:3d} "
                      f"FPR={r['FPR'] / 1e5:8.2f} bar "
                      f"FOPR={r['FOPR'] * DAY:10.1f} FGOR={r['FGOR']:8.2f}")
            i_step += 1
        writer.close()
        self.report.total_time = time.perf_counter() - t_start
        if prt is not None:
            prt.final_report(self.report)
            prt.close()
        if self.output_dir:
            # collective on all processes (gathers sharded state)
            fip_reg = fluid_in_place(self.model, state,
                                     regions=self.grid.fipnum)
        if self.output_dir and is_io_process():
            import os
            os.makedirs(self.output_dir, exist_ok=True)
            self.summary.to_csv(
                os.path.join(self.output_dir, "summary.csv"))
            # ECL binary summary (SMSPEC/UNSMRY) for reference tooling
            from opm_tpu.io.eclsum import write_summary
            base = self._out_base()
            write_summary(
                os.path.join(self.output_dir, base), self.summary.rows,
                dims=self.case.runspec.dims,
                start_date=self.case.runspec.start_date,
                unit_system=self.case.runspec.unit_system,
                requested=self.summary.requested_keys)
            if self._unrst_steps:
                from opm_tpu.io.eclsum import write_unrst
                base = self._out_base()
                write_unrst(os.path.join(self.output_dir, base),
                            self._unrst_steps,
                            dims=self.case.runspec.dims,
                            start_date=self.case.runspec.start_date)
            # static geology snapshot + geometry (writeInit role:
            # FlowMain.hpp writeInit -> EclipseIO INIT/EGRID; the
            # Norne-init regression class, compareECLFiles.cmake:141-146)
            from opm_tpu.io.eclsum import write_egrid, write_init
            base = self._out_base()
            write_init(os.path.join(self.output_dir, base), self.grid,
                       unit_system=self.case.runspec.unit_system,
                       start_date=self.case.runspec.start_date)
            try:
                write_egrid(os.path.join(self.output_dir, base), self.case)
            except Exception:
                pass  # synthetic cases without geometric arrays
            # per-FIPNUM-region fluid in place (the reference's FIP report
            # tables, SimulatorBase_impl.hpp FIP output; computed
            # collectively above)
            with open(os.path.join(self.output_dir, "fip_report.txt"),
                      "w") as f:
                f.write("# FIPNUM  water[sm3]  oil[sm3]  gas[sm3]  (end of "
                        "run)\n")
                for r in range(fip_reg.shape[0]):
                    f.write(f"{r + 1:6d}  {fip_reg[r, WATER]:.6e}  "
                            f"{fip_reg[r, OIL]:.6e}  "
                            f"{fip_reg[r, GAS]:.6e}\n")
            # per-step timing breakdown (step_timing.txt / walltime.txt,
            # SimulatorBase_impl.hpp:108,302-304)
            with open(os.path.join(self.output_dir,
                                   "step_timing.txt"), "w") as f:
                f.write("# step  end_days  wall_s  substeps  newtons\n")
                for row in self._step_timing:
                    f.write("%5d %10.2f %8.3f %5d %5d\n" % row)
            with open(os.path.join(self.output_dir, "walltime.txt"),
                      "w") as f:
                f.write(f"{self.report.total_time:.3f}\n")
        return state


def run_deck(path: str, **kw):
    """flow_legacy-style entry: load deck, build, run
    (examples/flow_legacy.cpp:36-44)."""
    case = load_case(path)
    sim = SimulatorFullyImplicitBlackoil(case, **{k: v for k, v in kw.items()
                                                  if k != "verbose"})
    state = sim.run(verbose=kw.get("verbose", False))
    return sim, state
