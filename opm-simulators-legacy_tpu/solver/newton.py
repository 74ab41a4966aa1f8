"""NonlinearSolver: the Newton driver.

Counterpart of /root/reference/opm/autodiff/NonlinearSolver_impl.hpp:119-189
(step loop, min/max iterations, oscillation detection + relaxation
:223-297) and BlackoilModelBase::nonlinearIteration (assemble -> convergence
-> linear solve -> updateState, BlackoilModelBase_impl.hpp:241-340).

Device work is split into two jitted kernels over fixed shapes:
  * _assemble:  residual + convergence norms (cheap, every iteration)
  * _solve:     Jacobian + Newton increment + chopped update
The linear solve is pluggable: a dense jacfwd/solve path for small cases
(exactness reference) and the block-sparse Krylov path in opm_tpu.linalg for
large ones.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.models.blackoil import BlackoilModel
from opm_tpu.models.state import BlackoilState
from opm_tpu.solver.update import update_state
from opm_tpu.wells import standard as stdwells


def _matvec_f32_knob():
    """OPM_TPU_MATVEC_F32: run the Krylov OPERATOR matvec in f32 (matrix
    blocks stored/applied at f32; rhs, recurrence vectors and dot products
    stay f64). 'auto' (default) = on when the backend is a real
    accelerator (f64 there is software-emulated), off on CPU."""
    import os as _os

    v = _os.environ.get("OPM_TPU_MATVEC_F32", "auto")
    if v == "auto":
        try:
            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False
    return v == "1"


def _asm_f32_knob():
    """OPM_TPU_ASM_F32: assemble the Jacobian BLOCKS in f32 (the whole
    linearize.assemble runs on an f32 shadow of model/props/state), while
    the rhs is the f64 residual — reused from the fused Newton body when
    available, recomputed otherwise. Jacobian entries only steer the
    Krylov space and the inexact-Newton direction (1e-2 forcing), so f32
    entry accuracy (~1e-7, ~2e-4 through pressure cancellation in face
    potentials) is far inside tolerance, while Newton convergence remains
    gated by the separate f64 residual/convergence kernel. 'auto' = on for
    real accelerators (f64 is software-emulated there), off on CPU."""
    import os as _os

    v = _os.environ.get("OPM_TPU_ASM_F32", "auto")
    if v == "auto":
        try:
            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False
    return v == "1"


def _krylov_f32_knob():
    """OPM_TPU_KRYLOV_F32: run the WHOLE BiCGStab inner loop in f32
    (vectors, dots, coefficients) with f64 outer true-residual
    verification + refinement restart (krylov.bicgstab_mp). Measured on
    v5e SPE10-132k: the f64 recurrence is ~9 of the 13 ms/iteration.
    'auto' = on for real accelerators, off on CPU. Distinct from
    OPM_TPU_MATVEC_F32 (operator-only) and OPM_TPU_F32_SOLVE (f32 with NO
    f64 verification — diverges at scale)."""
    import os as _os

    v = _os.environ.get("OPM_TPU_KRYLOV_F32", "auto")
    if v == "auto":
        try:
            return jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False
    return v == "1"


def _cpr_freeze_knob():
    """OPM_TPU_CPR_FREEZE: build the CPR preconditioner once per SUBSTEP
    (from the initial Newton state) instead of once per Newton iteration
    — the setup (quasi-IMPES weights, Galerkin coarsening, coarsest
    dense inverse, block inverses) measured ~5 ms/Newton at SPE10-132k.
    The Krylov operator always uses the fresh Jacobian. Default off
    until the A/B shows unchanged iteration counts on the bench decks."""
    import os as _os

    return _os.environ.get("OPM_TPU_CPR_FREEZE", "0") == "1"


def dense_solve(J, r, dtype=None):
    """Dense LU solve with symmetric row/column equilibration.

    TPU has no f64 LU (XLA LuDecomposition is F32/C64 only), so on TPU the
    equilibrated system is solved in f32 — the analogue of the reference's
    single-precision linear-solve path (LinearisedBlackoilResidual
    singlePrecision, BlackoilModelParameters maxSinglePrecisionDays). The
    equilibration (D_r J D_c with D = 1/max|row or col|) tames the mixed
    Pa/saturation/rate unit scales so f32 factorization stays accurate."""
    dr = 1.0 / jnp.maximum(jnp.max(jnp.abs(J), axis=1), 1e-300)
    Js = J * dr[:, None]
    dc = 1.0 / jnp.maximum(jnp.max(jnp.abs(Js), axis=0), 1e-300)
    Js = Js * dc[None, :]
    rs = r * dr
    if dtype is not None and dtype != Js.dtype:
        du_s = jnp.linalg.solve(Js.astype(dtype), rs.astype(dtype))
        # one step of iterative refinement in f64
        resid = rs - Js @ du_s.astype(Js.dtype)
        corr = jnp.linalg.solve(Js.astype(dtype), resid.astype(dtype))
        du_s = du_s.astype(Js.dtype) + corr.astype(Js.dtype)
    else:
        du_s = jnp.linalg.solve(Js, rs)
    return du_s * dc


class NumericalIssue(Exception):
    """Raised on non-finite or exploding residuals (the reference throws
    Opm::NumericalIssue at BlackoilModelBase_impl.hpp:1562-1586); caught by
    adaptive timestepping to chop dt."""


class TooManyIterations(Exception):
    pass


class LinearSolverProblem(Exception):
    """Linear solver failed to reach its reduction target (the reference
    throws Dune::ISTLError / LinearSolverProblem; caught by the dt-chop
    retry loop, AdaptiveTimeStepping_impl.hpp:235-373)."""


@dataclass
class SolverReport:
    iterations: int = 0
    converged: bool = False
    assemble_time: float = 0.0
    linear_solve_time: float = 0.0
    update_time: float = 0.0
    linear_iterations: int = 0
    # per-Newton convergence table rows [mb_w mb_o mb_g cnv_w cnv_o cnv_g
    # well_flux well_ctrl] (the PRT-log table; NaN rows = unused slots)
    convergence_history: object = None


class NonlinearSolver:
    """linear_solver: 'dense' (small cases; exactness reference),
    'cpr' (block-sparse BiCGStab + CPR-AMG; the scalable TPU path — the
    analogue of NewtonIterationBlackoilCPR/Interleaved), or 'auto'."""

    DENSE_LIMIT = 2000  # cells; above this 'auto' switches to CPR

    def __init__(self, model: BlackoilModel, linear_solver: str = "auto",
                 max_iter: Optional[int] = None, min_iter: int = 1,
                 relax_max: float = 0.5, relax_increment: float = 0.1,
                 relax_rel_tol: float = 0.2,
                 linear_tol: float = 1e-2, linear_maxiter: int = 50,
                 schwarz=None):
        self.model = model
        if linear_solver == "auto":
            linear_solver = "dense" if model.nc <= self.DENSE_LIMIT else "cpr"
        self.linear_solver = linear_solver
        self.max_iter = max_iter or model.params.max_iter
        self.min_iter = min_iter
        self.relax_max = relax_max
        self.relax_increment = relax_increment
        self.relax_rel_tol = relax_rel_tol
        self.linear_tol = linear_tol
        self.linear_maxiter = linear_maxiter
        # TPU: no f64 LU in XLA -> equilibrated f32 solve + refinement
        self.solve_dtype = (jnp.float32 if jax.default_backend()
                            not in ("cpu",) else None)
        # fully-active cartesian grids get the gather-free structured path
        # (stencil matvec + semicoarsened GMG) on every backend
        # (OPM_TPU_GMG=0/1 overrides). Measured (SPE9 full schedule, CPU):
        # GMG 123 Newtons / 2 failed substeps / 47 s vs aggregation AMG
        # 149 / 7 / 62 s — the old "aggregation wins on CPU" default was
        # wrong on hard systems (day-300 rate-cut class).
        import os as _os

        self._dims = (tuple(model.grid.dims)
                      if getattr(model.grid, "structured", False) else None)
        use_gmg = self._dims is not None and \
            _os.environ.get("OPM_TPU_GMG", "1") == "1"
        self._schur = _os.environ.get("OPM_TPU_SCHUR", "1") == "1"
        # f32 Krylov solve (reference singlePrecision path); f64 elsewhere
        self._f32_solve = _os.environ.get("OPM_TPU_F32_SOLVE", "0") == "1"
        if linear_solver == "cpr":
            if schwarz is not None and self._dims is not None:
                # shard-local additive-Schwarz GMG: V-cycles inside
                # shard_map, zero collectives per preconditioner apply
                # (parallel/schwarz.py). schwarz = (mesh, axis_name).
                from opm_tpu.parallel.schwarz import SchwarzGmg

                mesh, ax = schwarz
                self.amg = SchwarzGmg(
                    tuple(model.grid.dims), mesh, ax,
                    model.grid.trans[:model.grid.nf_canonical])
            elif use_gmg:
                from opm_tpu.linalg.gmg import StructuredGmg

                self.amg = StructuredGmg(
                    self._dims,
                    model.grid.trans[:model.grid.nf_canonical])
            else:
                from opm_tpu.linalg.amg import build_hierarchy

                self.amg = build_hierarchy(
                    model.nc, model.grid.face_cells,
                    model.grid.trans).device()
            self._solve_jit = jax.jit(self._solve_cpr)
        else:
            self.amg = None
            self._solve_jit = jax.jit(self._solve_dense)
        self._assemble_jit = jax.jit(self._assemble)
        self._cdp_jit = jax.jit(self._cdp)
        self.last_linear_iterations = 0
        # f32 shadow model for OPM_TPU_ASM_F32, built EAGERLY: a lazy
        # build inside the first jit trace caches traced casts of the
        # model constants, and any LATER distinct jit of _solve_cpr then
        # trips UnexpectedTracerError on the stale cache
        self._model32 = None
        if linear_solver == "cpr" and _asm_f32_knob():
            from opm_tpu.utils.cast import shadow_model

            self._model32 = shadow_model(model, jnp.float32)

    # -- jitted kernels --------------------------------------------------
    def _cdp(self, state, wd):
        """Two-pass wellbore pressure profile: well-level mixture first,
        then refine with the implied perforation rates (the reference uses
        the previous state's perfPhaseRates; one lagged pass is the same
        information). Cell quantities are evaluated PERF-LOCALLY — only
        the perforated cells, not the grid (a full-grid f64 PVT sweep
        here cost 13.5 ms/substep at SPE10-132k for ~50 used cells)."""
        cellq = self.model.well_cell_quantities_local(state, wd)
        cdp0 = stdwells.connection_pressure_offsets(wd, cellq, state.qs)
        cq = stdwells.perforation_fluxes(
            wd, cellq, state.bhp, state.qs, cdp0,
            allow_crossflow=self.model.params.allow_crossflow)
        return stdwells.connection_pressure_offsets(wd, cellq, state.qs,
                                                    perf_rates=cq)

    def _assemble(self, state, acc0, dt, wd, cdp):
        res = self.model.residual(state, acc0, dt, wd, cdp)
        conv = self.model.convergence(res, dt, state)
        ctrl, tgt = stdwells.update_controls(
            wd, state.bhp, state.qs, state.control, state.target,
            cq_sum=state.qs - res.well_flux)
        return res, conv, ctrl, tgt

    def _solve_dense(self, state, acc0, dt, wd, cdp, omega):
        model = self.model

        def rfun(u):
            s = model.unflatten(u, state)
            res = model.residual(s, acc0, dt, wd, cdp)
            return model.residual_vector(res)

        u = model.flatten(state)
        r = rfun(u)
        J = jax.jacfwd(rfun)(u)
        # regularize the degenerate (gas-eq, rs-var) diagonal of
        # hydrocarbon-free cells (see models/linearize.py); residual_vector
        # is equation-major, so gas-equation rows are the third nc-block
        from opm_tpu.models.linearize import degenerate_x_mask
        nc = model.nc
        mask = degenerate_x_mask(model, state)
        rows = 2 * nc + jnp.arange(nc)
        cols = 2 * nc + jnp.arange(nc)
        J = J.at[rows, cols].add(mask * model.pv / dt)
        du = dense_solve(J, r, self.solve_dtype)
        du = omega * du
        return update_state(model, state, du), jnp.asarray(1), \
            jnp.asarray(True)

    def _assemble_sys(self, state, acc0, dt, wd, cdp, res64=None):
        """Block-sparse system assembly shared by _solve_cpr and the
        frozen-preconditioner build (f32 shadow under OPM_TPU_ASM_F32
        with the f64 residual spliced as rhs when provided)."""
        from opm_tpu.models import linearize

        model = self.model
        if _asm_f32_knob():
            from opm_tpu.utils.cast import cast_floats, shadow_model

            m32 = self._model32
            if m32 is None:
                m32 = shadow_model(model, jnp.float32)
            f32 = jnp.float32
            sys = linearize.assemble(
                m32, cast_floats(state, f32),
                cast_floats(acc0, f32), cast_floats(dt, f32),
                cast_floats(wd, f32), cast_floats(cdp, f32))
            if res64 is None:
                res64 = model.residual(state, acc0, dt, wd, cdp)
            sys = sys._replace(
                r_cell=res64.cell,
                r_well=jnp.concatenate(
                    [res64.well_flux, res64.well_ctrl[:, None]], axis=1))
            return sys
        return linearize.assemble(model, state, acc0, dt, wd, cdp)

    def _build_cpr_M(self, state, acc0, dt, wd, cdp):
        """Preconditioner built once per substep from the initial Newton
        state (OPM_TPU_CPR_FREEZE): quasi-IMPES weights + GMG/AMG
        hierarchy + coarsest inverse are reused across the substep's
        Newton iterations — the CPR setup measured ~5 ms/Newton at
        SPE10-132k while the Jacobian changes little within a substep
        (the reference likewise reuses its preconditioner when the
        matrix changes little). The Krylov OPERATOR always uses the
        fresh Jacobian; only the preconditioner lags, so correctness is
        untouched and only iteration counts can move (A/B-gated)."""
        from opm_tpu.linalg.precond import make_cpr, make_cpr_cells

        # the rhs in sys is irrelevant to the preconditioner; pass a
        # zero-cost dummy res64 path by reusing the f64 residual only
        # when assembly needs it
        sys = self._assemble_sys(state, acc0, dt, wd, cdp)
        if self._schur:
            return make_cpr_cells(sys, self.amg, dims=self._dims)
        return make_cpr(sys, self.amg, dims=self._dims)

    def _solve_cpr(self, state, acc0, dt, wd, cdp, omega, res64=None,
                   M_frozen=None):
        """Block-sparse assembly + BiCGStab/CPR-AMG Newton increment
        (computeNewtonIncrement analogue,
        NewtonIterationBlackoilCPR.cpp:80-185). Well unknowns are
        Schur-eliminated by default (eliminateVariable/recoverVariable,
        NewtonIterationUtilities.cpp:45-184) so the Krylov space holds only
        cell dofs; OPM_TPU_SCHUR=0 keeps wells in the Krylov system.
        res64: optional precomputed f64 Residual at `state` (the fused
        body's convergence residual) — reused as the rhs under
        OPM_TPU_ASM_F32 so the f32 assembly never degrades the rhs.
        M_frozen: optional substep-frozen preconditioner (_build_cpr_M)."""
        import os as _os

        from opm_tpu.linalg.krylov import bicgstab, gmres
        from opm_tpu.linalg.precond import make_cpr, make_cpr_cells
        from opm_tpu.models import linearize

        # linear_solver_use_gmres analogue (ISTLSolver.hpp:263-268)
        krylov = gmres if _os.environ.get("OPM_TPU_KRYLOV",
                                          "bicgstab") == "gmres" \
            else bicgstab

        model = self.model
        if _asm_f32_knob():
            # f32 Jacobian assembly on the f32 shadow model; f64 rhs from
            # the (reused or recomputed) f64 residual. sys.r_well layout
            # [flux_res | ctrl_res] is pinned bit-equal to the Residual
            # well rows by tests/test_linalg.py::test_asm_f32_*.
            from opm_tpu.utils.cast import cast_floats, shadow_model

            # the shadow model is cached eagerly in __init__; if the
            # knob flipped after construction, build a trace-local copy
            # WITHOUT caching it (a cached in-trace build leaks tracers
            # into later jits of this method)
            m32 = self._model32
            if m32 is None:
                m32 = shadow_model(model, jnp.float32)
            f32 = jnp.float32
            sys = linearize.assemble(
                m32, cast_floats(state, f32),
                cast_floats(acc0, f32), cast_floats(dt, f32),
                cast_floats(wd, f32), cast_floats(cdp, f32))
            if res64 is None:
                res64 = model.residual(state, acc0, dt, wd, cdp)
            sys = sys._replace(
                r_cell=res64.cell,
                r_well=jnp.concatenate(
                    [res64.well_flux, res64.well_ctrl[:, None]], axis=1))
        else:
            sys = linearize.assemble(model, state, acc0, dt, wd, cdp)
        if self._f32_solve:
            # single-precision linear solve (the reference's
            # LinearisedBlackoilResidual singlePrecision path,
            # maxSinglePrecisionDays): the Krylov loop is bandwidth-bound
            # and the 1e-2 reduction target is far above f32 resolution;
            # the Newton update is applied in f64
            sys = jax.tree.map(
                lambda a: (a.astype(jnp.float32)
                           if jnp.issubdtype(a.dtype, jnp.floating) else a),
                sys)
        # mixed-precision Krylov operator (OPM_TPU_MATVEC_F32, default on
        # for TPU where f64 is software-emulated): the matvec runs in f32,
        # the rhs / recurrence vectors / dot products stay f64 — an
        # f32-accurate operator apply (~1e-7 rel) is far inside the 1e-2
        # linear reduction target. Distinct from OPM_TPU_F32_SOLVE (whole
        # solve in f32, measured to destabilize SPE10-scale runs).
        op_dtype = jnp.float32 if _matvec_f32_knob() else None
        if self._schur:
            mv, rhs, recover = linearize.schur_eliminate_wells(
                sys, dims=self._dims, op_dtype=op_dtype)
            M = (M_frozen if M_frozen is not None
                 else make_cpr_cells(sys, self.amg, dims=self._dims))
            if krylov is bicgstab and _krylov_f32_knob():
                # all-f32 inner Krylov + f64 true-residual refinement
                # (bicgstab_mp): mv/M preserve input dtype, so the f32
                # inner loop and the f64 verification share the closures
                from opm_tpu.linalg.krylov import bicgstab_mp
                mv64, _, _ = linearize.schur_eliminate_wells(
                    sys, dims=self._dims, op_dtype=None)
                # NOTE (measured dead end): flattening the Krylov space
                # to (3*nc,) to avoid the (3, nc) carry relayout copies
                # REGRESSED the span path 20.2 -> 23.6 ms/Newton — the
                # reshapes forced layout conversions inside the matvec
                # instead. Keep (3, nc) vectors.
                res = bicgstab_mp(mv, rhs, precond=M, matvec_check=mv64,
                                  tol=self.linear_tol,
                                  maxiter=self.linear_maxiter)
            else:
                res = krylov(mv, rhs, precond=M, tol=self.linear_tol,
                             maxiter=self.linear_maxiter)
            du_c = res.x
            du_w = recover(du_c)
        else:
            M = (M_frozen if M_frozen is not None
                 else make_cpr(sys, self.amg, dims=self._dims))
            sys_op = sys if op_dtype is None else jax.tree.map(
                lambda a: (a.astype(op_dtype)
                           if jnp.issubdtype(a.dtype, jnp.floating) else a),
                sys)

            def full_mv(v):
                vc, vw = v
                oc, ow = linearize.matvec(
                    sys_op, vc.astype(sys_op.op_dtype),
                    vw.astype(sys_op.op_dtype), dims=self._dims)
                return oc.astype(vc.dtype), ow.astype(vw.dtype)

            res = krylov(
                full_mv,
                (sys.r_cell, sys.r_well), precond=M,
                tol=self.linear_tol, maxiter=self.linear_maxiter)
            du_c, du_w = res.x      # du_c: (3, nc)
        du = jnp.concatenate([
            du_c[0], du_c[1], du_c[2],
            du_w[:, 3], du_w[:, :3].reshape(-1)])
        du = (omega * du).astype(state.pressure.dtype)
        return update_state(model, state, du), res.iterations, res.converged

    # -- host loop ---------------------------------------------------------
    def step(self, state0: BlackoilState, dt: float, wd,
             report: Optional[SolverReport] = None):
        """One (sub)timestep: Newton to convergence. Returns (state, report).
        Raises NumericalIssue / TooManyIterations for the dt-chop retry loop
        (AdaptiveTimeStepping_impl.hpp:235-373)."""
        model = self.model
        rep = report or SolverReport()
        state = state0
        acc0 = model.accumulation(state0)
        dt = jnp.asarray(dt, dtype=jnp.float64)
        # explicit wellbore pressure profile, frozen after initial assembly
        # (computeWellConnectionPressures at BlackoilModelBase_impl.hpp:804)
        cdp = self._cdp_jit(state, wd)
        if model.params.solve_welleq_initially:
            if not hasattr(self, "_welleq_jit"):
                self._welleq_jit = jax.jit(self._solve_welleq)
            state = self._welleq_jit(state, acc0, dt, wd, cdp)
        omega = 1.0
        mb_history = []
        for it in range(self.max_iter + 1):
            t0 = time.perf_counter()
            res, conv, ctrl, tgt = self._assemble_jit(state, acc0, dt, wd,
                                                      cdp)
            finite = bool(conv["finite"])
            converged = bool(conv["converged"])
            if rep.convergence_history is None:
                rep.convergence_history = []
            rep.convergence_history.append(np.concatenate([
                np.asarray(conv["mb"]), np.asarray(conv["cnv"]),
                [float(conv["well_flux"])], [float(conv["well_ctrl"])]]))
            rep.assemble_time += time.perf_counter() - t0
            if not finite:
                raise NumericalIssue(
                    f"non-finite residual at iteration {it}: "
                    f"mb={np.asarray(conv['mb'])} cnv={np.asarray(conv['cnv'])}")
            if converged and it >= self.min_iter:
                rep.converged = True
                rep.iterations = it
                return state, rep
            if it == self.max_iter:
                break
            state = state._replace(control=ctrl, target=tgt)
            mb_history.append(np.asarray(conv["mb"]))
            if self._oscillating(mb_history):
                omega = max(self.relax_max, omega - self.relax_increment)
            t0 = time.perf_counter()
            state, lin_iters, lin_ok = self._solve_jit(
                state, acc0, dt, wd, cdp, jnp.asarray(omega))
            jax.block_until_ready(state.pressure)
            rep.linear_solve_time += time.perf_counter() - t0
            rep.linear_iterations += int(lin_iters)
            rep.iterations = it + 1
            if not bool(lin_ok):
                raise LinearSolverProblem(
                    f"linear solver stalled after {int(lin_iters)} "
                    f"iterations at Newton {it}")
        raise TooManyIterations(
            f"Newton failed to converge in {self.max_iter} iterations "
            f"(mb={np.asarray(conv['mb'])}, cnv={np.asarray(conv['cnv'])})")

    def _solve_welleq(self, state, acc0, dt, wd, cdp):
        """Inner well-equation Newton with reservoir variables frozen
        (solveWellEq, BlackoilModelBase_impl.hpp:1019-1133: up to
        max_welleq_iter iterations on (q_s, bhp) only, Eigen SparseLU there,
        batched dense 4x4-bordered solve here via jacfwd over the well
        variables). Run at the start of each substep when
        solve_welleq_initially is set — stabilizes control switching.

        The residual is PERF-LOCAL: cell quantities are evaluated only at
        the (nw*mp) perforated cells, so the jacfwd over the 4*nw well
        variables never materializes nc-sized tangents (over the full
        residual that costs 4*nw copies of every cell intermediate — the
        difference between fitting and OOMing a 1M-cell case)."""
        from opm_tpu.models.blackoil import (compute_cell_quantities,
                                             props_local_view)

        model = self.model
        nw = state.bhp.shape[0]
        if nw == 0:
            return state
        pc_f = wd["perf_cell"].reshape(-1)
        nw_, mp = wd["perf_cell"].shape
        sg_pf = None if state.sgmax is None else state.sgmax[pc_f]
        ireg_pf = None if model.imbnum is None else model.imbnum[pc_f]
        so_pf = None if state.somax is None else state.somax[pc_f]
        q_pf = compute_cell_quantities(
            props_local_view(model.props, pc_f),
            state.pressure[pc_f], state.sw[pc_f],
            state.x[pc_f], state.hcstate[pc_f], model.pvtnum[pc_f],
            model.satnum[pc_f], sgmax=sg_pf, ireg=ireg_pf, somax=so_pf)
        b_pf = jnp.moveaxis(q_pf.b, 0, -1).reshape(nw_, mp, 3)
        mob_pf = jnp.moveaxis(q_pf.mob, 0, -1).reshape(nw_, mp, 3)
        po_pf = q_pf.po.reshape(nw_, mp)
        rs_pf = q_pf.rs.reshape(nw_, mp)
        rv_pf = q_pf.rv.reshape(nw_, mp)
        mask = wd["perf_mask"] * wd["open"][:, None]

        def rfun_w(u, s):
            qs = u[:3 * nw].reshape(nw, 3)
            bhp = u[3 * nw:]
            cmix = stdwells.wellbore_mixture(qs, wd["comp_frac"],
                                             wd["is_injector"])
            cq_s = stdwells.perf_flux_formula(
                po_pf, b_pf, mob_pf, rs_pf, rv_pf, wd["perf_wi"],
                bhp[:, None] + cdp,
                jnp.broadcast_to(cmix[:, None, :], (nw_, mp, 3)),
                jnp.broadcast_to(wd["is_injector"][:, None], (nw_, mp)),
                allow_crossflow=model.params.allow_crossflow)
            cq_s = cq_s * mask[..., None]
            flux_res, ctrl_res = stdwells.well_residuals(
                wd, qs, bhp, cq_s, s.control, s.target,
                resv_coef=wd.get("resv_coef"), vfp=wd.get("vfp"))
            return jnp.concatenate([flux_res.reshape(-1), ctrl_res])

        def body(carry):
            s, it, rn = carry
            ctrl, tgt = stdwells.update_controls(
                wd, s.bhp, s.qs, s.control, s.target)
            s = s._replace(control=ctrl, target=tgt)
            u = jnp.concatenate([s.qs.reshape(-1), s.bhp])
            r = rfun_w(u, s)
            J = jax.jacfwd(lambda v: rfun_w(v, s))(u)
            du = dense_solve(J, r, self.solve_dtype)
            dbhp = jnp.clip(du[3 * nw:],
                            -model.params.dp_max_rel * jnp.abs(s.bhp),
                            model.params.dp_max_rel * jnp.abs(s.bhp))
            s = s._replace(qs=s.qs - du[:3 * nw].reshape(nw, 3),
                           bhp=s.bhp - dbhp)
            rn = jnp.linalg.norm(rfun_w(
                jnp.concatenate([s.qs.reshape(-1), s.bhp]), s))
            return (s, it + 1, rn)

        def cond(carry):
            s, it, rn = carry
            return (rn > 1e-10) & (it < model.params.max_welleq_iter) & \
                jnp.isfinite(rn)

        r0 = jnp.linalg.norm(rfun_w(
            jnp.concatenate([state.qs.reshape(-1), state.bhp]), state))
        s, it, rn = jax.lax.while_loop(cond, body,
                                       (state, jnp.asarray(0), r0))
        # keep the pre-solve state if the inner solve diverged
        ok = jnp.isfinite(rn) & (rn <= r0 + 1e-30)
        return jax.tree.map(lambda a, b: jnp.where(ok, a, b), s, state)

    # -- fused path: the whole Newton loop in ONE device program ----------
    def _fused_substep(self, state0, dt, wd):
        """Entire substep as a lax.while_loop: assemble -> convergence ->
        control switching -> solve -> chopped update, with oscillation
        relaxation carried on-device. One host sync per substep instead of
        ~3 per Newton iteration — the difference between tunnel-latency-bound
        and compute-bound on TPU."""
        model = self.model
        acc0 = model.accumulation(state0)
        cdp = self._cdp(state0, wd)
        if model.params.solve_welleq_initially:
            state0 = self._solve_welleq(state0, acc0, dt, wd, cdp)
        max_iter = self.max_iter
        min_iter = self.min_iter

        if self.linear_solver == "cpr":
            # OPM_TPU_CPR_FREEZE: build the CPR preconditioner ONCE per
            # substep from the initial Newton state (closed over by the
            # loop body as a loop-invariant); the Krylov operator still
            # uses each iteration's fresh Jacobian (_build_cpr_M)
            M0 = None
            if _cpr_freeze_knob():
                M0 = self._build_cpr_M(state0, acc0, dt, wd, cdp)
            # res64: the body's f64 convergence residual, reused as the
            # Krylov rhs under OPM_TPU_ASM_F32 (it is not stale: control
            # switching changes only state.control/target, which enter the
            # residual through the freshly-assembled well ctrl rows)
            solve = lambda s, omega, res64: self._solve_cpr(
                s, acc0, dt, wd, cdp, omega, res64=res64, M_frozen=M0)
        else:
            solve = lambda s, omega, res64: self._solve_dense(
                s, acc0, dt, wd, cdp, omega)

        def body(carry):
            state, it, done, bad, lin_tot, mb_hist, omega, hist = carry
            res = model.residual(state, acc0, dt, wd, cdp)
            conv = model.convergence(res, dt, state)
            ctrl, tgt = stdwells.update_controls(
                wd, state.bhp, state.qs, state.control, state.target,
                cq_sum=state.qs - res.well_flux)
            state = state._replace(control=ctrl, target=tgt)
            converged = conv["converged"] & (it >= min_iter)
            finite = conv["finite"]
            # per-iteration convergence table row (the reference's
            # per-Newton MB/CNV log, BlackoilModelBase_impl.hpp:1790-1826)
            hist = hist.at[it].set(jnp.concatenate([
                conv["mb"], conv["cnv"],
                jnp.reshape(conv["well_flux"], (1,)),
                jnp.reshape(conv["well_ctrl"], (1,))]))
            # oscillation detection on the MB history
            mb = conv["mb"]
            f0, f1 = mb_hist[0], mb_hist[1]
            d1 = (mb - f1) / jnp.maximum(jnp.abs(f1), 1e-300)
            d2 = (f1 - f0) / jnp.maximum(jnp.abs(f1), 1e-300)
            osc = jnp.sum((d1 * d2 < 0)
                          & (jnp.minimum(jnp.abs(d1), jnp.abs(d2))
                             > self.relax_rel_tol)) >= 2
            omega = jnp.where(osc & (it >= 2),
                              jnp.maximum(self.relax_max,
                                          omega - self.relax_increment),
                              omega)
            mb_hist = (f1, mb)

            def do_solve(s):
                s2, lin, ok = solve(s, omega, res)
                return s2, lin, ok

            def skip(s):
                return s, jnp.asarray(0), jnp.asarray(True)

            state2, lin, lin_ok = jax.lax.cond(converged | ~finite, skip,
                                               do_solve, state)
            return (state2, it + 1, converged, ~finite | ~lin_ok,
                    lin_tot + lin, mb_hist, omega, hist)

        def cond(carry):
            _, it, done, bad, *_ = carry
            return ~done & ~bad & (it <= max_iter)

        mb0 = jnp.full(3, jnp.inf)
        hist0 = jnp.full((max_iter + 2, 8), jnp.nan)
        init = (state0, jnp.asarray(0), jnp.asarray(False),
                jnp.asarray(False), jnp.asarray(0), (mb0, mb0),
                jnp.asarray(1.0), hist0)
        (state, it, done, bad, lin_tot, _, _,
         hist) = jax.lax.while_loop(cond, body, init)
        return state, done, bad, it, lin_tot, hist

    def step_fused(self, state0: BlackoilState, dt: float, wd,
                   report: Optional[SolverReport] = None):
        """Fused-substep front end with the same contract as step()."""
        rep = report or SolverReport()
        if not hasattr(self, "_fused_jit"):
            self._fused_jit = jax.jit(self._fused_substep)
        t0 = time.perf_counter()
        dt = jnp.asarray(dt, dtype=jnp.float64)
        state, done, bad, it, lin, hist = self._fused_jit(state0, dt, wd)
        done = bool(done)
        bad = bool(bad)
        rep.iterations = max(int(it) - 1, 0)
        rep.linear_iterations = int(lin)
        rep.convergence_history = hist   # (max_iter+2, 8) device array
        rep.linear_solve_time += time.perf_counter() - t0
        if bad:
            raise NumericalIssue("non-finite residual in fused substep")
        if not done:
            raise TooManyIterations(
                f"fused substep: no convergence in {self.max_iter} iters")
        rep.converged = True
        return state, rep

    def _oscillating(self, history, num_phases=3):
        """Oscillation detection on the MB-residual history
        (NonlinearSolver_impl.hpp:223-255): two phases with alternating
        residual changes larger than relax_rel_tol."""
        if len(history) < 3:
            return False
        f0, f1, f2 = history[-3], history[-2], history[-1]
        osc = 0
        for ph in range(num_phases):
            d1 = (f2[ph] - f1[ph]) / max(abs(f1[ph]), 1e-300)
            d2 = (f1[ph] - f0[ph]) / max(abs(f1[ph]), 1e-300)
            if d1 * d2 < 0 and min(abs(d1), abs(d2)) > self.relax_rel_tol:
                osc += 1
        return osc >= 2
