"""Linear-solver layer tests (the role of
/root/reference/tests/test_linearsolver.cpp plus assembly consistency that
the reference gets by construction from AutoDiffBlock)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.linalg.amg import build_hierarchy
from opm_tpu.linalg.krylov import bicgstab, gmres
from opm_tpu.linalg.precond import inv3x3, inv4x4

SPE1 = os.path.join(os.path.dirname(__file__), "..", "data", "SPE1CASE2.DATA")


def test_inv3x3():
    rng = np.random.RandomState(0)
    m = jnp.asarray(rng.randn(10, 3, 3) + 3 * np.eye(3))
    inv = inv3x3(m)
    eye = jnp.einsum("nij,njk->nik", m, inv)
    assert np.allclose(eye, np.eye(3), atol=1e-12)


def test_inv4x4():
    rng = np.random.RandomState(1)
    m = jnp.asarray(rng.randn(7, 4, 4) + 4 * np.eye(4))
    inv = inv4x4(m)
    eye = jnp.einsum("nij,njk->nik", m, inv)
    # inv4x4 is a Tikhonov-regularized inverse (lam=1e-10 in the
    # equilibrated metric) — exact to ~lam on well-conditioned blocks
    assert np.allclose(eye, np.eye(4), atol=1e-8)


def _laplacian_1d(n):
    """1-D Laplacian as the reference's parallel-solver test does
    (tests/test_parallel_linearsolver.cpp create1DLaplacian)."""
    main = 2.0 * np.ones(n)
    face_cells = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    return main, face_cells


def test_bicgstab_laplacian():
    n = 100
    main, fc = _laplacian_1d(n)
    diag = jnp.asarray(main)
    c1 = jnp.asarray(fc[:, 0])
    c2 = jnp.asarray(fc[:, 1])

    def matvec(x):
        y = diag * x
        y = y.at[c1].add(-x[c2])
        y = y.at[c2].add(-x[c1])
        return y

    rng = np.random.RandomState(2)
    x_true = jnp.asarray(rng.randn(n))
    b = matvec(x_true)
    res = bicgstab(matvec, b, tol=1e-10, maxiter=300)
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), np.asarray(x_true), atol=1e-6)


def test_gmres_laplacian():
    n = 60
    main, fc = _laplacian_1d(n)
    diag = jnp.asarray(main)
    c1 = jnp.asarray(fc[:, 0])
    c2 = jnp.asarray(fc[:, 1])

    def matvec(x):
        y = diag * x
        y = y.at[c1].add(-x[c2])
        y = y.at[c2].add(-x[c1])
        return y

    b = jnp.ones(n)
    res = gmres(matvec, b, tol=1e-6, maxiter=120, restart=30)
    r = np.asarray(b - matvec(res.x))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-5


def test_amg_poisson():
    """V-cycle as a preconditioner must beat plain Jacobi on a 2-D Poisson
    problem built from a cartesian grid's trans graph."""
    from opm_tpu.grid import cartesian_grid
    g = cartesian_grid((32, 32, 1), (32.0, 32.0, 1.0))
    nc = g.nc
    # scalar TPFA matrix: diag = sum of trans, off = -trans
    fc = g.face_cells
    trans = np.ones(len(fc))
    diag = np.zeros(nc)
    np.add.at(diag, fc[:, 0], trans)
    np.add.at(diag, fc[:, 1], trans)
    diag += 1e-3  # slight regularization (compressibility analogue)
    hier = build_hierarchy(nc, fc, trans, coarsest=32)
    assert len(hier.levels) >= 2
    amg = hier.device()
    off = jnp.concatenate([jnp.asarray(-trans), jnp.asarray(-trans)])
    vals = amg.coarsen_values(jnp.asarray(diag), off)

    c1 = jnp.asarray(fc[:, 0])
    c2 = jnp.asarray(fc[:, 1])

    def matvec(x):
        y = jnp.asarray(diag) * x
        y = y.at[c1].add(-x[c2])
        y = y.at[c2].add(-x[c1])
        return y

    rng = np.random.RandomState(3)
    b = jnp.asarray(rng.randn(nc))
    res = bicgstab(matvec, b, precond=lambda r: amg.vcycle(vals, r),
                   tol=1e-8, maxiter=60)
    assert bool(res.converged), float(res.rel_residual)
    assert int(res.iterations) < 30  # AMG keeps iterations low
    # galerkin coarsening conserves row sums of the singular part
    assert np.isfinite(np.asarray(vals[-1][0])).all()


@pytest.fixture(scope="module")
def spe1_system():
    from opm_tpu.io.eclstate import load_case
    from opm_tpu.models import linearize
    from opm_tpu.models.blackoil import make_well_device_arrays
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.wells import standard as stdwells

    case = load_case(SPE1)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = sim.run(report_step_limit=1)
    model = sim.model
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[1]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    q = model.cell_quantities(state)
    cdp = stdwells.connection_pressure_offsets(
        wd, model.well_cell_quantities(q), state.qs)
    acc0 = model.accumulation(state)
    dt = jnp.asarray(86400.0 * 5)
    sys = linearize.assemble(model, state, acc0, dt, wd, cdp)
    return model, state, acc0, dt, wd, cdp, sys


def test_block_assembly_matches_dense(spe1_system):
    """The block-sparse Jacobian must equal the dense jacfwd Jacobian of the
    full residual — assembly and residual share local functions, this pins
    the scatter bookkeeping."""
    model, state, acc0, dt, wd, cdp, sys = spe1_system
    nc = model.nc
    nw = state.bhp.shape[0]

    def rfun(u):
        s = model.unflatten(u, state)
        return model.residual_vector(model.residual(s, acc0, dt, wd, cdp))

    u0 = model.flatten(state)
    J = np.asarray(jax.jacfwd(rfun)(u0))
    r_ref = np.asarray(rfun(u0))

    # residual agreement (residual_vector is equation-major, = (3,nc) flat)
    assert np.allclose(np.asarray(sys.r_cell).reshape(-1), r_ref[:3 * nc],
                       rtol=0, atol=1e-12)

    # J @ v agreement through the block matvec, random probes
    from opm_tpu.models.linearize import matvec as block_matvec
    rng = np.random.RandomState(4)
    for _ in range(3):
        v = rng.randn(len(u0))
        v_cell = jnp.asarray(
            np.stack([v[:nc], v[nc:2 * nc], v[2 * nc:3 * nc]], axis=0))
        v_well = jnp.asarray(np.concatenate(
            [v[3 * nc + nw:].reshape(nw, 3), v[3 * nc:3 * nc + nw, None]],
            axis=1))
        out_c, out_w = block_matvec(sys, v_cell, v_well)
        ref = J @ v
        ref_c = ref[:3 * nc].reshape(3, nc)
        ref_wf = ref[3 * nc:3 * nc + 3 * nw].reshape(nw, 3)
        ref_ct = ref[3 * nc + 3 * nw:]
        scale = np.abs(ref).max()
        assert np.allclose(np.asarray(out_c), ref_c, atol=1e-9 * scale)
        assert np.allclose(np.asarray(out_w)[:, :3], ref_wf,
                           atol=1e-9 * scale)
        assert np.allclose(np.asarray(out_w)[:, 3], ref_ct,
                           atol=1e-9 * scale)


def test_cpr_solves_newton_system(spe1_system):
    """BiCGStab + CPR must reach the reference's default reduction (1e-2,
    ISTLSolver defaults) in well under maxiter on the SPE1 Newton system."""
    from opm_tpu.linalg.precond import make_cpr
    from opm_tpu.models import linearize

    model, state, acc0, dt, wd, cdp, sys = spe1_system
    hier = build_hierarchy(model.nc, model.grid.face_cells, model.grid.trans)
    amg = hier.device()
    M = make_cpr(sys, amg)
    res = bicgstab(lambda v: linearize.matvec(sys, *v),
                   (sys.r_cell, sys.r_well), precond=M, tol=1e-2,
                   maxiter=50)
    assert bool(res.converged)
    assert int(res.iterations) <= 25, int(res.iterations)


def test_structured_matvec_matches_gather(spe1_system):
    """The static-slice stencil matvec (fully-active cartesian fast path)
    must equal the generic gather matvec."""
    from opm_tpu.models.linearize import matvec as block_matvec

    model, state, acc0, dt, wd, cdp, sys = spe1_system
    assert model.grid.structured
    nc = model.nc
    nw = state.bhp.shape[0]
    rng = np.random.RandomState(7)
    v_cell = jnp.asarray(rng.randn(3, nc))
    v_well = jnp.asarray(rng.randn(nw, 4))
    ref_c, ref_w = block_matvec(sys, v_cell, v_well)
    out_c, out_w = block_matvec(sys, v_cell, v_well,
                                dims=tuple(model.grid.dims))
    assert np.allclose(np.asarray(out_c), np.asarray(ref_c), rtol=1e-13)
    assert np.allclose(np.asarray(out_w), np.asarray(ref_w), rtol=1e-13)


def test_gmg_poisson():
    """Structured GMG V-cycle as a preconditioner on a 2-D Poisson problem
    (odd dims exercise the ghost padding)."""
    from opm_tpu.grid import cartesian_grid
    from opm_tpu.linalg.gmg import StructuredGmg

    g = cartesian_grid((33, 31, 1), (33.0, 31.0, 1.0))
    nc = g.nc
    fc = g.face_cells
    trans = np.ones(len(fc))
    diag = np.zeros(nc)
    np.add.at(diag, fc[:, 0], trans)
    np.add.at(diag, fc[:, 1], trans)
    diag += 1e-3
    gmg = StructuredGmg(tuple(g.dims))
    off = jnp.concatenate([jnp.asarray(-trans), jnp.asarray(-trans)])
    vals = gmg.coarsen_values(jnp.asarray(diag), off)

    c1 = jnp.asarray(fc[:, 0])
    c2 = jnp.asarray(fc[:, 1])

    def matvec(x):
        y = jnp.asarray(diag) * x
        y = y.at[c1].add(-x[c2])
        y = y.at[c2].add(-x[c1])
        return y

    rng = np.random.RandomState(5)
    b = jnp.asarray(rng.randn(nc))
    res = bicgstab(matvec, b, precond=lambda r: gmg.vcycle(vals, r),
                   tol=1e-8, maxiter=60)
    assert bool(res.converged), float(res.rel_residual)
    assert int(res.iterations) < 30, int(res.iterations)


def test_gmg_coarsest_threshold_equivalence():
    """OPM_TPU_GMG_COARSEST only truncates the hierarchy where the dense
    inverse takes over: a big-coarsest GMG (fewer levels + exact coarse
    solve) must solve the same Poisson system in no MORE Krylov iterations
    than the deep hierarchy, to the same solution."""
    from opm_tpu.grid import cartesian_grid
    from opm_tpu.linalg.gmg import StructuredGmg

    g = cartesian_grid((24, 20, 6), (24.0, 20.0, 6.0))
    nc = g.nc
    fc = g.face_cells
    trans = np.ones(len(fc))
    diag = np.zeros(nc)
    np.add.at(diag, fc[:, 0], trans)
    np.add.at(diag, fc[:, 1], trans)
    diag += 1e-3
    off = jnp.concatenate([jnp.asarray(-trans), jnp.asarray(-trans)])
    c1 = jnp.asarray(fc[:, 0])
    c2 = jnp.asarray(fc[:, 1])

    def matvec(x):
        y = jnp.asarray(diag) * x
        y = y.at[c1].add(-x[c2])
        y = y.at[c2].add(-x[c1])
        return y

    rng = np.random.RandomState(7)
    b = jnp.asarray(rng.randn(nc))
    its = {}
    sol = {}
    for coarsest in (64, 2048):
        gmg = StructuredGmg(tuple(g.dims), coarsest=coarsest)
        assert (len(gmg.levels) == 0) == (coarsest >= nc)
        vals = gmg.coarsen_values(jnp.asarray(diag), off)
        res = bicgstab(matvec, b,
                       precond=lambda r, v=vals, m=gmg: m.vcycle(v, r),
                       tol=1e-8, maxiter=60)
        assert bool(res.converged), (coarsest, float(res.rel_residual))
        its[coarsest] = int(res.iterations)
        sol[coarsest] = np.asarray(res.x)
    assert its[2048] <= its[64], its
    np.testing.assert_allclose(sol[64], sol[2048], rtol=1e-6, atol=1e-8)


def test_cpr_gmg_solves_newton_system(spe1_system):
    """CPR with the structured GMG pressure stage solves the SPE1 Newton
    system within the same iteration budget as the AMG variant."""
    from opm_tpu.linalg.gmg import StructuredGmg
    from opm_tpu.linalg.precond import make_cpr
    from opm_tpu.models import linearize

    model, state, acc0, dt, wd, cdp, sys = spe1_system
    dims = tuple(model.grid.dims)
    gmg = StructuredGmg(dims)
    M = make_cpr(sys, gmg, dims=dims)
    res = bicgstab(lambda v: linearize.matvec(sys, *v, dims=dims),
                   (sys.r_cell, sys.r_well), precond=M, tol=1e-2,
                   maxiter=50)
    assert bool(res.converged)
    assert int(res.iterations) <= 25, int(res.iterations)


def test_schur_well_elimination(spe1_system):
    """Schur-eliminated Newton increment == full-system increment
    (eliminateVariable/recoverVariable, NewtonIterationUtilities.cpp)."""
    from opm_tpu.linalg.precond import make_cpr, make_cpr_cells
    from opm_tpu.models import linearize

    model, state, acc0, dt, wd, cdp, sys = spe1_system
    dims = tuple(model.grid.dims)
    hier = build_hierarchy(model.nc, model.grid.face_cells, model.grid.trans)
    amg = hier.device()

    # full system, tight tolerance
    M = make_cpr(sys, amg)
    full = bicgstab(lambda v: linearize.matvec(sys, *v),
                    (sys.r_cell, sys.r_well), precond=M, tol=1e-10,
                    maxiter=200)
    assert bool(full.converged)
    # schur-eliminated
    mv, rhs, recover = linearize.schur_eliminate_wells(sys, dims=dims)
    Mc = make_cpr_cells(sys, amg, dims=dims)
    red = bicgstab(mv, rhs, precond=Mc, tol=1e-10, maxiter=200)
    assert bool(red.converged)
    du_w = recover(red.x)
    scale = np.abs(np.asarray(full.x[0])).max()
    assert np.allclose(np.asarray(red.x), np.asarray(full.x[0]),
                       atol=1e-7 * scale)
    wscale = np.abs(np.asarray(full.x[1])).max() + 1e-30
    assert np.allclose(np.asarray(du_w), np.asarray(full.x[1]),
                       atol=1e-6 * wscale)
    # iteration count stays in the reference's budget at its tolerance
    quick = bicgstab(mv, rhs, precond=Mc, tol=1e-2, maxiter=50)
    assert int(quick.iterations) <= 25


def test_linear_solver_factory_csr():
    """LinearSolverFactory CSR contract (LinearSolverInterface.hpp:43-91):
    each backend solves a 2-D Poisson CSR system to tolerance."""
    import numpy as np

    from opm_tpu.linalg.factory import LinearSolverFactory

    # 2-D 5-point Poisson on a 12x12 grid in CSR
    n1 = 12
    n = n1 * n1
    ia = [0]
    ja = []
    sa = []
    for j in range(n1):
        for i in range(n1):
            row = j * n1 + i
            cols = [(row, 4.0)]
            for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < n1 and 0 <= jj < n1:
                    cols.append((jj * n1 + ii, -1.0))
            cols.sort()
            for cidx, v in cols:
                ja.append(cidx)
                sa.append(v)
            ia.append(len(ja))
    rng = np.random.default_rng(3)
    x_true = rng.normal(size=n)
    # b = A x_true
    b = np.zeros(n)
    for r in range(n):
        for k in range(ia[r], ia[r + 1]):
            b[r] += sa[k] * x_true[ja[k]]

    for solver, pc in (("bicgstab", "amg"), ("bicgstab", "jacobi"),
                       ("gmres", "jacobi"), ("direct", "amg")):
        f = LinearSolverFactory(solver, precond=pc, tol=1e-12, maxiter=800)
        x, rep = f.solve(ia, ja, sa, b)
        assert rep.converged, (solver, pc, rep)
        assert np.allclose(np.asarray(x), x_true, atol=1e-6), (solver, pc)


def test_mixed_precision_solve_matches_f64(spe1_system, monkeypatch):
    """OPM_TPU_MATVEC_F32 / OPM_TPU_CPR_F32 (the TPU defaults): the f32
    operator + f32 preconditioner must produce a Newton increment equal to
    the all-f64 solve within the linear tolerance — the preconditioner only
    shapes the Krylov space and an f32 matvec is ~1e-7 exact, both far
    inside the 1e-2 reduction target (solver/newton.py _solve_cpr)."""
    from opm_tpu.linalg.gmg import StructuredGmg
    from opm_tpu.linalg.precond import make_cpr_cells
    from opm_tpu.models import linearize

    model, state, acc0, dt, wd, cdp, sys = spe1_system
    dims = tuple(model.grid.dims)
    amg = StructuredGmg(dims, trans=model.grid.trans)

    mv64, rhs, recover64 = linearize.schur_eliminate_wells(sys, dims=dims)
    monkeypatch.setenv("OPM_TPU_CPR_F32", "0")
    M64 = make_cpr_cells(sys, amg, dims=dims)
    ref = bicgstab(mv64, rhs, precond=M64, tol=1e-6, maxiter=200)
    assert bool(ref.converged)

    mv32, rhs32, recover32 = linearize.schur_eliminate_wells(
        sys, dims=dims, op_dtype=jnp.float32)
    # operator output dtype must match the f64 Krylov vectors
    probe = mv32(rhs32)
    assert probe.dtype == rhs32.dtype
    monkeypatch.setenv("OPM_TPU_CPR_F32", "1")
    M32 = make_cpr_cells(sys, amg, dims=dims)
    mixed = bicgstab(mv32, rhs32, precond=M32, tol=1e-6, maxiter=200)
    assert bool(mixed.converged)
    # same solution to (well past) the solve tolerance
    scale = np.abs(np.asarray(ref.x)).max()
    assert np.allclose(np.asarray(mixed.x), np.asarray(ref.x),
                       atol=1e-4 * scale)
    # no blow-up in iteration count from the f32 preconditioner
    assert int(mixed.iterations) <= int(ref.iterations) + 10
    # recovered well increments agree too
    w_ref = np.asarray(recover64(ref.x))
    w_mix = np.asarray(recover32(mixed.x))
    wscale = np.abs(w_ref).max() + 1e-30
    assert np.allclose(w_mix, w_ref, atol=1e-3 * wscale)


def test_inv4x4_healthy_and_rank_deficient():
    """Equilibrated Tikhonov inv4x4 (precond.py): exact on healthy well
    blocks (incl. bhp-in-Pa column scaling), bounded and consistent on
    rank-deficient blocks (the SPE9 day-300 crossflow-circulation wells
    whose three flux rows are parallel — raw pseudo-inverses hit ~1e27
    and wrecked the Schur-reduced Krylov solve)."""
    import numpy as np

    from opm_tpu.linalg.precond import inv4x4

    rng = np.random.default_rng(7)
    # healthy: identity-dominated flux rows + control row, bhp col ~1e-7
    healthy = np.eye(4) + 0.1 * rng.normal(size=(4, 4))
    healthy[:, 3] *= 1e-7
    healthy[3] = [0.0, -1.0, 0.0, 0.0]
    # rank-deficient: three parallel flux rows (crossflow circulation)
    v = np.array([219.0, 42.3, 1.02, -1.6e-7])
    sick = np.stack([0.001 * v, -0.0008 * v, v,
                     np.array([0.0, -1.0, 0.0, 0.0])])
    m = jnp.asarray(np.stack([healthy, sick]))
    inv = np.asarray(inv4x4(m))
    # healthy block: a true inverse to ~lam/c_min = 1e-10/1e-7 = 1e-3
    # relative (the documented tradeoff: lam strong enough to bound the
    # sick blocks, invisible next to the 1e-2 linear reduction target)
    err = np.abs(inv[0] @ healthy - np.eye(4)).max()
    assert err < 2e-2, err
    # sick block: NOT 1e25+ garbage; the pseudo-inverse must keep the
    # equilibrated amplification bounded (raw floor-based inverse: ~1e27)
    r = np.abs(sick).max(axis=1)
    c = np.abs(sick / r[:, None]).max(axis=0)
    equil_amp = np.abs(r[None, :] * inv[1] * c[:, None]).max()
    assert equil_amp < 1e13, equil_amp  # ~1/lam; raw floors gave ~1e27
    assert np.isfinite(inv).all()


def test_bicgstab_mp_matches_f64(spe1_system, monkeypatch):
    """OPM_TPU_KRYLOV_F32 (TPU default): the all-f32 inner BiCGStab with
    f64 true-residual refinement (krylov.bicgstab_mp) must converge by the
    f64 verification and match the f64 increment within the linear
    tolerance. Measured v5e SPE10-132k: 99 -> 42 ms per production-like
    solve (the f64 recurrence is ~9 of 13 ms/iteration)."""
    from opm_tpu.linalg.gmg import StructuredGmg
    from opm_tpu.linalg.krylov import bicgstab_mp
    from opm_tpu.linalg.precond import make_cpr_cells
    from opm_tpu.models import linearize

    model, state, acc0, dt, wd, cdp, sys = spe1_system
    dims = tuple(model.grid.dims)
    amg = StructuredGmg(dims, trans=model.grid.trans)
    monkeypatch.setenv("OPM_TPU_CPR_F32", "0")

    mv64, rhs, recover = linearize.schur_eliminate_wells(sys, dims=dims)
    M = make_cpr_cells(sys, amg, dims=dims)
    ref = bicgstab(mv64, rhs, precond=M, tol=1e-3, maxiter=200)
    assert bool(ref.converged)

    mv32, _, _ = linearize.schur_eliminate_wells(sys, dims=dims,
                                                 op_dtype=jnp.float32)
    mp = bicgstab_mp(mv32, rhs, precond=M, matvec_check=mv64, tol=1e-3,
                     maxiter=200)
    # convergence is decided by the f64 TRUE residual, not the f32
    # recurrence estimate
    assert bool(mp.converged)
    true_r = rhs - mv64(mp.x)
    rel = float(jnp.linalg.norm(true_r) / jnp.linalg.norm(rhs))
    assert rel <= 1e-3
    scale = np.abs(np.asarray(ref.x)).max()
    assert np.allclose(np.asarray(mp.x), np.asarray(ref.x),
                       atol=2e-2 * scale)
    # the f32 inner loop should not blow up the iteration count
    assert int(mp.iterations) <= int(ref.iterations) + 15
    # an already-converged rhs costs zero inner iterations per extra cycle
    tiny = bicgstab_mp(mv32, jax.tree.map(lambda a: 0.0 * a, rhs),
                       precond=M, matvec_check=mv64, tol=1e-3)
    assert int(tiny.iterations) == 0


def test_gmg_cycles_knob(spe1_system, monkeypatch):
    """OPM_TPU_GMG_CYCLES=2: multiplicative V-cycle re-cycling must reduce
    the true residual beyond one cycle (on a grid with a real hierarchy,
    incl. ghost padding at odd dims) and keep the CPR-preconditioned
    production solve converging (gmg.py vcycle cycles=)."""
    from opm_tpu.grid import cartesian_grid
    from opm_tpu.linalg.gmg import StructuredGmg
    from opm_tpu.linalg.precond import make_cpr_cells
    from opm_tpu.models import linearize

    g = cartesian_grid((33, 31, 1), (33.0, 31.0, 1.0))
    fc = g.face_cells
    trans = np.ones(len(fc))
    diag = np.zeros(g.nc)
    np.add.at(diag, fc[:, 0], trans)
    np.add.at(diag, fc[:, 1], trans)
    diag += 1e-3
    gmg = StructuredGmg(tuple(g.dims), coarsest=64)
    assert gmg.levels, "need a non-trivial hierarchy for this test"
    off = jnp.concatenate([jnp.asarray(-trans), jnp.asarray(-trans)])
    vals = gmg.coarsen_values(jnp.asarray(diag), off)
    c1, c2 = jnp.asarray(fc[:, 0]), jnp.asarray(fc[:, 1])

    def matvec(x):
        y = jnp.asarray(diag) * x
        y = y.at[c1].add(-x[c2])
        y = y.at[c2].add(-x[c1])
        return y

    b = jnp.asarray(np.random.default_rng(3).normal(size=g.nc))

    def resid(x):
        return float(jnp.linalg.norm(b - matvec(x)))

    x1 = gmg.vcycle(vals, b, cycles=1)
    x2 = gmg.vcycle(vals, b, cycles=2)
    assert resid(x2) < resid(x1) * 0.9  # the second cycle really corrects

    # the knob is picked up by the CPR builders on the production system
    model, state, acc0, dt, wd, cdp, sys = spe1_system
    dims = tuple(model.grid.dims)
    amg = StructuredGmg(dims, trans=model.grid.trans)
    monkeypatch.setenv("OPM_TPU_GMG_CYCLES", "2")
    mv64, rhs, recover = linearize.schur_eliminate_wells(sys, dims=dims)
    M2 = make_cpr_cells(sys, amg, dims=dims)
    res = bicgstab(mv64, rhs, precond=M2, tol=1e-3, maxiter=200)
    assert bool(res.converged)


def test_asm_f32_system_matches_f64(spe1_system, monkeypatch):
    """OPM_TPU_ASM_F32 (TPU default): the f32-shadow-assembled Jacobian
    blocks must match the f64 assembly to f32 resolution, and the solver
    path must splice the f64 residual in as the rhs (solver/newton.py
    _solve_cpr). Well-row layout equality (r_well == [well_flux |
    well_ctrl] bit-for-bit) is what makes the splice exact."""
    from opm_tpu.models import linearize
    from opm_tpu.utils.cast import cast_floats, shadow_model

    model, state, acc0, dt, wd, cdp, sys = spe1_system
    res = model.residual(state, acc0, dt, wd, cdp)
    # rhs splice precondition: assemble's well rows == Residual well rows
    rw = np.concatenate([np.asarray(res.well_flux),
                         np.asarray(res.well_ctrl)[:, None]], axis=1)
    assert np.array_equal(np.asarray(sys.r_well), rw)
    assert np.array_equal(np.asarray(sys.r_cell), np.asarray(res.cell))

    f32 = jnp.float32
    m32 = shadow_model(model, f32)
    sys32 = linearize.assemble(m32, cast_floats(state, f32),
                               cast_floats(acc0, f32),
                               cast_floats(dt, f32),
                               cast_floats(wd, f32), cast_floats(cdp, f32))
    assert sys32.op_dtype == f32
    # entrywise: almost all entries at f32 accuracy; a handful of isolated
    # branch flips (upwind direction / PVT table segment at near-ties in
    # f32) are expected and harmless for an inexact-Newton Jacobian
    for name in ("diag", "face_L", "face_R", "wd_diag"):
        a64 = np.asarray(getattr(sys, name), dtype=np.float64)
        a32 = np.asarray(getattr(sys32, name), dtype=np.float64)
        scale = np.abs(a64).max()
        bad = np.abs(a32 - a64) > 1e-4 * scale
        assert bad.mean() < 0.02, (name, bad.mean())
    # operator-level: J32 @ v within ~f32 resolution of J64 @ v
    rng = np.random.RandomState(7)
    nc, nw = model.nc, state.bhp.shape[0]
    v_cell = jnp.asarray(rng.randn(3, nc))
    v_well = jnp.asarray(rng.randn(nw, 4))
    oc64, ow64 = linearize.matvec(sys, v_cell, v_well)
    oc32, ow32 = linearize.matvec(
        sys32, v_cell.astype(f32), v_well.astype(f32))
    nrm = float(jnp.linalg.norm(oc64))
    assert float(jnp.linalg.norm(
        oc64 - jnp.asarray(oc32, jnp.float64))) < 2e-3 * nrm


def test_pad_add_matches_slice_add(monkeypatch):
    """The TPU zero-pad+add stencil accumulation (backend-gated off on
    CPU) is element-identical to the in-place slice-add form: force each
    branch of _pad_add/_pad_add_sl/GMG _matvec and compare."""
    import numpy as np

    import jax.numpy as jnp
    import opm_tpu.models.linearize as lz

    rng = np.random.RandomState(7)
    out = jnp.asarray(rng.randn(3, 4, 5, 6))
    v = jnp.asarray(rng.randn(3, 4, 5, 5))
    sl = (slice(None), slice(None), slice(None, -1))

    monkeypatch.setenv("OPM_TPU_PAD_ADD", "1")
    a_pad = np.asarray(lz._pad_add_sl(out, v, sl))
    b_pad = np.asarray(lz._pad_add(out, v, 3, 1))
    monkeypatch.setenv("OPM_TPU_PAD_ADD", "0")
    a_dus = np.asarray(lz._pad_add_sl(out, v, sl))
    b_dus = np.asarray(lz._pad_add(out, v, 3, 1))
    assert np.array_equal(a_pad, a_dus)
    assert np.array_equal(b_pad, b_dus)

    # GMG stencil matvec: both branches identical on a random 7-point op
    from opm_tpu.linalg.gmg import StructuredGmg as GMG
    diag3 = jnp.asarray(rng.rand(4, 5, 6) + 3.0)
    offs = [(jnp.asarray(rng.randn(4, 5, 5)), jnp.asarray(rng.randn(4, 5, 5))),
            (jnp.asarray(rng.randn(4, 4, 6)), jnp.asarray(rng.randn(4, 4, 6))),
            (jnp.asarray(rng.randn(3, 5, 6)), jnp.asarray(rng.randn(3, 5, 6)))]
    # offs axis order in GMG._matvec: ax 0/1/2 slice array axes 0..2 with
    # the face array one shorter along that axis
    offs = [offs[2], offs[1], offs[0]]
    x3 = jnp.asarray(rng.randn(4, 5, 6))
    monkeypatch.setenv("OPM_TPU_PAD_ADD", "1")
    y_pad = np.asarray(GMG._matvec(diag3, {0: offs[0], 1: offs[1],
                                           2: offs[2]}, x3))
    monkeypatch.setenv("OPM_TPU_PAD_ADD", "0")
    y_dus = np.asarray(GMG._matvec(diag3, {0: offs[0], 1: offs[1],
                                           2: offs[2]}, x3))
    assert np.allclose(y_pad, y_dus, atol=0, rtol=0)


def test_unstructured_assembly_with_endscale_matches_structured():
    """The gather-path (unstructured) assembly evaluates cell quantities
    at face-gathered saturations; with ENDSCALE/SWATINIT the per-cell
    satfunc arrays must be gathered too (props_local_view — the advisor-r4
    crash class). Flipping model.structured off must reproduce the
    structured path's residual and Jacobian blocks exactly (same physics,
    different evaluation topology)."""
    import numpy as np

    import jax.numpy as jnp
    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.models import linearize
    from opm_tpu.models.blackoil import make_well_device_arrays
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.init import initial_state
    from opm_tpu.sim.testcases import mini_blackoil_deck
    import opm_tpu.wells.standard as stdwells

    nx, ny, nz = 5, 4, 2
    n = nx * ny * nz
    deck = mini_blackoil_deck(nx=nx, ny=ny, nz=nz, tsteps="1*10")
    deck = deck.replace("TABDIMS\n/", "ENDSCALE\n/\nTABDIMS\n/", 1)
    deck = deck.replace("PROPS", f"SWATINIT\n {n}*0.3 /\nPROPS", 1)
    deck = deck.replace("DENSITY",
                        f"KRW\n {n}*0.9 /\nSWL\n {n}*0.15 /\nDENSITY", 1)
    case = load_case_string(deck)
    sim = SimulatorFullyImplicitBlackoil(case)
    state = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    # initial_state installed the SWATINIT pcw_mult; ENDSCALE is per-cell
    assert sim.props.satfunc.pcw_mult is not None
    assert sim.props.satfunc.eps is not None
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[0]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    state = sim._init_well_state(state, ws, True)
    model = sim.model
    acc0 = model.accumulation(state)
    cellq = model.well_cell_quantities_local(state, wd)
    cdp = stdwells.connection_pressure_offsets(wd, cellq, state.qs)
    dt = 10.0 * 86400.0

    assert model.structured
    sys_s = linearize.assemble(model, state, acc0, dt, wd, cdp)
    model.structured = False
    try:
        sys_u = linearize.assemble(model, state, acc0, dt, wd, cdp)
    finally:
        model.structured = True
    np.testing.assert_allclose(np.asarray(sys_u.r_cell),
                               np.asarray(sys_s.r_cell),
                               rtol=1e-10, atol=1e-8)
    for k in range(9):
        np.testing.assert_allclose(np.asarray(sys_u.diag[k]),
                                   np.asarray(sys_s.diag[k]),
                                   rtol=1e-9, atol=1e-7)
