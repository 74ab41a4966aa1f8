"""Multi-device tests on the virtual 8-CPU mesh (the analogue of the
reference's mpirun-on-one-box tests, tests/test_parallel_linearsolver.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opm_tpu.grid import cartesian_grid
from opm_tpu.parallel.halo import (build_halo_spmv, make_halo_spmv,
                                   split_face_values)
from opm_tpu.parallel.partition import renumber_faces, slab_partition


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    return Mesh(np.array(devs[:8]), ("cells",))


def test_slab_partition():
    g = cartesian_grid((4, 4, 16), (4.0, 4.0, 16.0))
    part = slab_partition(g, 8)
    assert part.shard_size == 32
    f_new, is_cross = renumber_faces(part, g.face_cells)
    # slab axis = z; cross faces only between adjacent shards
    o1 = part.owner[f_new[:, 0]]
    o2 = part.owner[f_new[:, 1]]
    assert np.all(o2[is_cross] - o1[is_cross] == 1)
    # 16 z-layers / 8 shards -> interface every 2 layers, 16 faces each
    assert is_cross.sum() == 7 * 16


def test_halo_spmv_matches_reference(mesh8):
    """shard_map + ppermute SpMV == single-device scatter SpMV."""
    g = cartesian_grid((6, 5, 16), (6.0, 5.0, 16.0))
    nc = g.nc
    part = slab_partition(g, 8)
    rng = np.random.RandomState(0)
    diag = rng.rand(nc) + 3.0
    offv = -rng.rand(g.nf)
    x = rng.randn(nc)

    # reference product in the ORIGINAL numbering
    y_ref = diag * x
    c1 = g.face_cells[:, 0]
    c2 = g.face_cells[:, 1]
    np.add.at(y_ref, c1, offv * x[c2])
    np.add.at(y_ref, c2, offv * x[c1])

    # permuted, padded, sharded product
    data, maps = build_halo_spmv(part, g.face_cells)
    iv, crv, clv = split_face_values(offv, maps)
    diag_p = np.zeros(part.nc_padded)
    diag_p[:nc] = diag[part.perm]
    diag_p[nc:] = 1.0
    x_p = np.zeros(part.nc_padded)
    x_p[:nc] = x[part.perm]
    spmv = make_halo_spmv(mesh8, "cells", data)
    y_p = np.asarray(jax.jit(spmv)(jnp.asarray(diag_p), iv, crv, clv,
                                   jnp.asarray(x_p)))
    y = np.empty(nc)
    y[part.perm] = y_p[:nc]
    assert np.allclose(y, y_ref, atol=1e-12), np.abs(y - y_ref).max()


@pytest.mark.compile_heavy
def test_sharded_newton_step_matches_single(mesh8):
    """The fully-implicit Newton step under global-view sharding must equal
    the unsharded step (XLA inserts the collectives)."""
    import __graft_entry__ as ge
    model, state, acc0, wd, cdp = ge._build(8, 8, 2)
    dt = jnp.asarray(43200.0)

    from opm_tpu.solver.newton import dense_solve
    from opm_tpu.solver.update import update_state

    def newton_step(state, acc0):
        def rfun(u):
            s = model.unflatten(u, state)
            return model.residual_vector(
                model.residual(s, acc0, dt, wd, cdp))

        u = model.flatten(state)
        r = rfun(u)
        J = jax.jacfwd(rfun)(u)
        return update_state(model, state, dense_solve(J, r))

    ref = jax.jit(newton_step)(state, acc0)

    cell_sh = NamedSharding(mesh8, P("cells"))
    repl = NamedSharding(mesh8, P())
    state_sh = state._replace(
        pressure=jax.device_put(state.pressure, cell_sh),
        sw=jax.device_put(state.sw, cell_sh),
        x=jax.device_put(state.x, cell_sh),
        hcstate=jax.device_put(state.hcstate, cell_sh),
        bhp=jax.device_put(state.bhp, repl),
        qs=jax.device_put(state.qs, repl),
        control=jax.device_put(state.control, repl),
        target=jax.device_put(state.target, repl))
    # acc0 is phase-leading (3, nc): shard the cell axis
    acc0_sh = jax.device_put(acc0, NamedSharding(mesh8, P(None, "cells")))
    out = jax.jit(newton_step)(state_sh, acc0_sh)
    assert np.allclose(np.asarray(out.pressure), np.asarray(ref.pressure),
                       rtol=1e-10)
    assert np.allclose(np.asarray(out.sw), np.asarray(ref.sw), atol=1e-12)


def test_sharded_cpr_solve_matches_single(mesh8):
    """The production CPR Newton increment (structured GMG + Schur) under
    global-view cell sharding must equal the unsharded increment — XLA
    partitions the stencil slice ops with halo collectives."""
    import os

    import __graft_entry__ as ge
    os.environ["OPM_TPU_GMG"] = "1"
    try:
        model, state, acc0, wd, cdp = ge._build(8, 8, 4)
        dt = jnp.asarray(43200.0)
        from opm_tpu.solver.newton import NonlinearSolver
        solver = NonlinearSolver(model, linear_solver="cpr")
        step = jax.jit(lambda s, a: solver._solve_cpr(
            s, a, dt, wd, cdp, jnp.asarray(1.0))[0])
        ref = step(state, acc0)

        cell_sh = NamedSharding(mesh8, P("cells"))
        repl = NamedSharding(mesh8, P())
        state_sh = state._replace(
            pressure=jax.device_put(state.pressure, cell_sh),
            sw=jax.device_put(state.sw, cell_sh),
            x=jax.device_put(state.x, cell_sh),
            hcstate=jax.device_put(state.hcstate, cell_sh),
            bhp=jax.device_put(state.bhp, repl),
            qs=jax.device_put(state.qs, repl),
            control=jax.device_put(state.control, repl),
            target=jax.device_put(state.target, repl))
        acc0_sh = jax.device_put(
            acc0, NamedSharding(mesh8, P(None, "cells")))
        out = step(state_sh, acc0_sh)
        assert np.allclose(np.asarray(out.pressure),
                           np.asarray(ref.pressure), rtol=1e-9)
        assert np.allclose(np.asarray(out.sw), np.asarray(ref.sw),
                           atol=1e-11)
    finally:
        os.environ.pop("OPM_TPU_GMG", None)


import pytest as _pytest


@_pytest.mark.parametrize("dims", [(8, 8, 16), (8, 8, 13)])
def test_schwarz_gmg_preconditioned_solve(mesh8, dims):
    """Shard-local additive-Schwarz GMG (parallel/schwarz.py): BiCGStab
    preconditioned by shard_map-local V-cycles converges to the same
    solution as the global StructuredGmg, with zero collectives inside the
    preconditioner apply. The (8,8,13) case exercises the ghost-layer
    padding for nz not divisible by the shard count."""
    from opm_tpu.linalg.gmg import StructuredGmg
    from opm_tpu.linalg.krylov import bicgstab
    from opm_tpu.parallel.schwarz import SchwarzGmg

    g = cartesian_grid(dims, (8.0, 8.0, float(dims[2])), perm=1e-13)
    # heterogeneous SPD TPFA system
    rng = np.random.default_rng(0)
    tr = jnp.asarray(g.trans * np.exp(rng.normal(0, 1, g.nf)))
    c1 = jnp.asarray(g.face_cells[:, 0])
    c2 = jnp.asarray(g.face_cells[:, 1])
    diag = jnp.zeros(g.nc).at[c1].add(tr).at[c2].add(tr) + 1e-10
    off = jnp.concatenate([-tr, -tr])

    def matvec(x):
        y = diag * x
        y = y.at[c1].add(-tr * x[c2])
        y = y.at[c2].add(-tr * x[c1])
        return y

    b = jnp.asarray(rng.normal(0, 1, g.nc))

    ref_gmg = StructuredGmg(dims, np.asarray(g.trans))
    vals_ref = ref_gmg.coarsen_values(diag, off)
    res_ref = bicgstab(matvec, b,
                       precond=lambda r: ref_gmg.vcycle(vals_ref, r),
                       tol=1e-10, maxiter=400)

    sch = SchwarzGmg(dims, mesh8, "cells", np.asarray(g.trans))
    vals = sch.coarsen_values(diag, off)
    res = bicgstab(matvec, b, precond=lambda r: sch.vcycle(vals, r),
                   tol=1e-10, maxiter=400)

    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), np.asarray(res_ref.x),
                       rtol=1e-7, atol=1e-9 * float(jnp.abs(res_ref.x).max()))
    # the one-ghost-layer RAS overlap holds the interface-error cost to a
    # small multiple of the global hierarchy (zero overlap measured ~2.1x)
    assert int(res.iterations) < 2 * max(int(res_ref.iterations), 1) + 4


@pytest.mark.compile_heavy
def test_schwarz_coarse_pre_on_line_source(mesh8):
    """Hybrid coarse ordering regression (OPM_TPU_SCHWARZ_COARSE=pre, the
    default): a full-depth line-source rhs — a well column crossing every
    z-slab, the hardest shape for slab-local preconditioning — must
    converge in near the global hierarchy's iteration count.  The old
    post-coarse ordering measured 44-48 full-CPR iterations vs global's 1
    on the real 102k system (the coarse correction's block edges were the
    apply's LAST write, leaving unsmoothed high-frequency error);
    tools/schwarz_cpr_ab.py re-measures that A/B."""
    from opm_tpu.linalg.gmg import StructuredGmg
    from opm_tpu.linalg.krylov import bicgstab
    from opm_tpu.parallel.schwarz import SchwarzGmg

    dims = (12, 12, 24)
    g = cartesian_grid(dims, (12.0, 12.0, 24.0), perm=1e-13)
    rng = np.random.default_rng(3)
    tr = jnp.asarray(g.trans * np.exp(rng.normal(0, 1.5, g.nf)))
    c1 = jnp.asarray(g.face_cells[:, 0])
    c2 = jnp.asarray(g.face_cells[:, 1])
    diag = jnp.zeros(g.nc).at[c1].add(tr).at[c2].add(tr) + 1e-10
    off = jnp.concatenate([-tr, -tr])

    def matvec(x):
        y = diag * x
        y = y.at[c1].add(-tr * x[c2])
        y = y.at[c2].add(-tr * x[c1])
        return y

    # line source down the (1,1) column — nonzero in every slab
    nx, ny, nz = dims
    cells = 1 + 1 * nx + np.arange(nz) * nx * ny
    b = jnp.zeros(g.nc).at[jnp.asarray(cells)].set(1.0)

    ref_gmg = StructuredGmg(dims, np.asarray(g.trans))
    vals_ref = ref_gmg.coarsen_values(diag, off)
    res_ref = bicgstab(matvec, b,
                       precond=lambda r: ref_gmg.vcycle(vals_ref, r),
                       tol=1e-8, maxiter=400)
    sch = SchwarzGmg(dims, mesh8, "cells", np.asarray(g.trans))
    vals = sch.coarsen_values(diag, off)
    res = bicgstab(matvec, b, precond=lambda r: sch.vcycle(vals, r),
                   tol=1e-8, maxiter=400)
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), np.asarray(res_ref.x),
                       rtol=1e-6, atol=1e-8 * float(jnp.abs(res_ref.x).max()))
    assert int(res.iterations) <= int(res_ref.iterations) + 4, (
        int(res.iterations), int(res_ref.iterations))


def test_schwarz_cpr_newton_increment(mesh8):
    """Production CPR with the Schwarz pressure stage: the Newton increment
    agrees with the single-hierarchy CPR increment to the Krylov
    tolerance."""
    import __graft_entry__ as ge
    from opm_tpu.solver.newton import NonlinearSolver

    model, state, acc0, wd, cdp = ge._build(8, 4, 8)
    dt = jnp.asarray(43200.0)
    ref_solver = NonlinearSolver(model, linear_solver="cpr")
    step_ref = jax.jit(lambda s, a: ref_solver._solve_cpr(
        s, a, dt, wd, cdp, jnp.asarray(1.0))[0])
    ref = step_ref(state, acc0)

    sch_solver = NonlinearSolver(model, linear_solver="cpr",
                                 schwarz=(mesh8, "cells"))
    out, iters, converged = jax.jit(lambda s, a: sch_solver._solve_cpr(
        s, a, dt, wd, cdp, jnp.asarray(1.0)))(state, acc0)
    assert bool(converged)
    dp_ref = np.asarray(ref.pressure) - np.asarray(state.pressure)
    dp = np.asarray(out.pressure) - np.asarray(state.pressure)
    denom = np.linalg.norm(dp_ref) + 1e-30
    assert np.linalg.norm(dp - dp_ref) / denom < 5e-2

def test_io_gather(mesh8):
    """ParallelDebugOutput role (parallel/io_gather.py): a cell-sharded
    state pytree gathers to full host arrays."""
    from opm_tpu.parallel.io_gather import gather_to_host, is_io_process

    x = np.arange(64.0)
    xs = jax.device_put(x, NamedSharding(mesh8, P("cells")))
    tree = dict(pressure=xs, sw=jax.device_put(x * 2,
                                               NamedSharding(mesh8,
                                                             P("cells"))))
    out = gather_to_host(tree)
    assert isinstance(out["pressure"], np.ndarray)
    assert np.array_equal(out["pressure"], x)
    assert np.array_equal(out["sw"], x * 2)
    assert is_io_process()
