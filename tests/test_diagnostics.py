"""Flow diagnostics + reordering tests (roles of the reference's
test_flowdiagnostics.cpp, test_anisotropiceikonal.cpp,
test_singlecellsolves.cpp)."""
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.diagnostics.eikonal import anisotropic_eikonal_2d
from opm_tpu.diagnostics.fphi import (compute_f_phi, compute_lorenz,
                                      compute_sweep, compute_well_pairs)
from opm_tpu.diagnostics.tof import solve_tof, solve_tof_tracer
from opm_tpu.grid import cartesian_grid
from opm_tpu.models.reorder import ReorderTwophaseTransport
from opm_tpu.native.graph import upwind_levels
from opm_tpu.props.incomp import IncompProps

DAY = 86400.0


def _line_drive(nx=20, q=1e-5):
    g = cartesian_grid((nx, 1, 1), (float(nx), 1.0, 1.0), poro=0.25)
    src = np.zeros(g.nc)
    src[0] = q
    src[-1] = -q
    flux = np.full(g.nf, q)  # uniform 1-D flux (x-faces in order)
    return g, src, flux


def test_tof_line_drive():
    """1-D uniform flow: tof grows linearly, cell i: (i + 1) * pv / q."""
    g, src, flux = _line_drive()
    tof = np.asarray(solve_tof(g.face_cells, flux, g.pore_volume, src))
    pv = g.pore_volume[0]
    q = src[0]
    expected = (np.arange(g.nc) + 1) * pv / q
    assert np.allclose(tof, expected, rtol=1e-12)


def test_tof_tracer():
    g, src, flux = _line_drive()
    tof, conc = solve_tof_tracer(g.face_cells, flux, g.pore_volume, src,
                                 tracer_heads=[np.array([0])])
    assert np.allclose(np.asarray(conc[0]), 1.0)


def test_fphi_homogeneous():
    """Uniform residence time -> F = Phi, Lorenz = 0."""
    pv = np.ones(50)
    ftof = np.linspace(0.1, 1.0, 50)
    btof = ftof[::-1]  # ftof + btof = const
    F, phi = compute_f_phi(pv, ftof, btof)
    assert np.allclose(F, phi, atol=1e-12)
    assert compute_lorenz(F, phi) == pytest.approx(0.0, abs=1e-12)
    Ev, tD = compute_sweep(F, phi)
    assert np.all(Ev <= 1.0 + 1e-9)


def test_fphi_heterogeneous_lorenz_positive():
    rng = np.random.RandomState(0)
    pv = np.ones(100)
    tr = rng.lognormal(0, 1.5, size=100)
    F, phi = compute_f_phi(pv, tr, np.zeros(100))
    lc = compute_lorenz(F, phi)
    assert 0.2 < lc < 1.0


def test_well_pairs():
    pv = np.array([1.0, 2.0, 3.0])
    ci = np.array([[1.0, 0.5, 0.0]])
    cp = np.array([[1.0, 0.5, 0.0], [0.0, 0.5, 1.0]])
    vol = compute_well_pairs(pv, ci, cp)
    assert vol.shape == (1, 2)
    assert vol[0, 0] == pytest.approx(1 * 1 + 2 * 0.25)
    assert vol[0, 1] == pytest.approx(2 * 0.25)


def test_eikonal_isotropic():
    """Isotropic metric: T = euclidean distance from the corner."""
    nx = ny = 21
    metric = np.tile([1.0, 0.0, 1.0], (nx * ny, 1))
    T = np.asarray(anisotropic_eikonal_2d((nx, ny), (21.0, 21.0), metric,
                                          [0]))
    ii = np.arange(nx * ny) % nx
    jj = np.arange(nx * ny) // nx
    d = np.sqrt(ii.astype(float) ** 2 + jj.astype(float) ** 2)
    # 8-neighbor graph distance overestimates euclidean by <= ~8%
    ok = d > 0
    ratio = T[ok] / d[ok]
    assert ratio.min() > 0.999
    assert ratio.max() < 1.09


def test_eikonal_anisotropic():
    """Strongly anisotropic metric: travel much faster along x than y."""
    nx = ny = 15
    metric = np.tile([1.0, 0.0, 100.0], (nx * ny, 1))  # y is 10x "longer"
    T = np.asarray(anisotropic_eikonal_2d((nx, ny), (15.0, 15.0), metric,
                                          [0]))
    t_x = T[nx - 1]            # far corner along x
    t_y = T[(ny - 1) * nx]     # far corner along y
    assert t_y > 5 * t_x


def test_reorder_transport_matches_implicit():
    """Wavefront reorder transport must match the global implicit Newton
    solver on a 1-D waterflood (same discretization, same equations)."""
    from opm_tpu.models.twophase import TwophaseModel
    nx = 50
    g = cartesian_grid((nx, 1, 1), (100.0, 1.0, 1.0), perm=1e-13, poro=0.2)
    props = IncompProps(viscosity=(1e-3, 1e-3), density=(1000.0, 800.0),
                        exponent=2.0)
    src = np.zeros(g.nc)
    q = g.pore_volume.sum() / (100 * DAY)
    src[0] = q
    src[-1] = -q
    flux = jnp.full(g.nf, q)
    s0 = jnp.zeros(g.nc)
    dt = 5 * DAY

    reorder = ReorderTwophaseTransport(g, props)
    s_r, sweeps, ds = reorder.solve(s0, flux, src, dt)

    model = TwophaseModel(g, props, gravity_on=False)
    s_i, it, rn = model.transport_solve(s0, flux, src, dt)
    assert np.allclose(np.asarray(s_r), np.asarray(s_i), atol=2e-6), \
        np.abs(np.asarray(s_r) - np.asarray(s_i)).max()


def test_level_schedule_depth():
    g, src, flux = _line_drive(nx=30)
    sched = upwind_levels(g.nc, g.face_cells, flux)
    assert sched.nlevels == 30
    assert sched.max_scc == 1
    assert np.array_equal(sched.order, np.arange(30))


def test_dg1_tof_exact_on_uniform_flow():
    """DG(1) TOF (TofDiscGalReorder degree 1): exact mean AND slope on
    uniform 1-D flow where the FV scheme smears by O(h); source cells
    follow the FV through-flow convention."""
    import numpy as np

    from opm_tpu.diagnostics.tof import solve_tof, solve_tof_dg1
    from opm_tpu.grid import cartesian_grid

    g = cartesian_grid((16, 1, 1), (16.0, 1.0, 1.0), poro=0.25)
    q = 2.0e-3
    src = np.zeros(g.nc)
    src[0] = q
    src[-1] = -q
    flux = np.full(g.nf, q)
    a = np.asarray(solve_tof_dg1(g, flux, src))
    pv = g.pore_volume[0]
    exact_mean = pv * (np.arange(16) + 0.5) / q
    # interior cells: machine-precision mean and slope
    assert np.allclose(a[1:-1, 0], exact_mean[1:-1], rtol=1e-12)
    assert np.allclose(a[1:-1, 1], pv / q, rtol=1e-12)
    # injector cell: exports the full-transit trace pv/q (FV convention)
    assert np.isclose(a[0, 0], pv / q, rtol=1e-12)
    # FV smears: its interior error is half a cell of tof
    fv = np.asarray(solve_tof(g.face_cells, flux, g.pore_volume, src))
    assert np.abs(fv[1:-1] - exact_mean[1:-1]).max() > 10.0
    # transverse slopes stay zero in 1-D flow
    assert np.abs(a[:, 2:]).max() < 1e-12
    # same exactness with the flow along y and along z (cross-axis wiring)
    for dims, axis in (((1, 16, 1), 2), ((1, 1, 16), 3)):
        g2 = cartesian_grid(dims, tuple(float(d) for d in dims), poro=0.25)
        src2 = np.zeros(g2.nc)
        src2[0] = q
        src2[-1] = -q
        a2 = np.asarray(solve_tof_dg1(g2, np.full(g2.nf, q), src2))
        pv2 = g2.pore_volume[0]
        exact2 = pv2 * (np.arange(16) + 0.5) / q
        assert np.allclose(a2[1:-1, 0], exact2[1:-1], rtol=1e-12)
        assert np.allclose(a2[1:-1, axis], pv2 / q, rtol=1e-12)


def test_dg1_tof_matches_fv_on_2d():
    """DG(1) agrees with FV on the INTEGRAL flow-diagnostics measure
    (swept volume at a reference time) on a 2-D diagonal-flow field;
    pointwise values legitimately differ on exponentially-graded flux
    fields (higher-order trace export compounds per cell)."""
    import numpy as np

    from opm_tpu.diagnostics.tof import solve_tof, solve_tof_dg1
    from opm_tpu.grid import cartesian_grid

    g = cartesian_grid((12, 12, 1), (12.0, 12.0, 1.0), poro=0.2)
    nc = g.nc
    # quarter-five-spot-like: inject at (0,0), produce at (11,11)
    rng = np.random.RandomState(0)
    src = np.zeros(nc)
    src[0] = 1e-3
    src[-1] = -1e-3
    # build a consistent flux field by solving incompressible pressure
    import jax.numpy as jnp

    from opm_tpu.linalg.krylov import bicgstab
    fc = g.face_cells
    trans = jnp.asarray(g.trans)
    c1, c2 = jnp.asarray(fc[:, 0]), jnp.asarray(fc[:, 1])

    def A(p):
        d = trans * (p[c1] - p[c2])
        return jnp.zeros(nc).at[c1].add(d).at[c2].add(-d) + 1e-12 * p

    res = bicgstab(A, jnp.asarray(src), tol=1e-12, maxiter=2000)
    flux = np.asarray(trans * (res.x[c1] - res.x[c2]))
    fv = np.asarray(solve_tof(fc, flux, g.pore_volume, src))
    a = np.asarray(solve_tof_dg1(g, flux, src))
    # means agree within a small relative tolerance away from the wells
    interior = np.ones(nc, bool)
    interior[0] = interior[-1] = False
    assert np.isfinite(a).all()
    assert (a[:, 0] > 0).all()
    t_ref = np.percentile(fv, 30)
    v_fv = g.pore_volume[fv <= t_ref].sum()
    v_dg = g.pore_volume[a[:, 0] <= t_ref].sum()
    assert abs(v_dg / v_fv - 1.0) < 0.10, (v_fv, v_dg)


def test_dg2_tof_exact_on_uniform_flow():
    """DG(2) TOF (TofDiscGalReorder degree 2): exact mean and slope on
    uniform flow with vanishing quadratic coefficients; agrees with DG(1)
    on the linear field, along every axis."""
    import numpy as np

    from opm_tpu.diagnostics.tof import solve_tof_dg1, solve_tof_dg2
    from opm_tpu.grid import cartesian_grid

    q = 2.0e-3
    for dims, slope_col in (((16, 1, 1), 1), ((1, 16, 1), 2),
                            ((1, 1, 16), 3)):
        g = cartesian_grid(dims, tuple(float(d) for d in dims), poro=0.25)
        src = np.zeros(g.nc)
        src[0] = q
        src[-1] = -q
        a = np.asarray(solve_tof_dg2(g, np.full(g.nf, q), src))
        pv = g.pore_volume[0]
        exact_mean = pv * (np.arange(16) + 0.5) / q
        assert np.allclose(a[1:-1, 0], exact_mean[1:-1], rtol=1e-11)
        assert np.allclose(a[1:-1, slope_col], pv / q, rtol=1e-11)
        # quadratic/cross terms vanish on the exactly-linear field
        assert np.abs(a[1:-1, 4:]).max() < 1e-8 * pv / q
        # matches DG(1) where the field is linear
        a1 = np.asarray(solve_tof_dg1(g, np.full(g.nf, q), src))
        assert np.allclose(a[1:-1, 0], a1[1:-1, 0], rtol=1e-11)


def test_dg2_tof_quarter_five_spot():
    """2-D quarter-five-spot: DG(2) mean TOF is finite, positive, and
    volume-consistent with the FV solution."""
    import numpy as np

    from opm_tpu.diagnostics.tof import (solve_tof, solve_tof_dg1,
                                         solve_tof_dg2)
    from opm_tpu.grid import cartesian_grid
    from opm_tpu.models.twophase import TwophaseModel
    from opm_tpu.props.incomp import IncompProps
    import jax.numpy as jnp

    g = cartesian_grid((12, 12, 1), (12.0, 12.0, 1.0), perm=1e-13, poro=0.2)
    props = IncompProps(viscosity=(1e-3, 1e-3), density=(1000.0, 1000.0),
                        exponent=1.0)
    model = TwophaseModel(g, props, gravity_on=False)
    src = np.zeros(g.nc)
    q = 1e-5
    src[0] = q
    src[-1] = -q
    _, flux, _, _ = model.pressure_solve(jnp.full(g.nc, 0.5), src)
    a = np.asarray(solve_tof_dg2(g, np.asarray(flux), src))
    fv = np.asarray(solve_tof(g.face_cells, jnp.asarray(flux),
                              g.pore_volume, src))
    assert np.isfinite(a).all()
    assert (a[:, 0] > 0).all()
    # tracks the FV field closely; swept volume matches DG(1) (both are
    # sharper than the smearing FV scheme at the same contour)
    assert np.corrcoef(a[:, 0], fv)[0, 1] > 0.98
    a1 = np.asarray(solve_tof_dg1(g, np.asarray(flux), src))
    t_ref = np.percentile(fv, 30)
    v_dg2 = g.pore_volume[a[:, 0] <= t_ref].sum()
    v_dg1 = g.pore_volume[a1[:, 0] <= t_ref].sum()
    assert abs(v_dg2 / v_dg1 - 1.0) < 0.05


def test_dg1_min_upwind_limiter():
    """MinUpwindFace/MinUpwindAverage limiter: inactive on the exact
    linear field, enforces lower bounds where the reconstruction
    undershoots its upstream values."""
    import jax.numpy as jnp
    import numpy as np

    from opm_tpu.diagnostics.tof import dg1_limit_min_upwind, solve_tof_dg1
    from opm_tpu.grid import cartesian_grid

    g = cartesian_grid((16, 1, 1), (16.0, 1.0, 1.0), poro=0.25)
    q = 2.0e-3
    src = np.zeros(g.nc)
    src[0] = q
    src[-1] = -q
    flux = np.full(g.nf, q)
    a = np.asarray(solve_tof_dg1(g, flux, src))
    for method in ("face", "average"):
        lim = np.asarray(dg1_limit_min_upwind(g, flux, a, method=method))
        # exact linear interior: untouched
        assert np.allclose(lim[1:-1], a[1:-1], rtol=1e-12)
        # limited field respects the bound everywhere: corner minima are
        # at least the upstream face value (within fp noise)
        corner_min = lim[:, 0] - 0.5 * np.abs(lim[:, 1]) \
            - 0.5 * np.abs(lim[:, 2]) - 0.5 * np.abs(lim[:, 3])
        up_face = a[:-1, 0] + 0.5 * a[:-1, 1]      # exporting trace
        assert np.all(corner_min[1:] >= np.minimum(up_face, a[:-1, 0])
                      - 1e-9)
    # artificial overshoot: a steep negative slope gets flattened
    a_bad = a.copy()
    a_bad[8, 1] = -10 * a[8, 0]
    lim = np.asarray(dg1_limit_min_upwind(g, flux, a_bad))
    assert abs(lim[8, 1]) < abs(a_bad[8, 1])
    cm = lim[8, 0] - 0.5 * abs(lim[8, 1])
    assert cm >= -1e-9


def test_dg_order_progression():
    """solve_tof_dg degrees 0-2 (the TofDiscGalReorder degree parameter)
    show the expected order progression on uniform 1-D flow where the
    exact TOF is linear: degree 0 (= the FV scheme) carries O(h) error,
    degrees 1 and 2 are exact to machine precision — and all three
    agree on the cell-mean integral of the analytic field to the
    scheme's order."""
    import numpy as np

    from opm_tpu.diagnostics.tof import solve_tof_dg
    from opm_tpu.grid import cartesian_grid

    g = cartesian_grid((16, 1, 1), (16.0, 1.0, 1.0), poro=0.25)
    q = 2.0e-3
    src = np.zeros(g.nc)
    src[0] = q
    src[-1] = -q
    flux = np.full(g.nf, q)
    pv = g.pore_volume[0]
    exact_mean = pv * (np.arange(16) + 0.5) / q
    errs = {}
    for d in (0, 1, 2):
        a = np.asarray(solve_tof_dg(g, flux, src, degree=d,
                                    face_cells=g.face_cells))
        assert a.shape == (16, (1, 4, 10)[d])
        errs[d] = np.abs(a[1:-1, 0] - exact_mean[1:-1]).max()
    assert errs[0] > 10.0                      # FV smears O(h)
    assert errs[1] < 1e-6 * exact_mean[-1]     # DG(1) exact
    assert errs[2] < 1e-6 * exact_mean[-1]     # DG(2) exact
    assert errs[1] < errs[0] and errs[2] < errs[0]


def test_dg1_tracer_line_drive():
    """DG(1) tracer variant (TofDiscGalReorder tracer overload,
    TofDiscGalReorder.hpp:96-115): a single injector head on a line
    drive fills every downstream cell with concentration 1 and zero
    slope."""
    import numpy as np

    from opm_tpu.diagnostics.tof import solve_tof_dg1_tracer
    from opm_tpu.grid import cartesian_grid

    g = cartesian_grid((16, 1, 1), (16.0, 1.0, 1.0), poro=0.25)
    q = 2.0e-3
    src = np.zeros(g.nc)
    src[0] = q
    src[-1] = -q
    flux = np.full(g.nf, q)
    tr = np.asarray(solve_tof_dg1_tracer(g, flux, src, [np.array([0])]))
    assert tr.shape == (1, 16, 4)
    assert np.allclose(tr[0, :, 0], 1.0, atol=1e-10)
    assert np.abs(tr[0, :, 1:]).max() < 1e-10


def test_dg1_tracer_partitions_two_injectors():
    """Two opposed injectors, central producer: the tracer partitions
    are in [0,1], sum to 1 in every swept cell, and split the line at
    the midpoint — matching the FV tracer's partition
    (solveTofTracer's role, here at DG(1))."""
    import numpy as np

    from opm_tpu.diagnostics.tof import (solve_tof_dg1_tracer,
                                         solve_tof_tracer)
    from opm_tpu.grid import cartesian_grid

    nx = 21
    g = cartesian_grid((nx, 1, 1), (float(nx), 1.0, 1.0), poro=0.25)
    q = 1.0e-3
    src = np.zeros(g.nc)
    src[0] = q
    src[-1] = q
    src[nx // 2] = -2 * q
    # x-face i sits between cells i, i+1; positive flux flows i -> i+1
    flux = np.where(np.arange(nx - 1) < nx // 2, q, -q)
    heads = [np.array([0]), np.array([nx - 1])]
    tr = np.asarray(solve_tof_dg1_tracer(g, flux, src, heads))
    means = tr[:, :, 0]
    assert (means > -1e-9).all() and (means < 1.0 + 1e-9).all()
    assert np.allclose(means.sum(axis=0), 1.0, atol=1e-9)
    # left half is tracer 0, right half tracer 1, producer cell split
    assert np.allclose(means[0, :nx // 2], 1.0, atol=1e-9)
    assert np.allclose(means[1, nx // 2 + 1:], 1.0, atol=1e-9)
    assert abs(means[0, nx // 2] - 0.5) < 1e-9
    # agrees with the FV tracer partition
    _, conc = solve_tof_tracer(g.face_cells, flux, g.pore_volume, src,
                               tracer_heads=heads)
    assert np.allclose(means, np.asarray(conc), atol=1e-9)


def test_dg_unified_entry_with_tracer():
    """solve_tof_dg(..., tracer_heads=...) returns the (tof, tracer)
    pair at degrees 0 and 1 with consistent partitions."""
    import numpy as np

    from opm_tpu.diagnostics.tof import solve_tof_dg
    from opm_tpu.grid import cartesian_grid

    g = cartesian_grid((12, 1, 1), (12.0, 1.0, 1.0), poro=0.25)
    q = 1.0e-3
    src = np.zeros(g.nc)
    src[0] = q
    src[-1] = -q
    flux = np.full(g.nf, q)
    heads = [np.array([0])]
    tof0, tr0 = solve_tof_dg(g, flux, src, degree=0, tracer_heads=heads,
                             face_cells=g.face_cells)
    tof1, tr1 = solve_tof_dg(g, flux, src, degree=1, tracer_heads=heads,
                             limiter="average")
    assert np.asarray(tr0).shape == (1, 12, 1)
    assert np.asarray(tr1).shape == (1, 12, 4)
    assert np.allclose(np.asarray(tr0)[0, :, 0], 1.0, atol=1e-9)
    assert np.allclose(np.asarray(tr1)[0, :, 0], 1.0, atol=1e-9)
    # the DG(1) mean is the exact linear field; the FV (degree-0) mean
    # smears but integrates the same total residence volume
    pv = g.pore_volume
    assert (np.asarray(tof1)[:, 0] > 0).all()
    assert abs((pv * np.asarray(tof0)[:, 0]).sum()
               / (pv * np.asarray(tof1)[:, 0]).sum() - 1.0) < 0.35


def test_dg1_limiter_usage_modes():
    """limiter_usage (TofDiscGalReorder.hpp LimiterUsage): "during"
    limits inside each sweep; on an exact-linear field every usage mode
    leaves the solution untouched, and the during-computations solve
    stays exact."""
    import numpy as np

    from opm_tpu.diagnostics.tof import solve_tof_dg, solve_tof_dg1
    from opm_tpu.grid import cartesian_grid

    g = cartesian_grid((12, 1, 1), (12.0, 1.0, 1.0), poro=0.25)
    q = 1.0e-3
    src = np.zeros(g.nc)
    src[0] = q
    src[-1] = -q
    flux = np.full(g.nf, q)
    base = np.asarray(solve_tof_dg1(g, flux, src))
    for usage in ("during", "post", "simultaneous"):
        a = np.asarray(solve_tof_dg(g, flux, src, degree=1,
                                    limiter="average",
                                    limiter_usage=usage))
        # interior of the exact linear field is limiter-invariant
        assert np.allclose(a[1:-1], base[1:-1], rtol=1e-10), usage
    # during-computations on a rotating 2-D field stays bounded
    g2 = cartesian_grid((8, 8, 1), (8.0, 8.0, 1.0), poro=0.2)
    src2 = np.zeros(g2.nc)
    src2[0] = q
    src2[-1] = -q
    rng = np.random.RandomState(3)
    flux2 = np.zeros(g2.nf)
    flux2[:] = q * rng.uniform(0.2, 1.0, g2.nf)
    a2 = np.asarray(solve_tof_dg(g2, flux2, src2, degree=1,
                                 limiter="face", limiter_usage="during"))
    assert np.isfinite(a2).all()
    corner_min = a2[:, 0] - 0.5 * (np.abs(a2[:, 1]) + np.abs(a2[:, 2])
                                   + np.abs(a2[:, 3]))
    assert (corner_min > -1e-6 * max(1.0, a2[:, 0].max())).all()
