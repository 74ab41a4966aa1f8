"""Multidimensional upwind TOF (TofReorder use_multidim_upwind,
/root/reference/opm/core/flowdiagnostics/TofReorder.hpp:48-50,
TofReorder.cpp:239-448): on uniform flow OBLIQUE to the grid, transverse
upwinding must reduce the cross-wind error of single-point upwinding
against the analytic time-of-flight."""

import numpy as np

from opm_tpu.diagnostics.tof import solve_tof


def _rotated_uniform_flow(n, vx, vy):
    """n x n unit-cell cartesian grid, uniform velocity (vx, vy) > 0.
    Returns (face_cells, flux, face_dir, pv, src, centers)."""
    def cid(i, j):
        return j * n + i

    fc, q, fd = [], [], []
    for j in range(n):
        for i in range(n - 1):
            fc.append((cid(i, j), cid(i + 1, j)))
            q.append(vx)
            fd.append(0)
    for j in range(n - 1):
        for i in range(n):
            fc.append((cid(i, j), cid(i, j + 1)))
            q.append(vy)
            fd.append(1)
    pv = np.ones(n * n)
    src = np.zeros(n * n)
    for j in range(n):
        src[cid(0, j)] += vx          # inflow through x=0
        src[cid(n - 1, j)] -= vx      # outflow through x=n
    for i in range(n):
        src[cid(i, 0)] += vy
        src[cid(i, n - 1)] -= vy
    x = np.arange(n) + 0.5
    X, Y = np.meshgrid(x, x, indexing="xy")
    return (np.asarray(fc), np.asarray(q, dtype=float),
            np.asarray(fd), pv, src, (X.ravel(), Y.ravel()))


def test_multidim_beats_spu_on_oblique_flow():
    n = 24
    vx, vy = 1.0, 0.6             # ~31 degrees to the grid
    fc, q, fd, pv, src, (X, Y) = _rotated_uniform_flow(n, vx, vy)
    # upwind FV tof is the residence time at cell OUTFLOW (the scheme's
    # natural reference; the reference's SPU shares the same O(h) offset
    # from cell centers)
    exact = np.minimum((X + 0.5) / vx, (Y + 0.5) / vy)
    tof_spu = np.asarray(solve_tof(fc, q, pv, src, nsweeps=3 * n))
    tof_md = np.asarray(solve_tof(fc, q, pv, src, nsweeps=3 * n,
                                  face_dir=fd))
    err_spu = np.abs(tof_spu - exact).mean()
    err_md = np.abs(tof_md - exact).mean()
    assert np.all(np.isfinite(tof_md))
    # transverse upwinding must materially reduce the oblique-flow error
    # (measured 0.281 vs 0.415 at 31 deg; 0.33 vs 0.45 at 45 deg)
    assert err_md < 0.8 * err_spu, (err_spu, err_md)


def test_multidim_matches_spu_on_axis_aligned_flow():
    """With flow along a grid axis there is no transverse influx: the TMU
    weights vanish and the multidim solution equals single-point upwind."""
    n = 12
    fc, q, fd, pv, src, _ = _rotated_uniform_flow(n, 1.0, 1e-12)
    tof_spu = np.asarray(solve_tof(fc, q, pv, src, nsweeps=2 * n))
    tof_md = np.asarray(solve_tof(fc, q, pv, src, nsweeps=2 * n,
                                  face_dir=fd))
    np.testing.assert_allclose(tof_md, tof_spu, rtol=1e-8, atol=1e-8)
