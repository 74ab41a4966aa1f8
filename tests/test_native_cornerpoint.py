"""Native corner-point connection builder (native/cornerpoint.cpp — the
opm-grid processEclipseGrid role) vs the Python reference implementation
in grid/cornerpoint.py: same connection set, same |area| and centroids,
on conforming AND stair-step-faulted grids."""
import numpy as np
import pytest

import opm_tpu.native.graph as ng
from opm_tpu.grid import cornerpoint as cp


def _build(nx, ny, nz, fault=False):
    coord = np.zeros((ny + 1, nx + 1, 6))
    X, Y = np.meshgrid(np.arange(nx + 1) * 100.0,
                       np.arange(ny + 1) * 100.0)
    coord[:, :, 0] = X
    coord[:, :, 1] = Y
    coord[:, :, 2] = 1000.0
    coord[:, :, 3] = X
    coord[:, :, 4] = Y
    coord[:, :, 5] = 4000.0
    zc = np.zeros((nz, 2, ny, 2, nx, 2))
    for k in range(nz):
        zc[k, 0] = 1000 + k * 10.0
        zc[k, 1] = 1000 + (k + 1) * 10.0
    if fault:
        # 1.5-layer throw for the right half: stair-step fault faces
        zc[:, :, :, :, nx // 2:, :] += 15.0
    return coord.ravel(), zc.reshape(-1)


@pytest.mark.parametrize("fault", [False, True])
def test_native_matches_python_reference(fault):
    if ng._load() is None:
        pytest.skip("native library unavailable")
    dims = (12, 10, 8)
    coordv, zcornv = _build(*dims, fault)
    orig = ng.cp_connections
    try:
        ng.cp_connections = lambda *a, **k: None     # force Python path
        ref = cp.process_corner_point(dims, coordv, zcornv)
    finally:
        ng.cp_connections = orig
    nat = cp.process_corner_point(dims, coordv, zcornv)

    def canon(conns):
        # |area|: the two paths use opposite quad orientations (only the
        # magnitude enters half_trans via |area . c|)
        return {(g1, g2, d): (np.abs(np.asarray(a)), np.asarray(f1))
                for (g1, g2, a, f1, f2, d) in conns}

    cr = canon(ref["connections"])
    cn = canon(nat["connections"])
    assert set(cr) == set(cn)
    if fault:
        # the faulted interface must contain cross-layer (throw) pairs
        assert any(abs(k2 - k1) > 0
                   for ((g1, g2, d)) in cn
                   for k1, k2 in [(g1 // 120, g2 // 120)] if d == 0)
    for k in cr:
        np.testing.assert_allclose(cr[k][0], cn[k][0], atol=1e-9)
        np.testing.assert_allclose(cr[k][1], cn[k][1], atol=1e-9)


def test_native_grid_build_end_to_end():
    """SPE9 (real corner-point deck) builds through the native path with
    finite positive transmissibilities."""
    import os

    from opm_tpu.grid import build_grid
    from opm_tpu.io.eclstate import load_case

    spe9 = os.path.join(os.path.dirname(__file__), "..", "data",
                        "SPE9.DATA")
    g = build_grid(load_case(spe9))
    assert g.nc == 9000
    assert (np.asarray(g.trans) >= 0).all()
    assert np.isfinite(np.asarray(g.trans)).all()
    # every direction present
    assert set(np.unique(np.asarray(g.face_dir))) >= {0, 1, 2}
