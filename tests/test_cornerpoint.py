"""Corner-point geometry: regular box must reproduce the cartesian grid;
faulted columns connect by interval overlap (opm-grid preprocessor
capability, test_transmissibilitymultipliers grid analogue)."""
import numpy as np
import pytest

from opm_tpu.grid import build_grid
from opm_tpu.grid.cornerpoint import (cell_geometry, corner_coordinates,
                                      process_corner_point)
from opm_tpu.io.eclstate import load_case_string

FT = 0.3048
MD = 9.869232667160130e-16


def _box_coord_zcorn(nx, ny, nz, dx, dy, dz, top=1000.0):
    """Regular box as COORD/ZCORN."""
    coord = []
    for j in range(ny + 1):
        for i in range(nx + 1):
            x, y = i * dx, j * dy
            coord += [x, y, top, x, y, top + nz * dz]
    zcorn = np.zeros((nz, 2, ny, 2, nx, 2))
    for k in range(nz):
        zcorn[k, 0] = top + k * dz
        zcorn[k, 1] = top + (k + 1) * dz
    return np.asarray(coord), zcorn.reshape(-1)


def test_regular_box_geometry():
    nx, ny, nz = 3, 2, 2
    coord, zcorn = _box_coord_zcorn(nx, ny, nz, 100.0, 50.0, 10.0)
    geom = process_corner_point((nx, ny, nz), coord, zcorn)
    assert np.allclose(geom["volume"], 100 * 50 * 10)
    cent = geom["centroid"].reshape(nz, ny, nx, 3)
    assert np.allclose(cent[0, 0, 0], [50, 25, 1005])
    assert np.allclose(cent[1, 1, 2], [250, 75, 1015])
    # connections: x: 2*2*2=8, y: 3*2=6? (nx-1)*ny*nz + nx*(ny-1)*nz + nx*ny*(nz-1)
    n_expected = (nx - 1) * ny * nz + nx * (ny - 1) * nz + nx * ny * (nz - 1)
    assert len(geom["connections"]) == n_expected


def test_cornerpoint_matches_cartesian_trans():
    """Same box through the deck: corner-point trans == cartesian trans."""
    nx, ny, nz = 4, 3, 2
    coord, zcorn = _box_coord_zcorn(nx, ny, nz, 100.0, 100.0, 10.0)
    n = nx * ny * nz

    def deck(grid_keywords):
        return load_case_string(f"""
RUNSPEC
DIMENS
 {nx} {ny} {nz} /
METRIC
GRID
{grid_keywords}
PORO
 {n}*0.25 /
PERMX
 {n}*100 /
""")

    cp_kw = ("COORD\n " + " ".join(f"{v:.6g}" for v in coord) + " /\n"
             + "ZCORN\n " + " ".join(f"{v:.6g}" for v in zcorn) + " /\n")
    cart_kw = (f"DX\n {n}*100 /\nDY\n {n}*100 /\nDZ\n {n}*10 /\n"
               f"TOPS\n {nx * ny}*1000 /\n")
    g_cp = build_grid(deck(cp_kw))
    g_ca = build_grid(deck(cart_kw))
    assert g_cp.nc == g_ca.nc
    assert np.allclose(g_cp.volume, g_ca.volume)
    assert np.allclose(np.sort(g_cp.trans), np.sort(g_ca.trans), rtol=1e-9)
    assert np.allclose(g_cp.depth, g_ca.depth)


def test_fault_overlap_connections():
    """Throw one column down by half a cell: stair-step connections appear
    with reduced (overlap-clipped) face area."""
    nx, ny, nz = 2, 1, 2
    dx = dy = 100.0
    dz = 10.0
    coord, zcorn = _box_coord_zcorn(nx, ny, nz, dx, dy, dz)
    zc = zcorn.reshape(nz, 2, ny, 2, nx, 2)
    zc[:, :, :, :, 1, :] += 5.0  # drop column i=1 by dz/2
    geom = process_corner_point((nx, ny, nz), coord, zc.reshape(-1))
    # x-connections across the fault: (0,0)-(1,0), (0,0)-(1,... pairs with
    # overlap: kL=0 with kR=0 (5 m overlap), kL=1 with kR=0 (5 m) and
    # kL=1 with kR=1 (5 m)
    xconns = [(c[0], c[1], np.linalg.norm(c[2]))
              for c in geom["connections"] if c[5] == 0]
    assert len(xconns) == 3
    for (_, _, a) in xconns:
        assert a == pytest.approx(5.0 * dy, rel=1e-9)
