import numpy as np
import pytest

from opm_tpu.grid import build_grid, cartesian_grid
from opm_tpu.io.eclstate import load_case
import os

SPE1 = os.path.join(os.path.dirname(__file__), "..", "data", "SPE1CASE2.DATA")
MD = 9.869232667160130e-16
FT = 0.3048


def test_cartesian_grid_basic():
    g = cartesian_grid((3, 2, 2), (30.0, 20.0, 4.0), poro=0.25, perm=1e-13)
    assert g.nc == 12
    assert np.allclose(g.volume, 10 * 10 * 2)
    assert np.allclose(g.pore_volume, 0.25 * 200)
    # faces: x: 2*2*2=8, y: 3*2=6? (nx-1)*ny*nz=8, nx*(ny-1)*nz=6, nx*ny*(nz-1)=6
    assert g.nf == 8 + 6 + 6
    # x-face trans: harmonic mean of k*A/(dx/2): k=1e-13, A=10*2, d=5
    t_exp = 1.0 / (2 * 5 / (1e-13 * 20))
    assert np.allclose(g.trans[g.face_dir == 0], t_exp)


def test_cartesian_depth_stacking():
    g = cartesian_grid((1, 1, 3), (1.0, 1.0, 30.0), depth_top=1000.0)
    assert np.allclose(g.depth, [1005.0, 1015.0, 1025.0])


def test_spe1_grid():
    case = load_case(SPE1)
    g = build_grid(case)
    assert g.nc == 300
    assert g.nf == 9 * 10 * 3 + 10 * 9 * 3 + 10 * 10 * 2
    # pore volume: sum = 0.3 * 1000^2 ft2 * (20+30+50) ft * 100 columns
    pv_exp = 0.3 * (1000 * FT) ** 2 * (100 * FT) * 100
    assert g.pore_volume.sum() == pytest.approx(pv_exp, rel=1e-10)
    # layer-1 x-trans: k=500 mD, A=1000ft*20ft, d=500ft (harmonic of equals)
    k = 500 * MD
    A = (1000 * FT) * (20 * FT)
    t_exp = k * A / (1000 * FT)
    ix = (g.face_dir == 0) & (g.depth[g.face_cells[:, 0]] < 8350 * FT)
    assert np.allclose(g.trans[ix], t_exp)
    # depths
    assert g.depth.min() == pytest.approx(8335 * FT)
    assert g.depth.max() == pytest.approx(8400 * FT)


def test_actnum_removes_faces():
    from opm_tpu.io.eclstate import load_case_string
    case = load_case_string("""
RUNSPEC
DIMENS
 3 1 1 /
GRID
DX
 3*10 /
DY
 3*10 /
DZ
 3*10 /
TOPS
 3*1000 /
PORO
 3*0.2 /
PERMX
 3*100 /
ACTNUM
 1 0 1 /
""")
    g = build_grid(case)
    assert g.nc == 2
    assert g.nf == 0  # middle cell inactive disconnects the grid


def test_mimetic_ip_simple_exact_for_linear_pressure():
    """IP-SIMPLE inner product (mim_ip_simple, mimetic.c:83-94): exactness
    Binv C = N K for linear pressure fields, symmetry, positive
    definiteness."""
    import numpy as np

    from opm_tpu.grid import cartesian_grid
    from opm_tpu.grid.mimetic import cell_geometry, mimetic_ip_simple

    g = cartesian_grid((3, 2, 2), (30.0, 8.0, 10.0), perm=1e-13)
    # anisotropic perm
    g.permz[:] = g.permx * 0.1
    g.permy[:] = g.permx * 0.5
    Binv = np.asarray(mimetic_ip_simple(g))
    C, N, A, vol, K = cell_geometry(g)
    C, N, K = np.asarray(C), np.asarray(N), np.asarray(K)
    for c in range(g.nc):
        # consistency: Binv C = N K  (linear-pressure exactness)
        assert np.allclose(Binv[c] @ C[c], N[c] @ K[c], rtol=1e-10)
        # symmetric positive definite
        assert np.allclose(Binv[c], Binv[c].T, rtol=1e-10)
        w = np.linalg.eigvalsh(Binv[c])
        assert w.min() > 0

    from opm_tpu.grid.mimetic import compute_gpress
    gp = np.asarray(compute_gpress(g))
    # z-face half-columns carry +-g dz/2, lateral faces zero
    assert np.allclose(gp[:, :4], 0.0)
    assert np.allclose(gp[:, 5], 9.80665 * 0.5 * g.dz)


def test_block_partition_split_disconnected():
    """partition.c capability: uniform blocks + connected-component split
    + compressed ids."""
    import numpy as np

    from opm_tpu.grid import cartesian_grid
    from opm_tpu.parallel.partition import block_partition

    g = cartesian_grid((8, 8, 1), (8.0, 8.0, 1.0))
    p, n = block_partition(g, (2, 2, 1))
    assert n == 4
    assert np.unique(p).size == 4
    # each block is one connected 4x4 patch of 16 cells
    counts = np.bincount(p)
    assert np.all(counts == 16)


def test_estimate_cell_velocity_uniform_flow():
    """estimateCellVelocity: uniform x-flow recovers the exact interior
    Darcy velocity and zero transverse components."""
    import numpy as np

    from opm_tpu.grid import cartesian_grid
    from opm_tpu.grid.grid import estimate_cell_velocity

    g = cartesian_grid((10, 3, 2), (100.0, 30.0, 10.0), perm=1e-13)
    q = 4.0e-6                            # m3/s through every x-face
    flux = np.zeros(g.nf)
    flux[np.asarray(g.face_dir) == 0] = q
    v = estimate_cell_velocity(g, flux)
    area_x = 10.0 * 5.0                   # dy*dz
    interior = np.asarray(
        [g.active_index(i, j, k) for i in range(1, 9)
         for j in range(3) for k in range(2)])
    np.testing.assert_allclose(v[interior, 0], q / area_x, rtol=1e-12)
    np.testing.assert_allclose(v[:, 1:], 0.0, atol=1e-18)
    # boundary cells average with the sealed face: half the magnitude
    edge = g.active_index(0, 0, 0)
    assert v[edge, 0] == pytest.approx(0.5 * q / area_x, rel=1e-12)


def _geo_deck(extra_grid=""):
    return f"""
RUNSPEC
DIMENS
 3 1 3 /
OIL
WATER
METRIC
GRID
DX
 9*100 /
DY
 9*100 /
DZ
 9*10 /
TOPS
 3*2000 /
PORO
 9*0.3 /
PERMX
 9*100 /
PERMY
 9*100 /
PERMZ
 9*10 /
{extra_grid}
PROPS
SCHEDULE
END
"""


def test_negative_direction_multipliers():
    """MULTX- of the second cell scales the same connection as MULTX of
    the first (GeoProps.hpp:466 both-direction multipliers)."""
    from opm_tpu.io.eclstate import load_case_string

    base = build_grid(load_case_string(_geo_deck()))
    gx = build_grid(load_case_string(_geo_deck(
        "MULTX\n 0.5 8*1 /\n")))          # cell (0,0,0) +x face
    gxm = build_grid(load_case_string(_geo_deck(
        "MULTX-\n 1 0.5 7*1 /\n")))       # cell (1,0,0) -x face
    # first x-face connects cart cells 0-1
    fx = np.where(np.asarray(base.face_dir) == 0)[0]
    f01 = fx[0]
    assert np.asarray(base.face_cells)[f01].tolist() == [0, 1]
    assert gx.trans[f01] == pytest.approx(0.5 * base.trans[f01])
    assert gxm.trans[f01] == pytest.approx(0.5 * base.trans[f01])
    # both together multiply
    gboth = build_grid(load_case_string(_geo_deck(
        "MULTX\n 0.5 8*1 /\nMULTX-\n 1 0.4 7*1 /\n")))
    assert gboth.trans[f01] == pytest.approx(0.2 * base.trans[f01])
    # other faces untouched
    other = np.ones(len(base.trans), dtype=bool)
    other[f01] = False
    assert np.allclose(gboth.trans[other], base.trans[other])


def test_fault_multflt_trans():
    """FAULTS+MULTFLT scales exactly the fault-face connections
    (GeoProps.hpp:140-160 / TransMult fault path)."""
    from opm_tpu.io.eclstate import load_case_string

    base = build_grid(load_case_string(_geo_deck()))
    g = build_grid(load_case_string(_geo_deck(
        "FAULTS\n 'F1' 1 1 1 1 1 3 'X' /\n/\n"
        "MULTFLT\n 'F1' 0.01 /\n/\n")))
    fc = np.asarray(base.face_cells)
    fd = np.asarray(base.face_dir)
    # fault: +x faces of i=0 cells, all k -> connections (0,1),(3,4),(6,7)
    # in active indexing (3x1x3, x-major)
    on_fault = (fd == 0) & np.isin(fc[:, 0], [0, 3, 6])
    assert on_fault.sum() == 3
    assert np.allclose(g.trans[on_fault], 0.01 * base.trans[on_fault])
    assert np.allclose(g.trans[~on_fault], base.trans[~on_fault])
    # MULTFLT last-record-wins override
    g2 = build_grid(load_case_string(_geo_deck(
        "FAULTS\n 'F1' 1 1 1 1 1 3 'X' /\n/\n"
        "MULTFLT\n 'F1' 0.5 /\n 'F1' 0.25 /\n/\n")))
    assert np.allclose(g2.trans[on_fault], 0.25 * base.trans[on_fault])


def test_nnc_faces_appended():
    """Deck NNC records become face_dir=3 faces with the deck trans in SI
    (AutoDiffHelpers.hpp:60-90 NNC rows; GeoProps NNC trans)."""
    from opm_tpu.io.eclstate import load_case_string
    from opm_tpu.utils.units import si_factor

    g = build_grid(load_case_string(_geo_deck(
        "NNC\n 1 1 1  3 1 3  12.5 /\n/\n")))
    base = build_grid(load_case_string(_geo_deck()))
    assert g.nf == base.nf + 1
    fd = np.asarray(g.face_dir)
    assert fd[-1] == 3
    a1, a2 = np.asarray(g.face_cells)[-1]
    # cart (0,0,0) -> active 0; cart (2,0,2) -> active 8 (fully active)
    assert (a1, a2) == (0, 8)
    assert g.trans[-1] == pytest.approx(
        12.5 * si_factor("METRIC", "Transmissibility"))
    # the structured fast path must be disabled with NNCs present
    assert not g.structured and base.structured
