"""Corner-point (COORD/ZCORN) geometry processing.

Re-implements the capability of opm-grid's corner-point preprocessor
(consumed by the reference through Dune::CpGrid / UnstructuredGrid,
/root/reference/opm/autodiff/GridInit.hpp:34-100): pillar interpolation of
cell corners, hexahedral volumes/centroids by tetrahedral decomposition,
face area vectors, and NEWTRAN-style half-transmissibilities
    h = K_dir * (A . c) / (c . c),   c = face centroid - cell centroid.

Fault handling: lateral connections are built for every (kL, kR) layer pair
whose face intervals overlap on the shared pillar edges (stair-step faults),
with the face clipped to the overlapping depth interval — the interval-
overlap approximation of the preprocessor's exact polygon clipping.
Everything is vectorized NumPy, run once per case on the host.
"""

from __future__ import annotations

import numpy as np


def _pillar_xy(coord, zc):
    """Interpolate (x, y) on pillars at depths zc.
    coord: (..., 6) [xt, yt, zt, xb, yb, zb]; zc broadcastable."""
    xt, yt, zt = coord[..., 0], coord[..., 1], coord[..., 2]
    xb, yb, zb = coord[..., 3], coord[..., 4], coord[..., 5]
    dz = zb - zt
    t = np.where(np.abs(dz) > 1e-12, (zc - zt) / np.where(dz == 0, 1, dz),
                 0.0)
    return xt + t * (xb - xt), yt + t * (yb - yt)


def corner_coordinates(dims, coord, zcorn):
    """(nz, ny, nx, 2, 2, 2, 3) corner xyz: [k][j][i][kc][jc][ic]."""
    nx, ny, nz = dims
    coord = np.asarray(coord, dtype=np.float64).reshape(ny + 1, nx + 1, 6)
    zc = np.asarray(zcorn, dtype=np.float64).reshape(nz, 2, ny, 2, nx, 2)
    # reorder to [k, j, i, kc, jc, ic]
    zc = zc.transpose(0, 2, 4, 1, 3, 5)
    out = np.empty((nz, ny, nx, 2, 2, 2, 3))
    for jc in range(2):
        for ic in range(2):
            pil = coord[np.arange(ny) + jc][:, np.arange(nx) + ic]  # (ny,nx,6)
            z = zc[:, :, :, :, jc, ic]                  # (nz, ny, nx, 2)
            x, y = _pillar_xy(pil[None, :, :, None, :], z)
            out[:, :, :, :, jc, ic, 0] = x
            out[:, :, :, :, jc, ic, 1] = y
            out[:, :, :, :, jc, ic, 2] = z
    return out


def _quad_geometry(p00, p01, p10, p11):
    """Area vector (diagonal cross product / 2) + centroid of a quad with
    corners in (u, v) orientation p[u][v]."""
    area = 0.5 * np.cross(p11 - p00, p01 - p10)
    centroid = 0.25 * (p00 + p01 + p10 + p11)
    return area, centroid


class _ConnView:
    """Sequence view over connection arrays, tuple-compatible with the
    Python reference's list of (g1, g2, area, fc1, fc2, dir)."""

    def __init__(self, g1, g2, area, fc, dr):
        self._a = (g1, g2, area, fc, dr)

    def __len__(self):
        return len(self._a[0])

    def __getitem__(self, i):
        g1, g2, area, fc, dr = self._a
        return (int(g1[i]), int(g2[i]), area[i], fc[i], fc[i], int(dr[i]))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


def cell_geometry(corners):
    """Volumes and centroids from the 8 corners.

    corners: (..., 2, 2, 2, 3) [kc][jc][ic]. Tetrahedral decomposition:
    centre + 2 triangles per face x 6 faces."""
    c = corners
    centre = c.reshape(c.shape[:-4] + (8, 3)).mean(axis=-2)
    # six faces as corner quadruples (quad orientation outward-ish;
    # orientation consistency is irrelevant for |volume|)
    faces = [
        (c[..., 0, 0, 0, :], c[..., 0, 0, 1, :],
         c[..., 0, 1, 0, :], c[..., 0, 1, 1, :]),   # top (k-)
        (c[..., 1, 0, 0, :], c[..., 1, 0, 1, :],
         c[..., 1, 1, 0, :], c[..., 1, 1, 1, :]),   # bottom (k+)
        (c[..., 0, 0, 0, :], c[..., 0, 1, 0, :],
         c[..., 1, 0, 0, :], c[..., 1, 1, 0, :]),   # x-
        (c[..., 0, 0, 1, :], c[..., 0, 1, 1, :],
         c[..., 1, 0, 1, :], c[..., 1, 1, 1, :]),   # x+
        (c[..., 0, 0, 0, :], c[..., 0, 0, 1, :],
         c[..., 1, 0, 0, :], c[..., 1, 0, 1, :]),   # y-
        (c[..., 0, 1, 0, :], c[..., 0, 1, 1, :],
         c[..., 1, 1, 0, :], c[..., 1, 1, 1, :]),   # y+
    ]
    vol = np.zeros(c.shape[:-4])
    cent = np.zeros(c.shape[:-4] + (3,))
    for (a, b, d, e) in faces:
        # two triangles (a,b,e) and (a,e,d); tet volume with apex = centre
        for tri in ((a, b, e), (a, e, d)):
            v0 = tri[0] - centre
            v1 = tri[1] - centre
            v2 = tri[2] - centre
            tv = np.abs(np.einsum("...i,...i->...", v0,
                                  np.cross(v1, v2))) / 6.0
            tc = (tri[0] + tri[1] + tri[2] + centre) / 4.0
            vol += tv
            cent += tv[..., None] * tc
    cent = cent / np.maximum(vol, 1e-300)[..., None]
    return vol, cent


def process_corner_point(dims, coord, zcorn, actnum=None):
    """Full geometry: per-cell volume/centroid/corner array + connection
    list with half-face geometry.

    Returns dict with: volume (ncg,), centroid (ncg, 3), plus a connection
    list [(c1, c2, area_vec (3,), fc1 (3,), fc2 (3,), dir)] in global
    (cartesian) cell indices, lateral faces clipped by interval overlap.
    """
    nx, ny, nz = dims
    corners = corner_coordinates(dims, coord, zcorn)
    vol, cent = cell_geometry(corners)
    use_native = True
    volf = vol.reshape(-1)
    centf = cent.reshape(-1, 3)
    # axis-aligned cell extents (mean over the 4 corner pairs per axis)
    # for Peaceman well-index geometry
    ext = np.stack([
        np.abs(corners[..., :, :, 1, 0] - corners[..., :, :, 0, 0])
        .mean(axis=(-2, -1)),
        np.abs(corners[..., :, 1, :, 1] - corners[..., :, 0, :, 1])
        .mean(axis=(-2, -1)),
        np.abs(corners[..., 1, :, :, 2] - corners[..., 0, :, :, 2])
        .mean(axis=(-2, -1)),
    ], axis=-1).reshape(-1, 3)

    def gid(i, j, k):
        return (k * ny + j) * nx + i

    if use_native:
        # native connection builder (native/cornerpoint.cpp — the
        # opm-grid processEclipseGrid role); the Python loops below are
        # the reference implementation and the fallback
        from opm_tpu.native.graph import cp_connections
        nat = cp_connections(dims, corners)
        if nat is not None:
            g1, g2, area_a, fc_a, dir_a = nat
            conns = _ConnView(g1, g2, area_a, fc_a, dir_a)
            return dict(volume=volf, centroid=centf, connections=conns,
                        conn_arrays=nat, extent=ext)

    conns = []

    # vertical (k-direction) faces: between (k) bottom and (k+1) top of the
    # same column — conforming by construction in corner-point grids
    for k in range(nz - 1):
        cb = corners[k, :, :, 1]        # (ny, nx, 2, 2, 3) bottom corners
        area, fc = _quad_geometry(cb[:, :, 0, 0], cb[:, :, 0, 1],
                                  cb[:, :, 1, 0], cb[:, :, 1, 1])
        for j in range(ny):
            for i in range(nx):
                conns.append((gid(i, j, k), gid(i, j, k + 1),
                              area[j, i], fc[j, i], fc[j, i], 2))

    # lateral faces: fast vectorized path for vertically conforming
    # interfaces (zcorn matches across the shared pillars), stair-step
    # fault pairing by z-interval overlap otherwise
    for axis, (di, dj) in ((0, (1, 0)), (1, (0, 1))):
        if axis == 0:
            faceL = corners[:, :, :-1, :, :, 1]    # (nz, ny, nx-1, kc, jc, 3)
            faceR = corners[:, :, 1:, :, :, 0]
        else:
            faceL = corners[:, :-1, :, :, 1, :]
            faceR = corners[:, 1:, :, :, 0, :]
        conforming = np.allclose(faceL[..., 2], faceR[..., 2], atol=1e-9)
        if conforming:
            area, fc = _quad_geometry(faceL[..., 0, 0, :], faceL[..., 0, 1, :],
                                      faceL[..., 1, 0, :], faceL[..., 1, 1, :])
            nzl, nyl, nxl = area.shape[:3]
            for k in range(nzl):
                for j in range(nyl):
                    for i in range(nxl):
                        conns.append((gid(i, j, k), gid(i + di, j + dj, k),
                                      area[k, j, i], fc[k, j, i],
                                      fc[k, j, i], axis))
            continue
        for j in range(ny - dj):
            for i in range(nx - di):
                for kL in range(nz):
                    # left cell's + side face corner depths on both edges
                    if axis == 0:
                        cL = corners[kL, j, i, :, :, 1]      # (kc, jc, 3)
                    else:
                        cL = corners[kL, j, i, :, 1, :]      # (kc, ic, 3)
                    zL_top = cL[0, :, 2]
                    zL_bot = cL[1, :, 2]
                    for kR in range(nz):
                        if axis == 0:
                            cR = corners[kR, j + dj, i + di, :, :, 0]
                        else:
                            cR = corners[kR, j + dj, i + di, :, 0, :]
                        zR_top = cR[0, :, 2]
                        zR_bot = cR[1, :, 2]
                        zt = np.maximum(zL_top, zR_top)
                        zb = np.minimum(zL_bot, zR_bot)
                        if np.all(zb - zt <= 1e-12):
                            continue
                        zt_c = np.minimum(zt, zb)
                        # clipped quad on the shared pillar pair: corners at
                        # (edge 0/1, top/bot) — xy from the left face edges
                        p = np.empty((2, 2, 3))
                        for e in range(2):
                            xy_t = cL[0, e, :2]
                            xy_b = cL[1, e, :2]
                            span = max(zL_bot[e] - zL_top[e], 1e-12)
                            for tb, zv in enumerate((zt_c[e], zb[e])):
                                t = np.clip((zv - zL_top[e]) / span, 0, 1)
                                p[e, tb, :2] = xy_t + t * (xy_b - xy_t)
                                p[e, tb, 2] = zv
                        area, fc = _quad_geometry(p[0, 0], p[0, 1],
                                                  p[1, 0], p[1, 1])
                        conns.append((gid(i, j, kL),
                                      gid(i + di, j + dj, kR),
                                      area, fc, fc, axis))
    g1 = np.asarray([c[0] for c in conns], dtype=np.int64)
    g2 = np.asarray([c[1] for c in conns], dtype=np.int64)
    area_a = (np.stack([np.asarray(c[2]) for c in conns])
              if conns else np.zeros((0, 3)))
    fc_a = (np.stack([np.asarray(c[3]) for c in conns])
            if conns else np.zeros((0, 3)))
    dir_a = np.asarray([c[5] for c in conns], dtype=np.int64)
    return dict(volume=volf, centroid=centf, connections=conns,
                conn_arrays=(g1, g2, area_a, fc_a, dir_a), extent=ext)


def half_trans(perm_dir, area_vec, face_centroid, cell_centroid):
    """NEWTRAN half-transmissibility for one cell side."""
    c = face_centroid - cell_centroid
    cc = np.einsum("...i,...i->...", c, c)
    ac = np.abs(np.einsum("...i,...i->...", area_vec, c))
    return perm_dir * ac / np.maximum(cc, 1e-300)
