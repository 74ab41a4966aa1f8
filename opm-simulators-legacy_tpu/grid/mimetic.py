"""Mimetic (IP-SIMPLE) inner products — hybrid/mixed FEM building block.

Re-implements the reference's mimetic kernels (/root/reference/opm/core/
pressure/mimetic/mimetic.c):
  * mim_ip_simple_all / mim_ip_simple (:29-94): per-cell inverse inner
    product  Binv = N K N' / vol + (6 tr(K) / (d vol)) X  with
    X = diag(A) (I - Q Q') diag(A), Q = orth(diag(A) C)  — the IP_SIMPLE
    family used by the mimetic/multiscale pressure solvers.
  * mim_ip_compute_gpress (:191-215): gravity contribution per half-face.

The serial per-cell LAPACK loop (dgeqrf/dorgqr/dsyrk/dgemm per cell)
becomes one vmapped batch of 6x3 QRs and 6x6 matmuls over all cells —
exactly the shape the MXU wants. Cartesian cells have the 6-face
(x-,x+,y-,y+,z-,z+) connection layout; exactness for linear pressure
fields (Binv C = N K) is pinned by tests."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cell_geometry(grid):
    """(C, N, A, vol, K) batched per cell for the 6 axis-aligned faces.

    C: (nc, 6, 3) face-centroid offsets from the cell centroid;
    N: (nc, 6, 3) outward area-weighted normals; A: (nc, 6) face areas;
    K: (nc, 3, 3) diagonal permeability tensors."""
    dx = jnp.asarray(grid.dx)
    dy = jnp.asarray(grid.dy)
    dz = jnp.asarray(grid.dz)
    nc = grid.nc
    zero = jnp.zeros(nc)
    half = 0.5

    def stack_rows(*rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=1)

    C = stack_rows((-half * dx, zero, zero), (half * dx, zero, zero),
                   (zero, -half * dy, zero), (zero, half * dy, zero),
                   (zero, zero, -half * dz), (zero, zero, half * dz))
    ax = dy * dz
    ay = dx * dz
    az = dx * dy
    A = jnp.stack([ax, ax, ay, ay, az, az], axis=1)
    N = stack_rows((-ax, zero, zero), (ax, zero, zero),
                   (zero, -ay, zero), (zero, ay, zero),
                   (zero, zero, -az), (zero, zero, az))
    vol = jnp.asarray(grid.volume)
    K = jax.vmap(jnp.diag)(jnp.stack([jnp.asarray(grid.permx),
                                      jnp.asarray(grid.permy),
                                      jnp.asarray(grid.permz)], axis=-1))
    return C, N, A, vol, K


@jax.jit
def ip_simple(C, N, A, vol, K):
    """Batched mim_ip_simple: (nc, 6, 6) inverse inner products."""
    d = C.shape[-1]

    def one(Ci, Ni, Ai, vi, Ki):
        AC = Ai[:, None] * Ci
        Q, _ = jnp.linalg.qr(AC)                      # (6, d) orthonormal
        X = jnp.eye(Ci.shape[0]) - Q @ Q.T
        X = Ai[:, None] * X * Ai[None, :]
        t = jnp.trace(Ki)
        return (Ni @ Ki @ Ni.T) / vi + (6.0 * t / (d * vi)) * X

    return jax.vmap(one)(C, N, A, vol, K)


def mimetic_ip_simple(grid):
    """mim_ip_simple_all for a cartesian grid: (nc, 6, 6) Binv."""
    return ip_simple(*cell_geometry(grid))


def compute_gpress(grid, gravity=None):
    """mim_ip_compute_gpress: g . (face centroid - cell centroid) per
    half-face, (nc, 6). Gravity along +z (depth) by default."""
    g = grid.gravity if gravity is None else gravity
    dz = jnp.asarray(grid.dz)
    zero = jnp.zeros(grid.nc)
    return jnp.stack([zero, zero, zero, zero,
                      -0.5 * g * dz, 0.5 * g * dz], axis=1)
