"""Time-of-flight and tracer by upwind finite volumes.

Re-implements TofReorder (/root/reference/opm/core/flowdiagnostics/
TofReorder.hpp:43-117: v . grad(tof) = porevolume, solved cell-by-cell in
upwind order, tracer variant solveTofTracer) as wavefront sweeps: the local
update  tof_i = (pv_i + sum_in |f| tof_up) / sum_out |f|  is evaluated for
every cell simultaneously and repeated; after `nlevels` sweeps (from
native/tarjan.cpp) the acyclic part is exact, extra sweeps converge SCC
loops Gauss-Seidel-style (the reference's multicell handling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.native.graph import upwind_levels


def _sweep_structure(face_cells, flux, nc):
    c1 = face_cells[:, 0]
    c2 = face_cells[:, 1]
    absf = jnp.abs(flux)
    pos = flux >= 0
    upcell = jnp.where(pos, c1, c2)
    downcell = jnp.where(pos, c2, c1)
    return upcell, downcell, absf


def _tof_sweep(tof, upcell, downcell, absf, pv, outflux):
    influx = jnp.zeros_like(tof).at[downcell].add(absf * tof[upcell])
    return (pv + influx) / outflux


def solve_tof(face_cells, flux, pore_volume, source, *, nsweeps=None):
    """Forward time-of-flight from inflow (source > 0). For backward TOF
    (from producers), call with flux negated and source = -source."""
    nc = len(pore_volume)
    face_cells = jnp.asarray(face_cells)
    flux = jnp.asarray(flux)
    pv = jnp.asarray(pore_volume)
    src = jnp.asarray(source)
    upcell, downcell, absf = _sweep_structure(face_cells, flux, nc)
    outflux = jnp.zeros(nc).at[upcell].add(absf) + jnp.maximum(-src, 0.0)
    outflux = jnp.maximum(outflux, 1e-300)
    if nsweeps is None:
        sched = upwind_levels(nc, np.asarray(face_cells), np.asarray(flux))
        nsweeps = sched.nlevels + (30 if sched.max_scc > 1 else 1)

    def body(_, tof):
        return _tof_sweep(tof, upcell, downcell, absf, pv, outflux)

    tof0 = pv / outflux
    tof = jax.lax.fori_loop(0, int(nsweeps), body, tof0)
    return tof


def solve_tof_tracer(face_cells, flux, pore_volume, source, tracer_heads,
                     *, nsweeps=None):
    """TOF plus tracer partitions (solveTofTracer, TofReorder.hpp:75).

    tracer_heads: list of arrays of cell indices, one per tracer (injector);
    returns (tof (nc,), tracer (ntracer, nc)) with tracer in [0,1]."""
    nc = len(pore_volume)
    face_cells = jnp.asarray(face_cells)
    flux = jnp.asarray(flux)
    pv = jnp.asarray(pore_volume)
    src = jnp.asarray(source)
    upcell, downcell, absf = _sweep_structure(face_cells, flux, nc)
    outflux = jnp.zeros(nc).at[upcell].add(absf) + jnp.maximum(-src, 0.0)
    influx_tot = jnp.zeros(nc).at[downcell].add(absf) + jnp.maximum(src, 0.0)
    if nsweeps is None:
        sched = upwind_levels(nc, np.asarray(face_cells), np.asarray(flux))
        nsweeps = sched.nlevels + (30 if sched.max_scc > 1 else 1)

    tof = solve_tof(face_cells, flux, pore_volume, source, nsweeps=nsweeps)

    ntr = len(tracer_heads)
    conc = jnp.zeros((ntr, nc))
    head_mask = jnp.zeros((ntr, nc))
    for t, cells in enumerate(tracer_heads):
        head_mask = head_mask.at[t, jnp.asarray(cells)].set(1.0)

    def body(_, conc):
        cin = jnp.zeros((ntr, nc)).at[:, downcell].add(
            absf[None, :] * conc[:, upcell])
        # head cells carry their injected tracer at concentration 1
        out = cin / jnp.maximum(influx_tot, 1e-300)[None, :]
        return jnp.where(head_mask > 0, 1.0, out)

    conc = jax.lax.fori_loop(0, int(nsweeps), body, conc)
    return tof, conc


# ---------------------------------------------------------------------------
# Discontinuous-Galerkin degree-1 TOF on cartesian grids
# ---------------------------------------------------------------------------
def _solve4x4_t(M, b):
    """Solve per-cell 4x4 systems in (4, 4, n) / (4, n) layout by 2x2 block
    elimination with closed-form 2x2 inverses (no LU: f64-safe on TPU, and
    the (4,4)-trailing layout that batched jnp.linalg.solve wants would
    tile-pad 64x)."""
    def inv2(a, b_, c, d):
        det = a * d - b_ * c
        det = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
        return d / det, -b_ / det, -c / det, a / det

    A = M[:2, :2]
    B = M[:2, 2:]
    C = M[2:, :2]
    D = M[2:, 2:]
    b1, b2 = b[:2], b[2:]
    ai = inv2(A[0, 0], A[0, 1], A[1, 0], A[1, 1])

    def m2v(m, v):      # (2x2 as 4-tuple) @ (2, n)
        return jnp.stack([m[0] * v[0] + m[1] * v[1],
                          m[2] * v[0] + m[3] * v[1]])

    def m2m(m, N):      # (2x2 tuple) @ (2,2,n)
        return jnp.stack([
            jnp.stack([m[0] * N[0, 0] + m[1] * N[1, 0],
                       m[0] * N[0, 1] + m[1] * N[1, 1]]),
            jnp.stack([m[2] * N[0, 0] + m[3] * N[1, 0],
                       m[2] * N[0, 1] + m[3] * N[1, 1]])])

    AiB = m2m(ai, B)
    S = D - jnp.einsum("ik...,kj...->ij...", C, AiB)
    si = inv2(S[0, 0], S[0, 1], S[1, 0], S[1, 1])
    rhs2 = b2 - m2v((C[0, 0], C[0, 1], C[1, 0], C[1, 1]), m2v(ai, b1))
    x2 = m2v(si, rhs2)
    x1 = m2v(ai, b1) - jnp.einsum("ik...,k...->i...", AiB, x2)
    return jnp.concatenate([x1, x2], axis=0)


def solve_tof_dg1(grid, flux, source, *, nsweeps=None):
    """Degree-1 discontinuous-Galerkin time-of-flight on a fully-active
    cartesian grid — the TofDiscGalReorder capability
    (/root/reference/opm/core/tof/TofDiscGalReorder.{hpp,cpp}: per-cell
    basis {1, x, y, z}, upstream face fluxes, cell-by-cell solves in
    topological order; tested by tests/test_dgbasis.cpp). The serial
    reorder becomes wavefront sweeps of simultaneous per-cell 4x4 solves,
    with all face topology as static slices.

    Returns (nc, 4): [mean tof, d-slope per unit cell width x/y/z].
    Exact (single sweep pass) for piecewise-linear TOF fields, e.g.
    uniform flow, where the FV scheme smears.
    """
    nx, ny, nz = grid.dims
    assert getattr(grid, "structured", False), "DG TOF needs cartesian grid"
    nc = grid.nc
    shape3 = (nz, ny, nx)
    nfx = (nx - 1) * ny * nz
    nfy = nx * (ny - 1) * nz
    flux = jnp.asarray(flux)
    f3 = [flux[:nfx].reshape(nz, ny, max(nx - 1, 0)),
          flux[nfx:nfx + nfy].reshape(nz, max(ny - 1, 0), nx),
          flux[nfx + nfy:].reshape(max(nz - 1, 0), ny, nx)]
    # pad with sealed boundary faces: fpad[d] has cell-count+1 faces along d
    axis_of = {0: 2, 1: 1, 2: 0}     # direction -> array axis
    fpad = []
    for d in range(3):
        ax = axis_of[d]
        pads = [(0, 0)] * 3
        pads[ax] = (1, 1)
        fpad.append(jnp.pad(f3[d], pads))
    pv3 = jnp.asarray(grid.pore_volume).reshape(shape3)
    src3 = jnp.asarray(source).reshape(shape3)
    # production stabilizes at the volume-average trace (the FV scheme's
    # outflux += q_prod convention); an inflow source only reduces the
    # cell's net face outflow, which leaves the injector cell's exported
    # trace at the full-transit value pv/q -- downstream cells then
    # reproduce a linear tof field exactly
    q_prod = jnp.maximum(-src3, 0.0)

    def take(a, ax, sl):
        idx = [slice(None)] * 3
        idx[ax] = sl
        return a[tuple(idx)]

    # ---- static system matrix M (4, 4, cells) ---------------------------
    M = jnp.zeros((4, 4) + shape3)
    # production source: volume-average trace
    M = M.at[0, 0].add(q_prod)
    for d in range(3):
        M = M.at[1 + d, 1 + d].add(q_prod / 12.0)
    for d in range(3):
        ax = axis_of[d]
        fL = take(fpad[d], ax, slice(None, -1))   # face on own -d side
        fR = take(fpad[d], ax, slice(1, None))    # face on own +d side
        q_d = 0.5 * (fL + fR)
        # volume advection: -int tau (v . grad phi_d) = -q_d a0
        M = M.at[1 + d, 0].add(-q_d)
        for s, f in ((1.0, fR), (-1.0, fL)):
            q_out = jnp.maximum(s * f, 0.0)
            # T = u u^T + (1/12) diag(transverse), u = e0 + (s/2) e_{1+d}
            M = M.at[0, 0].add(q_out)
            M = M.at[0, 1 + d].add(q_out * s / 2)
            M = M.at[1 + d, 0].add(q_out * s / 2)
            M = M.at[1 + d, 1 + d].add(q_out / 4)
            for e in range(3):
                if e != d:
                    M = M.at[1 + e, 1 + e].add(q_out / 12.0)
    # stagnant-cell regularization
    M = M.at[0, 0].add(jnp.where(M[0, 0] <= 1e-300, 1.0, 0.0))
    for m in range(1, 4):
        M = M.at[m, m].add(jnp.where(jnp.abs(M[m, m]) <= 1e-300, 1.0, 0.0))

    if nsweeps is None:
        sched = upwind_levels(nc, np.asarray(grid.face_cells),
                              np.asarray(flux))
        nsweeps = sched.nlevels + (30 if sched.max_scc > 1 else 1)

    def shift_in(a, ax, s):
        """Neighbor value on the upstream side: own -d face (s=-1) reads
        the -d neighbor => shift +1 along ax; own +d face reads +d."""
        pads = [(0, 0)] * a.ndim
        if s < 0:
            pads[a.ndim - 3 + ax] = (1, 0)
            return jnp.pad(a, pads)[..., :, :, :][
                tuple([slice(None)] * (a.ndim - 3)
                      + [slice(None, -1) if k == ax else slice(None)
                         for k in range(3)])]
        pads[a.ndim - 3 + ax] = (0, 1)
        return jnp.pad(a, pads)[
            tuple([slice(None)] * (a.ndim - 3)
                  + [slice(1, None) if k == ax else slice(None)
                     for k in range(3)])]

    def sweep(_, a):
        """a: (4, nz, ny, nx) coefficients."""
        b = jnp.zeros((4,) + shape3).at[0].set(pv3)
        for d in range(3):
            ax = axis_of[d]
            fL = take(fpad[d], ax, slice(None, -1))
            fR = take(fpad[d], ax, slice(1, None))
            for s, f in ((1.0, fR), (-1.0, fL)):
                q_in = jnp.maximum(-s * f, 0.0)
                a_up = shift_in(a, ax, s)
                trace_up = a_up[0] - (s / 2) * a_up[1 + d]
                b = b.at[0].add(q_in * trace_up)
                b = b.at[1 + d].add(q_in * (s / 2) * trace_up)
                for e in range(3):
                    if e != d:
                        b = b.at[1 + e].add(q_in * a_up[1 + e] / 12.0)
        return _solve4x4_t(M.reshape(4, 4, -1),
                           b.reshape(4, -1)).reshape((4,) + shape3)

    a0 = jnp.zeros((4,) + shape3)
    a = jax.lax.fori_loop(0, int(nsweeps), sweep, a0)
    return jnp.moveaxis(a.reshape(4, -1), 0, -1)
