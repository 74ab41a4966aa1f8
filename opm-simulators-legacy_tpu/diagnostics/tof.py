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


def solve_tof(face_cells, flux, pore_volume, source, *, nsweeps=None,
              face_dir=None):
    """Forward time-of-flight from inflow (source > 0). For backward TOF
    (from producers), call with flux negated and source = -source.

    face_dir: optional (nf,) int axis id per face (0/1/2 on structured
    grids). When given, the solver uses MULTIDIMENSIONAL (transverse)
    upwinding — the TofReorder use_multidim_upwind option
    (/root/reference/opm/core/flowdiagnostics/TofReorder.hpp:48-50,
    TofReorder.cpp:239-448, TMU weighting after Keilegavlen-Kozdon-
    Mallison): each outflow face's TOF blends the upwind cell's value
    with the TOFs of that cell's TRANSVERSE inflow faces (vertex-adjacent
    faces ≡ different-axis faces on a cartesian grid), weighted by
    w = min(transverse influx / outflux, 1). Cuts the cross-wind smearing
    of single-point upwinding on flow oblique to the grid."""
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

    if face_dir is None:
        def body(_, tof):
            return _tof_sweep(tof, upcell, downcell, absf, pv, outflux)

        tof0 = pv / outflux
        return jax.lax.fori_loop(0, int(nsweeps), body, tof0)
    return _solve_tof_multidim(upcell, downcell, absf, pv, src, outflux,
                               jnp.asarray(face_dir, dtype=jnp.int32),
                               int(nsweeps))


def _solve_tof_multidim(upcell, downcell, absf, pv, src, outflux, face_dir,
                        nsweeps):
    """Fixed-point sweeps of the face-level TMU scheme: iteration state is
    (cell tof, face tof).  Per sweep and face f with upwind cell u:
        T_f    = transverse influx of u (inflow faces with axis != axis_f)
        w_f    = min(T_f / |flux_f|, 1)            (TMU weightFunc)
        fterm  = w_f * (influx-weighted mean of those faces' TOFs)
        cfac   = 1 - w_f
        tof_f  = fterm + cfac * tof_u
    and the cell balance becomes
        tof_c = (pv + sum_in |q| tof_f - sum_out |q| fterm)
                / (sum_out |q| cfac + sink)
    which reduces to single-point upwind when w_f = 0 (TofReorder.cpp:
    solveSingleCellMultidimUpwind:239-283, localMultidimUpwindTerms:
    393-448 with the per-vertex terms aggregated per face — the
    TPU-native shape keeps everything as segment-sums over (cell, axis)
    bins instead of per-vertex lists)."""
    nc = pv.shape[0]
    naxes = 3
    # per-(cell, axis) influx bins of the DOWNWIND cell
    bin_idx = downcell * naxes + face_dir
    sink = jnp.maximum(-src, 0.0)

    def body(_, carry):
        tof, face_tof = carry
        q_tof = absf * face_tof
        in_ax = jnp.zeros(nc * naxes).at[bin_idx].add(absf)
        s_ax = jnp.zeros(nc * naxes).at[bin_idx].add(q_tof)
        in_tot = in_ax.reshape(nc, naxes).sum(axis=1)
        s_tot = s_ax.reshape(nc, naxes).sum(axis=1)
        # transverse (different-axis) influx of the upwind cell, per face
        u_bin = upcell * naxes + face_dir
        T = in_tot[upcell] - in_ax[u_bin]
        S = s_tot[upcell] - s_ax[u_bin]
        # the 1/2 is the reference's per-vertex averaging: only the
        # upstream-side vertex of the outflow face sees transverse influx
        # (multidimUpwindTerms averages the per-node w over the face's
        # nodes, TofReorder.cpp:346-368) — it also keeps cfac >= 1/2, so
        # the cell balance denominator never collapses
        w = 0.5 * jnp.minimum(T / jnp.maximum(absf, 1e-300), 1.0)
        w = jnp.where(absf > 0.0, w, 0.0)
        fterm = w * S / jnp.maximum(T, 1e-300)
        cfac = 1.0 - w
        num = (pv + jnp.zeros(nc).at[downcell].add(q_tof)
               - jnp.zeros(nc).at[upcell].add(absf * fterm))
        den = jnp.zeros(nc).at[upcell].add(absf * cfac) + sink
        tof = num / jnp.maximum(den, 1e-300)
        face_tof = fterm + cfac * tof[upcell]
        return tof, face_tof

    tof0 = pv / outflux
    tof, _ = jax.lax.fori_loop(0, int(nsweeps), body, (tof0, tof0[upcell]))
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


_DG1_AXIS_OF = {0: 2, 1: 1, 2: 0}     # direction -> array axis


def _take3(a, ax, sl):
    idx = [slice(None)] * 3
    idx[ax] = sl
    return a[tuple(idx)]


def _shift_in3(a, ax, s):
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


def _dg1_system(grid, flux, source):
    """Shared DG(1) setup: padded directional face fluxes and the static
    per-cell 4x4 upstream system matrix M. Used by both the TOF solve and
    the tracer solve (TofDiscGalReorder assembles the identical jacobian
    for tof and tracer unknowns, TofDiscGalReorder.cpp:420-505).

    Returns (shape3, fpad, pv3, M)."""
    nx, ny, nz = grid.dims
    assert getattr(grid, "structured", False), "DG TOF needs cartesian grid"
    shape3 = (nz, ny, nx)
    nfx = (nx - 1) * ny * nz
    nfy = nx * (ny - 1) * nz
    flux = jnp.asarray(flux)
    f3 = [flux[:nfx].reshape(nz, ny, max(nx - 1, 0)),
          flux[nfx:nfx + nfy].reshape(nz, max(ny - 1, 0), nx),
          flux[nfx + nfy:].reshape(max(nz - 1, 0), ny, nx)]
    # pad with sealed boundary faces: fpad[d] has cell-count+1 faces along d
    fpad = []
    for d in range(3):
        ax = _DG1_AXIS_OF[d]
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

    # ---- static system matrix M (4, 4, cells) ---------------------------
    M = jnp.zeros((4, 4) + shape3)
    # production source: volume-average trace
    M = M.at[0, 0].add(q_prod)
    for d in range(3):
        M = M.at[1 + d, 1 + d].add(q_prod / 12.0)
    for d in range(3):
        ax = _DG1_AXIS_OF[d]
        fL = _take3(fpad[d], ax, slice(None, -1))  # face on own -d side
        fR = _take3(fpad[d], ax, slice(1, None))   # face on own +d side
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
    return shape3, fpad, pv3, M


def _dg1_upstream_rhs(a, fpad, shape3):
    """Upstream-trace face contributions to the DG(1) rhs for the
    coefficient field a (4, nz, ny, nx); the volume source term (pv for
    TOF, nothing for tracer) is added by the caller."""
    b = jnp.zeros((4,) + shape3)
    for d in range(3):
        ax = _DG1_AXIS_OF[d]
        fL = _take3(fpad[d], ax, slice(None, -1))
        fR = _take3(fpad[d], ax, slice(1, None))
        for s, f in ((1.0, fR), (-1.0, fL)):
            q_in = jnp.maximum(-s * f, 0.0)
            a_up = _shift_in3(a, ax, s)
            trace_up = a_up[0] - (s / 2) * a_up[1 + d]
            b = b.at[0].add(q_in * trace_up)
            b = b.at[1 + d].add(q_in * (s / 2) * trace_up)
            for e in range(3):
                if e != d:
                    b = b.at[1 + e].add(q_in * a_up[1 + e] / 12.0)
    return b


def _dg1_nsweeps(grid, flux):
    sched = upwind_levels(grid.nc, np.asarray(grid.face_cells),
                          np.asarray(flux))
    return sched.nlevels + (30 if sched.max_scc > 1 else 1)


def solve_tof_dg1(grid, flux, source, *, nsweeps=None, limiter=None):
    """Degree-1 discontinuous-Galerkin time-of-flight on a fully-active
    cartesian grid — the TofDiscGalReorder capability
    (/root/reference/opm/core/flowdiagnostics/TofDiscGalReorder.{hpp,cpp}:
    per-cell basis {1, x, y, z}, upstream face fluxes, cell-by-cell solves
    in topological order). The serial reorder becomes wavefront sweeps of
    simultaneous per-cell 4x4 solves, with all face topology as static
    slices.

    With limiter="face"/"average" the min-upwind limiter runs INSIDE
    each sweep — the reference's limiter_usage=DuringComputations
    (TofDiscGalReorder.cpp:300-305: each cell is limited as soon as it
    is solved, so downstream cells see limited upstream traces). The
    post-process usages are served by limiting the converged field
    (dg1_limit_min_upwind, see solve_tof_dg).

    Returns (nc, 4): [mean tof, d-slope per unit cell width x/y/z].
    Exact (single sweep pass) for piecewise-linear TOF fields, e.g.
    uniform flow, where the FV scheme smears.
    """
    shape3, fpad, pv3, M = _dg1_system(grid, flux, source)
    if nsweeps is None:
        nsweeps = _dg1_nsweeps(grid, flux)

    def sweep(_, a):
        """a: (4, nz, ny, nx) coefficients."""
        b = _dg1_upstream_rhs(a, fpad, shape3).at[0].add(pv3)
        out = _solve4x4_t(M.reshape(4, 4, -1),
                          b.reshape(4, -1)).reshape((4,) + shape3)
        if limiter in ("face", "average"):
            flat = jnp.moveaxis(out.reshape(4, -1), 0, -1)
            flat = _dg1_limit_min_upwind(grid, flux, flat, method=limiter)
            out = jnp.moveaxis(flat, -1, 0).reshape((4,) + shape3)
        return out

    a0 = jnp.zeros((4,) + shape3)
    a = jax.lax.fori_loop(0, int(nsweeps), sweep, a0)
    return jnp.moveaxis(a.reshape(4, -1), 0, -1)


def solve_tof_dg1_tracer(grid, flux, source, tracer_heads, *, nsweeps=None,
                         limiter=None):
    """Degree-1 DG tracer partitions — the TofDiscGalReorder tracer
    variant (compute(..., tracerheads, tof_coef, tracer_coef),
    TofDiscGalReorder.cpp:204-247,300-305): the tracer satisfies the same
    upstream DG system as TOF with zero volume source, and tracer-head
    cells carry the constant-1 solution (tracerhead_by_cell_ pinning,
    .cpp:521-524 skips the head-cell solve).

    tracer_heads: list of arrays of cell indices, one per tracer.
    Returns (ntracer, nc, 4) coefficient arrays; column 0 is the
    cell-mean concentration in [0, 1]. With limiter="face"/"average" the
    min-upwind limiter is applied to each tracer field (the reference's
    applyTracerLimiter clamps overshoots the same way it does for TOF)."""
    shape3, fpad, _, M = _dg1_system(grid, flux, source)
    nc = grid.nc
    if nsweeps is None:
        nsweeps = _dg1_nsweeps(grid, flux)

    # Boundedness guard for non-conservative flux fields (a compressible
    # black-oil surface-volume flux has div != src): where a cell's total
    # inflow exceeds its total outflow, absorb the surplus on the
    # diagonal so c <= max upstream c — the DG analogue of the FV
    # tracer's division by total influx (solve_tof_tracer). Exactly zero
    # (bit-identical system) on conservative fields.
    src3 = jnp.asarray(source).reshape(shape3)
    face_in = jnp.zeros(shape3)
    face_out = jnp.zeros(shape3)
    for d in range(3):
        ax = _DG1_AXIS_OF[d]
        fL = _take3(fpad[d], ax, slice(None, -1))
        fR = _take3(fpad[d], ax, slice(1, None))
        for s, f in ((1.0, fR), (-1.0, fL)):
            face_in = face_in + jnp.maximum(-s * f, 0.0)
            face_out = face_out + jnp.maximum(s * f, 0.0)
    deficit = jnp.maximum(face_in + jnp.maximum(src3, 0.0)
                          - face_out - jnp.maximum(-src3, 0.0), 0.0)
    M = M.at[0, 0].add(deficit)
    for d in range(3):
        M = M.at[1 + d, 1 + d].add(deficit / 12.0)

    ntr = len(tracer_heads)
    head = np.zeros((ntr, nc))
    for t, cells in enumerate(tracer_heads):
        head[t, np.asarray(cells)] = 1.0
    hm = jnp.asarray(head).reshape((ntr, 1) + shape3)       # (ntr,1,z,y,x)
    const1 = jnp.zeros((4,) + shape3).at[0].set(1.0)

    def sweep(_, a):
        """a: (ntr, 4, nz, ny, nx) coefficients."""
        def one(at):
            b = _dg1_upstream_rhs(at, fpad, shape3)
            return _solve4x4_t(M.reshape(4, 4, -1),
                               b.reshape(4, -1)).reshape((4,) + shape3)

        a_new = jax.vmap(one)(a)
        return jnp.where(hm > 0, const1[None], a_new)

    a0 = jnp.broadcast_to(const1[None], (ntr, 4) + shape3) * hm
    a = jax.lax.fori_loop(0, int(nsweeps), sweep, a0)
    out = jnp.moveaxis(a.reshape(ntr, 4, -1), 1, -1)        # (ntr, nc, 4)
    if limiter in ("face", "average"):
        out = jnp.stack([dg1_limit_min_upwind(grid, flux, out[t],
                                              method=limiter)
                         for t in range(ntr)])
    return out


# ---------------------------------------------------------------------------
# Degree-2 discontinuous Galerkin TOF
# ---------------------------------------------------------------------------

_DG2_EXPS = np.array([(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                      (2, 0, 0), (0, 2, 0), (0, 0, 2),
                      (1, 1, 0), (1, 0, 1), (0, 1, 1)])
# mean-center the pure quadratics so every non-constant function has zero
# cell average (diagonal-friendly mass matrix)
_DG2_CENTER = np.array([0, 0, 0, 0, 1 / 12, 1 / 12, 1 / 12, 0, 0, 0])
_G3 = 0.5 * np.sqrt(3.0 / 5.0)
_GAUSS_X = np.array([-_G3, 0.0, _G3])            # on [-1/2, 1/2]
_GAUSS_W = np.array([5.0, 8.0, 5.0]) / 18.0


def _dg2_phi(xi):
    """Basis values at points xi (..., 3) -> (..., 10)."""
    xi = np.asarray(xi)
    out = np.ones(xi.shape[:-1] + (10,))
    for k, e in enumerate(_DG2_EXPS):
        v = np.ones(xi.shape[:-1])
        for d in range(3):
            v = v * xi[..., d] ** e[d]
        out[..., k] = v - _DG2_CENTER[k]
    return out


def _dg2_dphi(xi):
    """Basis gradients at xi (..., 3) -> (..., 10, 3)."""
    xi = np.asarray(xi)
    out = np.zeros(xi.shape[:-1] + (10, 3))
    for k, e in enumerate(_DG2_EXPS):
        for d in range(3):
            if e[d] == 0:
                continue
            v = np.full(xi.shape[:-1], float(e[d]))
            for dd in range(3):
                p = e[dd] - (1 if dd == d else 0)
                v = v * xi[..., dd] ** p
            out[..., k, d] = v
    return out


def _dg2_matrices():
    """Constant 10x10 integral matrices over the unit reference cell
    [-1/2,1/2]^3 (uniform cartesian cells => identical for every cell):
      Mass[i,j]      = int phi_i phi_j
      AdvL/R[d][i,j] = int phi_j (1/2 -+/+ xi_d) dphi_i/dxi_d
      Fown[d][s][i,j]= int_{xi_d=s/2} phi_i phi_j            (own trace)
      Tnb[d][s][i,j] = int_{xi_d=s/2} phi_i phi_j^{nb}       (nb at -s/2)
    """
    # 3-D quadrature grid (3-pt Gauss per dim, exact to degree 5)
    pts = np.array(np.meshgrid(_GAUSS_X, _GAUSS_X, _GAUSS_X,
                               indexing="ij")).reshape(3, -1).T
    w = np.einsum("i,j,k->ijk", _GAUSS_W, _GAUSS_W, _GAUSS_W).ravel()
    P = _dg2_phi(pts)                      # (m, 10)
    D = _dg2_dphi(pts)                     # (m, 10, 3)
    mass = np.einsum("m,mi,mj->ij", w, P, P)
    advL, advR = [], []
    for d in range(3):
        wl = w * (0.5 - pts[:, d])
        wr = w * (0.5 + pts[:, d])
        advL.append(np.einsum("m,mj,mi->ij", wl, P, D[:, :, d]))
        advR.append(np.einsum("m,mj,mi->ij", wr, P, D[:, :, d]))
    # 2-D face quadrature
    f2 = np.array(np.meshgrid(_GAUSS_X, _GAUSS_X, indexing="ij"))
    f2 = f2.reshape(2, -1).T               # (9, 2)
    w2 = np.einsum("i,j->ij", _GAUSS_W, _GAUSS_W).ravel()
    fown = [[None, None] for _ in range(3)]
    tnb = [[None, None] for _ in range(3)]
    for d in range(3):
        tr = [e for e in range(3) if e != d]
        for si, s in enumerate((-1.0, 1.0)):
            xi_own = np.zeros((9, 3))
            xi_nb = np.zeros((9, 3))
            xi_own[:, d] = s / 2
            xi_nb[:, d] = -s / 2
            for a, e in enumerate(tr):
                xi_own[:, e] = f2[:, a]
                xi_nb[:, e] = f2[:, a]
            Po = _dg2_phi(xi_own)
            Pn = _dg2_phi(xi_nb)
            fown[d][si] = np.einsum("m,mi,mj->ij", w2, Po, Po)
            tnb[d][si] = np.einsum("m,mi,mj->ij", w2, Po, Pn)
    return mass, advL, advR, fown, tnb


_DG2_CACHE = None


def solve_tof_dg2(grid, flux, source, *, nsweeps=None):
    """Degree-2 discontinuous-Galerkin time-of-flight on a fully-active
    cartesian grid — the order-2 capability of TofDiscGalReorder
    (/root/reference/opm/core/flowdiagnostics/TofDiscGalReorder.hpp:49-190,
    DGBasis.hpp:44-259: bounded-total-degree basis, dim 10 in 3D).

    Design: with the mean-centered monomial basis on uniform cells every
    cell/face integral is a CONSTANT 10x10 matrix scaled by that cell's
    face fluxes, so assembly is 10 scalar-field x constant-matrix
    products; the serial reordered cell loop becomes wavefront sweeps of
    batched dense 10x10 solves (solver/newton.dense_solve: f64 on CPU,
    equilibrated f32 + refinement on TPU). In-cell velocity varies
    linearly per direction between the two face fluxes (the reference's
    velocity interpolation).

    Returns (nc, 10) coefficients over the basis
    {1, x, y, z, x^2-1/12, y^2-1/12, z^2-1/12, xy, xz, yz} in cell-width
    units; column 0 is the cell-mean TOF.
    """
    global _DG2_CACHE
    if _DG2_CACHE is None:
        _DG2_CACHE = _dg2_matrices()
    mass, advL, advR, fown, tnb = _DG2_CACHE

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
    axis_of = {0: 2, 1: 1, 2: 0}
    fpad = []
    for d in range(3):
        ax = axis_of[d]
        pads = [(0, 0)] * 3
        pads[ax] = (1, 1)
        fpad.append(jnp.pad(f3[d], pads))
    pv = jnp.asarray(grid.pore_volume)
    q_prod = jnp.maximum(-jnp.asarray(source), 0.0)

    def take(a, ax, sl):
        idx = [slice(None)] * 3
        idx[ax] = sl
        return a[tuple(idx)].reshape(-1)

    # per-cell face fluxes fL[d], fR[d] (flattened)
    fL, fR = [], []
    for d in range(3):
        ax = axis_of[d]
        fL.append(take(fpad[d], ax, slice(None, -1)))
        fR.append(take(fpad[d], ax, slice(1, None)))

    J = jnp.asarray
    M = q_prod[:, None, None] * J(mass)[None]
    for d in range(3):
        M = M - (fL[d][:, None, None] * J(advL[d])[None]
                 + fR[d][:, None, None] * J(advR[d])[None])
        q_out_R = jnp.maximum(fR[d], 0.0)
        q_out_L = jnp.maximum(-fL[d], 0.0)
        M = M + q_out_R[:, None, None] * J(fown[d][1])[None]
        M = M + q_out_L[:, None, None] * J(fown[d][0])[None]
    # stagnant-cell regularization: unit diagonal where the row is empty
    diag = jnp.einsum("nii->ni", M)
    M = M + jnp.where(jnp.abs(diag) < 1e-300, 1.0,
                      0.0)[:, :, None] * jnp.eye(10)[None]

    if nsweeps is None:
        sched = upwind_levels(nc, np.asarray(grid.face_cells),
                              np.asarray(flux))
        nsweeps = sched.nlevels + (30 if sched.max_scc > 1 else 1)

    def shift_nb(a3, ax, s):
        """Coefficients of the neighbor on side s (s=-1: the -d neighbor)."""
        pads = [(0, 0)] * 4
        pads[ax] = (1, 0) if s < 0 else (0, 1)
        ap = jnp.pad(a3, pads)
        idx = [slice(None)] * 4
        idx[ax] = slice(None, -1) if s < 0 else slice(1, None)
        return ap[tuple(idx)]

    import jax as _jax
    from opm_tpu.solver.newton import dense_solve
    dtype = jnp.float32 if _jax.default_backend() == "tpu" else None

    def sweep(_, a):
        a3 = a.reshape(shape3 + (10,))
        b = jnp.zeros((nc, 10)).at[:, 0].set(pv)
        for d in range(3):
            ax = axis_of[d]
            for si, s in ((0, -1.0), (1, 1.0)):
                a_nb = shift_nb(a3, ax, int(s)).reshape(nc, 10)
                f = fR[d] if s > 0 else fL[d]
                q_in = jnp.maximum(-s * f, 0.0)
                b = b + q_in[:, None] * jnp.einsum(
                    "ij,nj->ni", J(tnb[d][si]), a_nb)
        return _jax.vmap(lambda Mi, bi: dense_solve(Mi, bi, dtype=dtype))(
            M, b)

    a = jax.lax.fori_loop(0, int(nsweeps), sweep, jnp.zeros((nc, 10)))
    return a


_LIMITER_JIT_CACHE = {}


def dg1_limit_min_upwind(grid, flux, a, *, method="face", threshold=1e-3):
    """Jit-dispatching wrapper for `_dg1_limit_min_upwind` (this box's
    XLA:CPU eager op path corrupts the heap on the shift/pad pattern;
    under jit it is also simply faster)."""
    key = (id(grid), method, float(threshold))
    fn = _LIMITER_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda aa, ff: _dg1_limit_min_upwind(
            grid, ff, aa, method=method, threshold=threshold))
        _LIMITER_JIT_CACHE[key] = fn
    return fn(jnp.asarray(a), jnp.asarray(flux))


def _dg1_limit_min_upwind(grid, flux, a, *, method="face", threshold=1e-3):
    """Min-upwind slope limiter for the DG(1) TOF field
    (TofDiscGalReorder::applyMinUpwindLimiter, /root/reference/opm/core/
    flowdiagnostics/TofDiscGalReorder.cpp:594-678; post-process usage
    :560-590). For each cell, the TOF anywhere inside the cell is forced
    to be at least M = the minimum upstream-face corner value ('face',
    MinUpwindFace) or the minimum upstream cell average ('average',
    MinUpwindAverage), by scaling the cell's slopes with
    lambda = (mean - M) / (mean - min_corner); a mean below M flattens and
    shifts the cell. Upstream faces carrying less than `threshold` of the
    cell's total outflux are ignored. Vectorized over all cells via the
    same padded-flux layout as solve_tof_dg1.

    a: (nc, 4) DG(1) coefficients; returns the limited copy."""
    nx, ny, nz = grid.dims
    assert getattr(grid, "structured", False)
    nc = grid.nc
    shape3 = (nz, ny, nx)
    nfx = (nx - 1) * ny * nz
    nfy = nx * (ny - 1) * nz
    flux = jnp.asarray(flux)
    f3 = [flux[:nfx].reshape(nz, ny, max(nx - 1, 0)),
          flux[nfx:nfx + nfy].reshape(nz, max(ny - 1, 0), nx),
          flux[nfx + nfy:].reshape(max(nz - 1, 0), ny, nx)]
    axis_of = {0: 2, 1: 1, 2: 0}
    fpad = []
    for d in range(3):
        ax = axis_of[d]
        pads = [(0, 0)] * 3
        pads[ax] = (1, 1)
        fpad.append(jnp.pad(f3[d], pads))

    a = jnp.asarray(a)
    a3 = a.reshape(shape3 + (4,))
    mean = a3[..., 0]

    def take(arr, ax, sl):
        idx = [slice(None)] * 3
        idx[ax] = sl
        return arr[tuple(idx)]

    def corner_min(coefs, d, s):
        """Min over the 4 corners of the face at side s (+-1) along d."""
        out = coefs[..., 0] + (s / 2.0) * coefs[..., 1 + d]
        for e in range(3):
            if e != d:
                out = out - 0.5 * jnp.abs(coefs[..., 1 + e])
        return out

    def shift_nb(arr, ax, s):
        pads = [(0, 0)] * arr.ndim
        pads[ax] = (1, 0) if s < 0 else (0, 1)
        ap = jnp.pad(arr, pads)
        idx = [slice(None)] * arr.ndim
        idx[ax] = slice(None, -1) if s < 0 else slice(1, None)
        return ap[tuple(idx)]

    big = jnp.asarray(1e100)
    min_here = jnp.full(shape3, big)
    min_up = jnp.full(shape3, big)
    n_up = jnp.zeros(shape3)
    # total outflux per cell for the relative threshold
    tot_out = jnp.zeros(shape3)
    for d in range(3):
        ax = axis_of[d]
        fL = take(fpad[d], ax, slice(None, -1))
        fR = take(fpad[d], ax, slice(1, None))
        tot_out = tot_out + jnp.maximum(fR, 0.0) + jnp.maximum(-fL, 0.0)
    for d in range(3):
        ax = axis_of[d]
        fL = take(fpad[d], ax, slice(None, -1))
        fR = take(fpad[d], ax, slice(1, None))
        for s, f in ((-1.0, fL), (1.0, fR)):
            outward = s * f
            min_here = jnp.minimum(min_here, corner_min(a3, d, s))
            upstream = -outward > tot_out * threshold
            nb = shift_nb(a3, ax, int(s))
            if method == "face":
                up_val = corner_min(nb, d, -s)
            else:
                up_val = nb[..., 0]
            min_up = jnp.where(upstream, jnp.minimum(min_up, up_val),
                               min_up)
            n_up = n_up + jnp.where(upstream, 1.0, 0.0)
    no_up = n_up == 0
    min_up = jnp.where(no_up, 0.0, jnp.maximum(min_up, 0.0))
    min_here = jnp.where(no_up, 0.0, min_here)

    denom = mean - min_here
    lam = jnp.where(jnp.abs(denom) > 1e-300,
                    (mean - min_up) / denom, 1.0)
    flat = mean < min_up
    lam = jnp.clip(jnp.where(flat, 0.0, lam), 0.0, 1.0)
    out = a3.at[..., 1:].multiply(lam[..., None])
    out = out.at[..., 0].add(jnp.where(flat, min_up - mean, 0.0))
    return out.reshape(nc, 4)


def solve_tof_dg(grid, flux, source, *, degree=1, limiter=None,
                 limiter_usage="post", nsweeps=None, face_cells=None,
                 tracer_heads=None):
    """Unified TofDiscGalReorder entry: DG time-of-flight at the given
    polynomial degree (the reference's degree parameter,
    TofDiscGalReorder.hpp:62-78 'Degree of polynomial used', supported
    0-2; limiterMethod MinUpwindFace/MinUpwindAverage applies to
    degree >= 1, here for degree 1).

    limiter_usage mirrors the reference's LimiterUsage choice
    (TofDiscGalReorder.hpp:129-133): "during" (DuringComputations —
    limit inside each wavefront sweep so downstream cells consume
    limited upstream traces), "post" (AsPostProcess — limit the
    converged TOF field only) or "simultaneous"
    (AsSimultaneousPostProcess — post-limit TOF and tracer together).

    degree 0 reduces to the FV scheme (a constant per cell IS the
    degree-0 DG solution with upstream face values) and is served by
    solve_tof for exact consistency. Returns (nc, ndof) coefficients,
    ndof = 1 / 4 / 10; column 0 is the cell-mean TOF.

    With tracer_heads (list of per-tracer cell-index arrays) the tracer
    variant is solved alongside TOF — the reference's
    compute(darcyflux, porevolume, source, tracerheads, tof, tracer)
    overload (TofDiscGalReorder.hpp:96-115) — and the return is
    (tof_coefs, tracer_coefs (ntracer, nc, ndof)); supported for
    degrees 0 and 1 (degree-2 tracer falls back to the degree-1 basis,
    still conservative and bounded)."""
    if degree == 0:
        if face_cells is None:
            face_cells = grid.face_cells
        if tracer_heads is not None:
            tof, conc = solve_tof_tracer(face_cells, flux,
                                         grid.pore_volume, source,
                                         tracer_heads, nsweeps=nsweeps)
            return jnp.asarray(tof)[:, None], jnp.asarray(conc)[:, :, None]
        tof = solve_tof(face_cells, flux, grid.pore_volume, source,
                        nsweeps=nsweeps)
        return jnp.asarray(tof)[:, None]
    if degree == 1:
        during = limiter if limiter_usage == "during" else None
        a = solve_tof_dg1(grid, flux, source, nsweeps=nsweeps,
                          limiter=during)
        if limiter in ("face", "average") and limiter_usage != "during":
            a = dg1_limit_min_upwind(grid, flux, a, method=limiter)
        if tracer_heads is not None:
            tr_lim = (limiter if limiter_usage in ("during",
                                                   "simultaneous")
                      else None)
            tr = solve_tof_dg1_tracer(grid, flux, source, tracer_heads,
                                      nsweeps=nsweeps, limiter=tr_lim)
            return a, tr
        return a
    if degree == 2:
        a = solve_tof_dg2(grid, flux, source, nsweeps=nsweeps)
        if tracer_heads is not None:
            tr = solve_tof_dg1_tracer(grid, flux, source, tracer_heads,
                                      nsweeps=nsweeps, limiter=limiter)
            return a, tr
        return a
    raise ValueError(f"DG degree {degree} not supported (0-2, like "
                     "TofDiscGalReorder)")
