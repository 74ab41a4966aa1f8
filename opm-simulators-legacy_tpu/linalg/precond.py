"""Preconditioners for the block system: block-Jacobi and two-stage CPR.

Re-designs the reference's solver stack for TPU:
  * NewtonIterationBlackoilInterleaved's BCRS + ParallelOverlappingILU0
    (/root/reference/opm/autodiff/NewtonIterationBlackoilInterleaved.cpp,
    ISTLSolver.hpp:195-235) -> batched block-Jacobi (3x3 / 4x4 closed-form
    inverses). ILU's sequential triangular solves don't map to the MXU/VPU;
    block-Jacobi + a strong CPR pressure stage recovers the iteration counts.
  * NewtonIterationBlackoilCPR's two-stage preconditioner
    (NewtonIterationBlackoilCPR.cpp:80-185, formEllipticSystem in
    NewtonIterationUtilities.cpp:197-287) -> quasi-IMPES weighted pressure
    system solved with one aggregation-AMG V-cycle (linalg/amg.py), followed
    by block-Jacobi smoothing of the full system.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opm_tpu.models import linearize


def inv3x3(m):
    """Batched closed-form 3x3 inverse (f64-safe on TPU: no LU needed)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], axis=-1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def inv4x4(m):
    """Batched 4x4 inverse via 2x2 block elimination with 2x2 closed forms
    (avoids LU; partition [[A,B],[C,D]] with Schur complement).

    The incoming well blocks are equilibrated (max-abs row then column
    scaling) and Tikhonov-regularized in the equilibrated metric before
    inversion. Rationale: a well under strong crossflow circulation at a
    tiny rate target (SPE9's day-300 ORAT=100 cut) has its three flux
    rows nearly parallel — d(cq)/dq ~ flux/q_t >> 1 swamps the identity —
    so the raw block is rank-deficient and the bare 2x2-floor
    pseudo-inverse comes out at ~1e27, poisoning the Schur-reduced
    operator (BiCGStab/GMRES then DIVERGE in true residual while the
    recurrence falsely converges). Equilibration makes every entry O(1)
    (separating genuine rank deficiency from bhp-in-Pa column scaling);
    lam then gives degenerate blocks a consistent bounded pseudo-inverse
    (measured on the pathological state: BiCGStab 2 iterations, TRUE
    residual 3.4e-3 for lam anywhere in 1e-6..1e-12; unregularized:
    stall/divergence; 1e-12 is too weak — the degenerate wells' recover
    step still amplifies ~1e15 and the Newton state blows up). lam's
    error on a HEALTHY inverse unscales by the smallest column scale
    (bhp: ~1e-7 of the block max), so lam = 1e-10 keeps healthy bhp
    sensitivities exact to ~1e-3 relative — invisible next to the 1e-2
    linear reduction target."""
    r = jnp.maximum(jnp.max(jnp.abs(m), axis=-1, keepdims=True), 1e-300)
    m = m / r
    c = jnp.maximum(jnp.max(jnp.abs(m), axis=-2, keepdims=True), 1e-300)
    m = m / c + 1e-10 * jnp.eye(4, dtype=m.dtype)
    A = m[..., :2, :2]
    B = m[..., :2, 2:]
    C = m[..., 2:, :2]
    D = m[..., 2:, 2:]

    def inv2(x):
        a, b = x[..., 0, 0], x[..., 0, 1]
        c, d = x[..., 1, 0], x[..., 1, 1]
        det = a * d - b * c
        # regularize RELATIVE to the block scale: a (near-)singular block
        # (e.g. a dead well's control row) gets a bounded pseudo-inverse
        # instead of a ~1/eps garbage amplifier that wrecks the Krylov
        # space for every other dof
        scale = jnp.maximum(jnp.abs(a * d), jnp.abs(b * c))
        floor = jnp.maximum(1e-10 * scale, 1e-300)
        det = jnp.where(jnp.abs(det) >= floor,
                        det, jnp.where(det < 0, -floor, floor))
        return jnp.stack([
            jnp.stack([d, -b], axis=-1),
            jnp.stack([-c, a], axis=-1)], axis=-2) / det[..., None, None]

    Ai = inv2(A)
    S = D - C @ Ai @ B          # Schur complement
    Si = inv2(S)
    TL = Ai + Ai @ B @ Si @ C @ Ai
    TR = -Ai @ B @ Si
    BL = -Si @ C @ Ai
    BR = Si
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, BR], axis=-1)
    inv = jnp.concatenate([top, bot], axis=-2)
    # undo the equilibration: m_orig = diag(r) @ m @ diag(c)
    # -> inv(m_orig) = diag(1/c) @ inv @ diag(1/r)
    return inv / jnp.swapaxes(c, -1, -2) / jnp.swapaxes(r, -1, -2)


def _rows9(m):
    """Normalize a 3x3 block family to the flat 9-row form: pass a 9-tuple
    through, unstack a legacy (3, 3, n) array."""
    if isinstance(m, (tuple, list)):
        return m
    return tuple(m[i, j] for i in range(3) for j in range(3))


def inv3x3_rows(m):
    """Closed-form inverse of a 3x3 block family (9-tuple of flat arrays,
    or a legacy (3, 3, n) stack), returned as a FLAT TUPLE of nine (n,)
    arrays (row-major).

    Why not a stacked (3, 3, n) array: every consumer immediately slices
    the nine planes back out (`dinv[i, j] * v[j]`), and on TPU that
    stack+reslice materializes as a kLoop relayout fusion between the
    T(4,128)-tiled 3-D stack and flat T(1024) vectors — measured 6.4
    ms/Newton at SPE10-132k, the single fattest op in the fused substep
    trace. A tuple of flat vectors keeps the whole inverse+apply chain
    elementwise and fusable."""
    a, b, c, d, e, f, g, h, i = _rows9(m)
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
    inv_det = 1.0 / det
    return (A * inv_det, -(b * i - c * h) * inv_det,
            (b * f - c * e) * inv_det,
            B * inv_det, (a * i - c * g) * inv_det,
            -(a * f - c * d) * inv_det,
            C * inv_det, -(a * h - b * g) * inv_det,
            (a * e - b * d) * inv_det)


def bapply_rows(rows9, v):
    """Nine-flat-rows block product: rows9 (tuple of 9 (n,) arrays,
    row-major (3,3)) applied to v (3, n) -> (3, n). All elementwise —
    no tiled-stack slicing (see inv3x3_rows)."""
    return jnp.stack([
        rows9[0] * v[0] + rows9[1] * v[1] + rows9[2] * v[2],
        rows9[3] * v[0] + rows9[4] * v[1] + rows9[5] * v[2],
        rows9[6] * v[0] + rows9[7] * v[1] + rows9[8] * v[2]])


def inv3x3_t(m):
    """Closed-form inverse for (3, 3, n)-layout blocks -> (3, 3, n).
    Prefer inv3x3_rows on hot paths (stack-free)."""
    return jnp.stack(inv3x3_rows(m)).reshape(3, 3, -1)


def block_jacobi(sys: linearize.BlockSystem, dtype=None):
    """v -> (Dinv_cell r_cell, Dinv_well r_well). The inverses are formed
    at the incoming precision (f64 on the hot path — the det guards
    underflow in f32) and optionally stored/applied at `dtype`."""
    dinv = inv3x3_rows(sys.diag)
    winv = inv4x4(sys.wd_diag)
    if dtype is not None:
        dinv = tuple(r.astype(dtype) for r in dinv)
        winv = winv.astype(dtype)

    def apply(v):
        rc, rw = v          # rc: (3, nc)
        return (bapply_rows(dinv, rc),
                jnp.einsum("nij,nj->ni", winv, rw))

    return apply


def quasi_impes_weights(diag_t):
    """Per-cell weights (3, nc) with w^T D = e_p^T: decouple local
    saturation derivatives from the pressure equation (the CPR weighting;
    plays the role of formEllipticSystem's row combinations).
    w = (D^T)^{-1} e_p = row 0 of D^{-1} — computed DIRECTLY from the
    first-row cofactors (no full inverse, no (3,3,n) stack)."""
    a, b, c, d, e, f, g, h, i = _rows9(diag_t)
    A = e * i - f * h
    det = a * A + b * -(d * i - f * g) + c * (d * h - e * g)
    det = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
    return jnp.stack([A, -(b * i - c * h), (b * f - c * e)]) / det


def cpr_weights(sys: linearize.BlockSystem):
    """CPR decoupling weights, selectable via OPM_TPU_CPR_WEIGHTS:
    'quasiimpes' (default; diagonal block only) or 'trueimpes' (block
    COLUMN sums — each cell's variables as seen by ALL equations, the
    classic true-IMPES weighting that decouples better on strong
    coupling)."""
    import os as _os

    mode = _os.environ.get("OPM_TPU_CPR_WEIGHTS", "quasiimpes")
    if mode != "trueimpes":
        return quasi_impes_weights(sys.diag)
    c1 = sys.face_cells[:, 0]
    c2 = sys.face_cells[:, 1]
    # row c2 holds -face_L in column c1; row c1 holds +face_R in column c2
    colsum = tuple(
        d.at[c1].add(-fl).at[c2].add(fr)
        for d, fl, fr in zip(sys.diag, sys.face_L, sys.face_R))
    return quasi_impes_weights(colsum)


def cpr_pressure_system(sys: linearize.BlockSystem, w, dims=None):
    """Weighted pressure matrix entries: diag (nc,), off values aligned with
    the AMG level-0 directed entry list [rows=c1|c2, cols=c2|c1].

    dims: static (nx, ny, nz) of a fully-active cartesian grid — the
    per-face weight gathers w[i][c1] / w[i][c2] then become shifted
    static slices. This matters: a scalar-indexed f32 gather of nf
    (~3*nc) elements serializes on the TPU gather unit (measured 28 ms
    per gather at SPE10-132k, ~130 ms/Newton across the six of them);
    the slice form is bandwidth-speed. Extra (embedded-grid) faces past
    the canonical stencil keep the small gather path."""
    # w: (3, nc); the pressure column of block row i is flat row 3*i
    pR = (sys.face_R[0], sys.face_R[3], sys.face_R[6])
    pL = (sys.face_L[0], sys.face_L[3], sys.face_L[6])
    diag_p = (w[0] * sys.diag[0] + w[1] * sys.diag[3]
              + w[2] * sys.diag[6])
    nf = pR[0].shape[0]
    if dims is not None:
        nx, ny, nz = dims
        segs = [((slice(None), slice(None), slice(None, -1)),
                 (slice(None), slice(None), slice(1, None)),
                 (nx - 1) * ny * nz),
                ((slice(None), slice(None, -1)), (slice(None),
                                                  slice(1, None)),
                 nx * (ny - 1) * nz),
                ((slice(None, -1),), (slice(1, None),),
                 nx * ny * (nz - 1))]
        w3 = [wi.reshape(nz, ny, nx) for wi in (w[0], w[1], w[2])]
        aLR_parts, aRL_parts = [], []
        ofs = 0
        for slL, slR, nf_d in segs:
            aLR = sum(w3[i][slL].reshape(-1) * pR[i][ofs:ofs + nf_d]
                      for i in range(3))
            aRL = -sum(w3[i][slR].reshape(-1) * pL[i][ofs:ofs + nf_d]
                       for i in range(3))
            aLR_parts.append(aLR)
            aRL_parts.append(aRL)
            ofs += nf_d
        if nf > ofs:        # extra faces: small gather-path correction
            e1 = sys.face_cells[ofs:, 0]
            e2 = sys.face_cells[ofs:, 1]
            aLR_parts.append(sum(w[i][e1] * pR[i][ofs:]
                                 for i in range(3)))
            aRL_parts.append(-sum(w[i][e2] * pL[i][ofs:]
                                  for i in range(3)))
        a_LR = jnp.concatenate(aLR_parts)
        a_RL = jnp.concatenate(aRL_parts)
    else:
        c1 = sys.face_cells[:, 0]
        c2 = sys.face_cells[:, 1]
        wst = jnp.stack([w[0], w[1], w[2]])
        fRp = jnp.stack(pR)
        fLp = jnp.stack(pL)
        a_LR = jnp.sum(wst[:, c1] * fRp, axis=0)
        a_RL = -jnp.sum(wst[:, c2] * fLp, axis=0)
    off = jnp.concatenate([a_LR, a_RL])
    return diag_p, off


def _pressure_off_for(amg, off_p, dims):
    """Structured GMG consumes only the canonical stencil faces; extra
    faces of an embedded grid (stair-step faults / NNCs) are dropped from
    the pressure hierarchy — a preconditioner-quality approximation only
    (the Krylov operator keeps them)."""
    if dims is None or not getattr(amg, "wants_canonical_faces", False):
        return off_p
    nx, ny, nz = dims
    nfc = (nx - 1) * ny * nz + nx * (ny - 1) * nz + nx * ny * (nz - 1)
    nf_all = off_p.shape[0] // 2
    if nf_all == nfc:
        return off_p
    return jnp.concatenate([off_p[:nfc], off_p[nf_all:nf_all + nfc]])


def _is_accel():
    import jax as _jax

    try:
        return _jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _smooth_cycles_knobs(smoother_steps):
    """Resolve OPM_TPU_CPR_SMOOTH / OPM_TPU_GMG_CYCLES with per-backend
    'auto' defaults. Measured on v5e SPE10-132k (lin_ab, mp-Krylov): a
    2-cycle pressure stage with ONE stage-2 smooth beats the old
    1-cycle/2-smooth default 181->100 ms (hard t=0 state) and 42->32 ms
    (production-like state); CPU keeps 1 cycle / 2 smooths (f64 V-cycles
    are relatively expensive there and the old default measured best)."""
    import os as _os

    accel = _is_accel()
    if smoother_steps is None:
        v = _os.environ.get("OPM_TPU_CPR_SMOOTH", "auto")
        smoother_steps = (1 if accel else 2) if v == "auto" else int(v)
    cv = _os.environ.get("OPM_TPU_GMG_CYCLES", "auto")
    cycles = (2 if accel else 1) if cv == "auto" else int(cv)
    return smoother_steps, cycles


def _f32_knob():
    """OPM_TPU_CPR_F32=1: run the WHOLE preconditioner apply (pressure
    V-cycle + block smoothing) in float32. The preconditioner only shapes
    the Krylov space — the f64 operator/residual still define convergence —
    so this trades (at most) a few extra BiCGStab iterations for ~2x
    arithmetic and bandwidth on TPU, where f64 is software-emulated.
    Default off; flipped per-backend after on-device A/B (see bench)."""
    import os as _os

    v = _os.environ.get("OPM_TPU_CPR_F32", "auto")
    if v == "auto":
        import jax as _jax

        try:
            return _jax.devices()[0].platform not in ("cpu",)
        except Exception:
            return False
    return v == "1"


def _cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def make_cpr_cells(sys: linearize.BlockSystem, amg, *, smoother_steps=None,
                   dims=None):
    """CPR preconditioner for the WELL-ELIMINATED (cells-only) system:
    quasi-IMPES pressure V-cycle + block-Jacobi smoothing on the cell
    diagonal (the Schur correction is left to the Krylov operator).
    Tuning env knobs (profiling levers): OPM_TPU_CPR_SMOOTH (stage-2
    steps) and OPM_TPU_GMG_CYCLES (pressure V-cycles per apply) — both
    'auto': accelerators get 1 smooth / 2 cycles, CPU 2 smooths / 1 cycle
    (v5e lin_ab A/B, see _smooth_cycles_knobs); OPM_TPU_GMG_PRE /
    OPM_TPU_GMG_POST (V-cycle smoothing, default 1/1)."""
    import os as _os

    smoother_steps, cycles = _smooth_cycles_knobs(smoother_steps)
    pre = int(_os.environ.get("OPM_TPU_GMG_PRE", "1"))
    post = int(_os.environ.get("OPM_TPU_GMG_POST", "1"))
    # stage-2 smoother: 'jacobi' (default) or 'rbgs' (red-black block
    # Gauss-Seidel — the TPU-native stand-in for the reference's ILU0
    # smoothing: two masked half-sweeps on the checkerboard coloring,
    # all stencil arithmetic, no triangular solves)
    smoother = _os.environ.get("OPM_TPU_CPR_SMOOTHER", "jacobi")
    f32 = _f32_knob()
    w = cpr_weights(sys)
    diag_p, off_p = cpr_pressure_system(sys, w, dims=dims)
    vals = amg.coarsen_values(diag_p, _pressure_off_for(amg, off_p, dims))
    dinv = inv3x3_rows(sys.diag)
    if f32:
        # weights/hierarchy/inverses built in f64 (Galerkin sums and block
        # inverses are cancellation-prone), then stored and applied in f32
        w = w.astype(jnp.float32)
        vals = _cast_tree(vals, jnp.float32)
        dinv = tuple(r.astype(jnp.float32) for r in dinv)
        sys = _cast_tree(sys, jnp.float32)
    zero_w = jnp.zeros((sys.nw, 4), sys.op_dtype)
    red = None
    if smoother == "rbgs" and dims is not None:
        import numpy as _np

        nx, ny, nz = dims
        ii = _np.arange(nx * ny * nz)
        i = ii % nx
        j = (ii // nx) % ny
        k = ii // (nx * ny)
        red = jnp.asarray(((i + j + k) % 2 == 0).astype(_np.float64))

    def vcyc(rp):
        try:
            return amg.vcycle(vals, rp, pre=pre, post=post, cycles=cycles)
        except TypeError:   # preconditioners without pre/post/cycle knobs
            return amg.vcycle(vals, rp)

    if red is not None and f32:
        red = red.astype(jnp.float32)

    def apply(rc):
        out_dtype = rc.dtype
        rc = rc.astype(sys.op_dtype)
        rp = jnp.sum(w * rc, axis=0)
        dp = vcyc(rp)
        xc = jnp.zeros_like(rc).at[0].set(dp)
        for _ in range(smoother_steps):
            if red is not None:
                ac, _ = linearize.matvec(sys, xc, zero_w, dims=dims)
                xc = xc + red[None, :] * bapply_rows(dinv, rc - ac)
                ac, _ = linearize.matvec(sys, xc, zero_w, dims=dims)
                xc = xc + (1.0 - red)[None, :] * bapply_rows(
                    dinv, rc - ac)
            else:
                ac, _ = linearize.matvec(sys, xc, zero_w, dims=dims)
                xc = xc + bapply_rows(dinv, rc - ac)
        return xc.astype(out_dtype)

    return apply


def make_cpr(sys: linearize.BlockSystem, amg, *, smoother_steps=None,
             dims=None):
    """Two-stage CPR preconditioner closure.

    stage 1: restrict residual with quasi-IMPES weights, one multigrid
             V-cycle on the pressure system (aggregation AMG or, with
             static `dims` on a fully-active cartesian grid, the gather-free
             structured GMG of linalg/gmg.py), prolong into pressure slots;
    stage 2: block-Jacobi smoothing of the full (cells+wells) system on the
             corrected residual.

    Same OPM_TPU_CPR_SMOOTH / OPM_TPU_GMG_PRE / OPM_TPU_GMG_POST knobs as
    make_cpr_cells.
    """
    import os as _os

    smoother_steps, cycles = _smooth_cycles_knobs(smoother_steps)
    pre = int(_os.environ.get("OPM_TPU_GMG_PRE", "1"))
    post = int(_os.environ.get("OPM_TPU_GMG_POST", "1"))
    f32 = _f32_knob()
    w = cpr_weights(sys)
    diag_p, off_p = cpr_pressure_system(sys, w, dims=dims)
    vals = amg.coarsen_values(diag_p, _pressure_off_for(amg, off_p, dims))
    bj = block_jacobi(sys, dtype=jnp.float32 if f32 else None)
    if f32:
        w = w.astype(jnp.float32)
        vals = _cast_tree(vals, jnp.float32)
        sys = _cast_tree(sys, jnp.float32)

    def vcyc(rp):
        try:
            return amg.vcycle(vals, rp, pre=pre, post=post, cycles=cycles)
        except TypeError:
            return amg.vcycle(vals, rp)

    def apply(v):
        rc, rw = v          # rc: (3, nc)
        out_dtype = rc.dtype
        rc = rc.astype(sys.op_dtype)
        rw = rw.astype(sys.op_dtype)
        # stage 1: pressure correction
        rp = jnp.sum(w * rc, axis=0)
        dp = vcyc(rp)
        xc = jnp.zeros_like(rc).at[0].set(dp)
        xw = jnp.zeros_like(rw)
        # stage 2: block-Jacobi on the updated residual
        for _ in range(smoother_steps):
            ac, aw = linearize.matvec(sys, xc, xw, dims=dims)
            sc, sw_ = bj((rc - ac, rw - aw))
            xc = xc + sc
            xw = xw + sw_
        return (xc.astype(out_dtype), xw.astype(out_dtype))

    return apply
