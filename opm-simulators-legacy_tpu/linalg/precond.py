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


def inv3x3_t(m):
    """Closed-form inverse for (3, 3, n)-layout blocks -> (3, 3, n)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) > 1e-300, det, 1.0)
    rows = [[A, -(b * i - c * h), (b * f - c * e)],
            [B, (a * i - c * g), -(a * f - c * d)],
            [C, -(a * h - b * g), (a * e - b * d)]]
    return jnp.stack([jnp.stack([rows[i_][j_] / det for j_ in range(3)])
                      for i_ in range(3)])


def block_jacobi(sys: linearize.BlockSystem, dtype=None):
    """v -> (Dinv_cell r_cell, Dinv_well r_well). The inverses are formed
    at the incoming precision (f64 on the hot path — the det guards
    underflow in f32) and optionally stored/applied at `dtype`."""
    dinv = inv3x3_t(sys.diag)
    winv = inv4x4(sys.wd_diag)
    if dtype is not None:
        dinv = dinv.astype(dtype)
        winv = winv.astype(dtype)

    def apply(v):
        rc, rw = v          # rc: (3, nc)
        return (linearize._bapply(dinv, rc),
                jnp.einsum("nij,nj->ni", winv, rw))

    return apply


def quasi_impes_weights(diag_t):
    """Per-cell weights (3, nc) with w^T D = e_p^T: decouple local
    saturation derivatives from the pressure equation (the CPR weighting;
    plays the role of formEllipticSystem's row combinations).
    w = (D^T)^{-1} e_p = row 0 of D^{-1}."""
    dinv = inv3x3_t(diag_t)
    return dinv[0]  # (3, nc): w_j = (D^{-1})_{0j}


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
    colsum = sys.diag
    # row c2 holds -face_L in column c1; row c1 holds +face_R in column c2
    colsum = colsum.at[:, :, c1].add(-sys.face_L)
    colsum = colsum.at[:, :, c2].add(sys.face_R)
    return quasi_impes_weights(colsum)


def cpr_pressure_system(sys: linearize.BlockSystem, w):
    """Weighted pressure matrix entries: diag (nc,), off values aligned with
    the AMG level-0 directed entry list [rows=c1|c2, cols=c2|c1]."""
    c1 = sys.face_cells[:, 0]
    c2 = sys.face_cells[:, 1]
    # w: (3, nc); pressure columns are [:, 0, :] in the (eq, var, n) layout
    diag_p = jnp.sum(w * sys.diag[:, 0, :], axis=0)
    a_LR = jnp.sum(w[:, c1] * sys.face_R[:, 0, :], axis=0)
    a_RL = -jnp.sum(w[:, c2] * sys.face_L[:, 0, :], axis=0)
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
    diag_p, off_p = cpr_pressure_system(sys, w)
    vals = amg.coarsen_values(diag_p, _pressure_off_for(amg, off_p, dims))
    dinv = inv3x3_t(sys.diag)
    if f32:
        # weights/hierarchy/inverses built in f64 (Galerkin sums and block
        # inverses are cancellation-prone), then stored and applied in f32
        w = w.astype(jnp.float32)
        vals = _cast_tree(vals, jnp.float32)
        dinv = dinv.astype(jnp.float32)
        sys = _cast_tree(sys, jnp.float32)
    zero_w = jnp.zeros((sys.nw, 4), sys.diag.dtype)
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
        rc = rc.astype(sys.diag.dtype)
        rp = jnp.sum(w * rc, axis=0)
        dp = vcyc(rp)
        xc = jnp.zeros_like(rc).at[0].set(dp)
        for _ in range(smoother_steps):
            if red is not None:
                ac, _ = linearize.matvec(sys, xc, zero_w, dims=dims)
                xc = xc + red[None, :] * linearize._bapply(dinv, rc - ac)
                ac, _ = linearize.matvec(sys, xc, zero_w, dims=dims)
                xc = xc + (1.0 - red)[None, :] * linearize._bapply(
                    dinv, rc - ac)
            else:
                ac, _ = linearize.matvec(sys, xc, zero_w, dims=dims)
                xc = xc + linearize._bapply(dinv, rc - ac)
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
    diag_p, off_p = cpr_pressure_system(sys, w)
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
        rc = rc.astype(sys.diag.dtype)
        rw = rw.astype(sys.diag.dtype)
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
