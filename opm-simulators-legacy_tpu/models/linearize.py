"""Exact block-sparse Jacobian assembly from local functions.

The TPU-native replacement for the reference's AutoDiffBlock sparse-Jacobian
machinery (/root/reference/opm/autodiff/AutoDiffBlock.hpp,
AutoDiffMatrix.hpp, fastSparseOperations.hpp): instead of carrying sparse
Jacobians through every expression, the residual's fixed TPFA stencil is
exploited directly — the Jacobian is exactly

    J = blockdiag(acc + own-flux + own-perf terms)                (nc,3,3)
      + per-face off-diagonal pairs (L,R)/(R,L)                   (nf,3,3)x2
      + well coupling blocks (cell rows x well vars, well rows x cell vars)
      + well diagonal                                             (nw,4,4)

Each block family comes from a vmapped jax.jacfwd of a *local* function of
one cell's / one face's / one perforation's primary variables, sharing the
exact same formula code as the residual (models/blackoil.py
face_flux_from_q, wells/standard.py perf_flux_formula) so assembly and
residual can never drift apart. This mirrors the reference's Interleaved
block-CSR design (NewtonIterationBlackoilInterleaved.cpp:108-193) but is
assembled with gathers/segment-sums instead of Eigen sparse products.

Well variable ordering per well: [q_w, q_o, q_g, bhp] (np surface rates +
bhp, like the reference's xw ordering at BlackoilModelBase_impl.hpp:616).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from opm_tpu.models.blackoil import (accumulation_from_q,
                                     compute_cell_quantities,
                                     face_flux_from_q, props_local_view)
from opm_tpu.wells import standard as stdwells
from opm_tpu.wells.wells import (CTRL_BHP, CTRL_RESERVOIR_RATE, CTRL_RESV,
                                 CTRL_THP)




def degenerate_x_mask(model, state):
    """Continuous regularization weight in [0, 1] for the (gas-eq, x)
    diagonal of cells whose x variable is losing its equation.

    In an rs-variable cell (HC_OILONLY) the gas-equation x-column scales
    with so (pv*bo*so/dt); in an rv cell (HC_GASONLY) with sg. As the
    scaling saturation -> 0 the diagonal block becomes numerically
    singular LONG before it is exactly zero: at so ~ 1e-8 (a water-swept
    SPE9 cell) the block's third singular value is ~5e-13 of the first,
    the block-Jacobi inverse and the quasi-IMPES weights blow up to
    ~1e12, and CPR-BiCGStab convergence becomes a roundoff coin-flip
    (stalls at any dt). A binary so/sg <= 1e-10 test misses the whole
    (1e-10, 1e-5) band, so blend the pv/dt regularizer in continuously:
    weight = clip(1 - s_scaling/1e-5, 0, 1). Only the Jacobian is touched
    (Newton direction for a physically irrelevant x), never the residual.
    sg-variable cells (HC_GASOIL) keep their well-scaled pv*bg/dt diagonal
    and get no extra term."""
    from opm_tpu.models.state import (HC_GASONLY, HC_OILONLY, saturations)

    sw, so, sg = saturations(state)
    is_rs = state.hcstate == HC_OILONLY
    is_rv = state.hcstate == HC_GASONLY
    s_scale = jnp.where(is_rs, so, jnp.where(is_rv, sg,
                                             jnp.ones_like(so)))
    return jnp.clip(1.0 - s_scale / 1e-5, 0.0, 1.0)


class BlockSystem(NamedTuple):
    """Assembled block-sparse Jacobian + residual.

    The 3x3 cell/face block families are stored as TUPLES of nine FLAT
    1-D arrays, row-major over (eq, var): blocks[3*i + j] = dF_i/du_j.
    Earlier rounds used stacked (3, 3, n) arrays; on TPU every consumer
    (block products, inverses, pressure-column extraction) immediately
    slices the nine planes back out, and each such slice of a
    T(4,128)-tiled 3-D stack materializes as a serialized kLoop relayout
    into flat T(1024) vectors — measured 6-8 ms/Newton at SPE10-132k,
    the fattest single op in the fused-substep trace. Nine flat vectors
    make every producer and consumer a plain elementwise op that XLA
    fuses end to end; an (n, 3, 3) layout is worse still (~85x tile
    padding, the SPE10-scale OOM)."""

    # residual
    r_cell: jnp.ndarray    # (3, nc) phase-leading
    r_well: jnp.ndarray    # (nw, 4)  [flux eqs (3), control eq]
    # Jacobian 3x3 block families: 9-tuples of flat arrays (see above)
    diag: tuple            # 9 x (nc,) true block diagonal [eq, var]
    face_L: tuple          # 9 x (nf,) dF/du_L
    face_R: tuple          # 9 x (nf,) dF/du_R
    # wells
    cw: jnp.ndarray        # (nw, mp, 3, 4) cell rows x well vars (-dcq/dwv)
    wc: jnp.ndarray        # (nw, mp, 3, 3) well flux rows x cell vars
    wd_diag: jnp.ndarray   # (nw, 4, 4) well rows x well vars
    # topology (copied for the operator)
    face_cells: jnp.ndarray
    perf_cell: jnp.ndarray  # (nw, mp)
    perf_mask: jnp.ndarray  # (nw, mp) float

    @property
    def nc(self):
        return self.diag[0].shape[-1]

    @property
    def nw(self):
        return self.wd_diag.shape[0]

    @property
    def op_dtype(self):
        return self.diag[0].dtype


def assemble(model, state, acc0, dt, wd, cdp) -> BlockSystem:
    """Assemble residual + exact Jacobian blocks at `state`.

    Layout-first design: every derivative comes from `jax.linearize` of the
    VECTORIZED residual pieces, seeded with per-variable basis tangents.
    Cells (faces) are independent, so seeding all of them at once yields
    exactly the per-cell (per-face) derivative columns as (3, n) arrays —
    the (3, 3, n) Jacobian blocks are produced natively with every
    intermediate a 1-D or (3, n) array. A vmapped per-entity jacfwd would
    instead materialize (n, 3, 3) batched intermediates, which TPU tiles
    pad ~85x (the SPE10-scale OOM)."""
    props = model.props
    nc = model.nc
    c1 = model.face_cells[:, 0]
    c2 = model.face_cells[:, 1]

    hc = state.hcstate
    pvt = model.pvtnum
    sat = model.satnum
    p, sw, x = state.pressure, state.sw, state.x
    # hysteresis memory is EXPLICIT (frozen within the Newton, updated per
    # report step like the reference's updateSatHyst) — a constant here
    smax = state.sgmax
    ireg = model.imbnum
    omax = state.somax

    # ---- accumulation: value + diagonal blocks --------------------------
    def acc_all(pc, swc, xc):
        q = compute_cell_quantities(props, pc, swc, xc, hc, pvt, sat,
                                    sgmax=smax, ireg=ireg, somax=omax)
        return accumulation_from_q(q)          # (3, nc)

    acc_val, acc_jvp = jax.linearize(acc_all, p, sw, x)
    fdt = p.dtype    # seed dtype must match the primal dtype (ASM_F32)
    ones_c = jnp.ones(nc, fdt)
    zero_c = jnp.zeros(nc, fdt)
    acc_tan = [acc_jvp(ones_c, zero_c, zero_c),
               acc_jvp(zero_c, ones_c, zero_c),
               acc_jvp(zero_c, zero_c, ones_c)]    # per var: (3 eq, nc)
    pvdt = model.pv / dt
    r_cell = pvdt * (acc_val - acc0)            # (3, nc)
    # diag as nine flat rows, row-major (eq, var) — see BlockSystem
    diag = [pvdt * acc_tan[j][i] for i in range(3) for j in range(3)]
    # water-only cells (so = sg = 0): the gas equation is identically zero
    # and carries no sensitivity to the rs variable — regularize the (gas, x)
    # diagonal so the block stays invertible (drs then solves to ~0)
    diag[8] = diag[8] + (degenerate_x_mask(model, state)
                         * pvdt).astype(diag[8].dtype)

    # ---- faces: value + L/R blocks ---------------------------------------
    nf = model.face_cells.shape[0]
    thr = model.threshold_dp
    if thr is None:
        thr = jnp.zeros(nf, fdt)

    if getattr(model, "structured", False):
        # Structured path: evaluate cell quantities + their three tangent
        # columns ONCE PER CELL, then chain-rule through face_flux_from_q
        # per direction with SLICED tangents — no per-face PVT re-eval
        # (2*nf -> nc evaluations) and zero gathers/scatters (all face
        # topology is static shifted slices).
        def q_all(pc, swc, xc):
            return compute_cell_quantities(props, pc, swc, xc, hc, pvt, sat,
                                           sgmax=smax, ireg=ireg,
                                           somax=omax)

        q_val, q_jvp = jax.linearize(q_all, p, sw, x)
        ones_c = jnp.ones(nc, fdt)
        zero_c = jnp.zeros(nc, fdt)
        q_tan = [q_jvp(*s) for s in ((ones_c, zero_c, zero_c),
                                     (zero_c, ones_c, zero_c),
                                     (zero_c, zero_c, ones_c))]
        q3 = jax.tree.map(model._cells3, q_val)
        q3_tan = [jax.tree.map(model._cells3, t) for t in q_tan]
        nx, ny, nz = model.grid.dims
        r3 = r_cell.reshape(3, nz, ny, nx)
        # diag/face rows kept as SEPARATE flat/3-D arrays per (eq, var):
        # a 5-D (3,3,z,y,x) array tempts XLA into tiling the (3,3) pair
        # (57x padding), and even a 9-leading stack costs relayout kLoops
        # when the planes are sliced back out (see BlockSystem)
        diag3 = [d.reshape(nz, ny, nx) for d in diag]
        fL_rows = [[] for _ in range(9)]
        fR_rows = [[] for _ in range(9)]
        ofs = 0
        for slL, slR, nf_d in model._dir_segments():
            def sf(a, sl):
                return a[(Ellipsis,) + sl].reshape(a.shape[:-3] + (-1,))

            qL = jax.tree.map(lambda a: sf(a, slL), q3)
            qR = jax.tree.map(lambda a: sf(a, slR), q3)
            t_d = model.trans[ofs:ofs + nf_d]
            dz_d = (model.depth3[slL] - model.depth3[slR]).reshape(-1)
            thr_d = thr[ofs:ofs + nf_d]

            def flux_of(qLv, qRv):
                return face_flux_from_q(qLv, qRv, t_d, dz_d, model.gravity,
                                        threshold_dp=thr_d)

            flux_val, fjvp = jax.linearize(flux_of, qL, qR)
            zL = jax.tree.map(jnp.zeros_like, qL)
            zR = jax.tree.map(jnp.zeros_like, qR)
            fL_cols = [fjvp(jax.tree.map(lambda a: sf(a, slL), q3_tan[j]),
                            zR) for j in range(3)]           # (3, nf_d)
            fR_cols = [fjvp(zL, jax.tree.map(lambda a: sf(a, slR),
                                             q3_tan[j])) for j in range(3)]
            shape_d = r3[(slice(None),) + slL].shape
            sp_d = shape_d[1:]
            r3 = _pad_add_sl(r3, flux_val.reshape(shape_d), slL)
            r3 = _pad_add_sl(r3, -flux_val.reshape(shape_d), slR)
            for i in range(3):
                for j in range(3):
                    k = 3 * i + j
                    fl = fL_cols[j][i]
                    fr = fR_cols[j][i]
                    diag3[k] = _pad_add_sl(diag3[k], fl.reshape(sp_d),
                                           slL)
                    diag3[k] = _pad_add_sl(diag3[k], -fr.reshape(sp_d),
                                           slR)
                    fL_rows[k].append(fl)
                    fR_rows[k].append(fr)
            ofs += nf_d
        r_cell = r3.reshape(3, -1)
        diag = [d.reshape(-1) for d in diag3]
        if getattr(model, "n_extra_faces", 0):
            # extra faces (embedded grids: stair-step faults / NNCs):
            # gather-path value + L/R blocks chained through the SAME
            # per-cell tangent columns
            e1 = model.face_cells[ofs:, 0]
            e2 = model.face_cells[ofs:, 1]
            qLe = jax.tree.map(lambda a: a[..., e1], q_val)
            qRe = jax.tree.map(lambda a: a[..., e2], q_val)
            t_e = model.trans[ofs:]
            dz_e = model.depth[e1] - model.depth[e2]
            thr_e = thr[ofs:]

            def flux_of_e(qLv, qRv):
                return face_flux_from_q(qLv, qRv, t_e, dz_e, model.gravity,
                                        threshold_dp=thr_e)

            flux_val_e, fjvp_e = jax.linearize(flux_of_e, qLe, qRe)
            zLe = jax.tree.map(jnp.zeros_like, qLe)
            zRe = jax.tree.map(jnp.zeros_like, qRe)
            fLe_cols = [fjvp_e(jax.tree.map(lambda a: a[..., e1],
                                            q_tan[j]), zRe)
                        for j in range(3)]
            fRe_cols = [fjvp_e(zLe, jax.tree.map(lambda a: a[..., e2],
                                                 q_tan[j]))
                        for j in range(3)]
            r_cell = r_cell.at[:, e1].add(flux_val_e) \
                .at[:, e2].add(-flux_val_e)
            for i in range(3):
                for j in range(3):
                    k = 3 * i + j
                    diag[k] = diag[k].at[e1].add(fLe_cols[j][i]) \
                        .at[e2].add(-fRe_cols[j][i])
                    fL_rows[k].append(fLe_cols[j][i])
                    fR_rows[k].append(fRe_cols[j][i])
        face_L = tuple(jnp.concatenate(fL_rows[k]) if len(fL_rows[k]) > 1
                       else fL_rows[k][0] for k in range(9))
        face_R = tuple(jnp.concatenate(fR_rows[k]) if len(fR_rows[k]) > 1
                       else fR_rows[k][0] for k in range(9))
    else:
        dz = model.depth[c1] - model.depth[c2]
        auxL = (hc[c1], pvt[c1], sat[c1])
        auxR = (hc[c2], pvt[c2], sat[c2])

        smaxL = None if smax is None else smax[c1]
        smaxR = None if smax is None else smax[c2]
        iregL = None if ireg is None else ireg[c1]
        iregR = None if ireg is None else ireg[c2]
        omaxL = None if omax is None else omax[c1]
        omaxR = None if omax is None else omax[c2]

        propsL = props_local_view(props, c1)
        propsR = props_local_view(props, c2)

        def flux_all(pL, swL, xL, pR, swR, xR):
            qL = compute_cell_quantities(propsL, pL, swL, xL, *auxL,
                                         sgmax=smaxL, ireg=iregL,
                                         somax=omaxL)
            qR = compute_cell_quantities(propsR, pR, swR, xR, *auxR,
                                         sgmax=smaxR, ireg=iregR,
                                         somax=omaxR)
            return face_flux_from_q(qL, qR, model.trans, dz, model.gravity,
                                    threshold_dp=thr)   # (3, nf)

        flux_val, flux_jvp = jax.linearize(
            flux_all, p[c1], sw[c1], x[c1], p[c2], sw[c2], x[c2])
        ones_f = jnp.ones(nf, fdt)
        zero_f = jnp.zeros(nf, fdt)

        def _col(side, j):
            seeds = [zero_f] * 6
            seeds[3 * side + j] = ones_f
            return flux_jvp(*seeds)

        colsL = [_col(0, j) for j in range(3)]   # (3, nf) per var
        colsR = [_col(1, j) for j in range(3)]
        face_L = tuple(colsL[j][i] for i in range(3) for j in range(3))
        face_R = tuple(colsR[j][i] for i in range(3) for j in range(3))
        r_cell = r_cell.at[:, c1].add(flux_val).at[:, c2].add(-flux_val)
        for k in range(9):
            diag[k] = diag[k].at[c1].add(face_L[k]).at[c2].add(-face_R[k])

    # ---- wells -----------------------------------------------------------
    nw, mp = wd["perf_cell"].shape
    pc = wd["perf_cell"]
    mask = wd["perf_mask"] * wd["open"][:, None]           # (nw, mp)
    wv = jnp.concatenate([state.qs, state.bhp[:, None]], axis=1)  # (nw, 4)
    allow_xflow = model.params.allow_crossflow

    def perf_local(u_c, wvars, auxc, wi, cdp_p, comp_frac, is_inj,
                   cell_i):
        # cell_i: this lane's grid cell — gathers the per-CELL satfunc
        # arrays (SWATINIT/ENDSCALE) so they broadcast with the scalar
        # lane saturations (props_local_view is a no-op otherwise)
        q = compute_cell_quantities(
            props_local_view(props, cell_i),
            u_c[0], u_c[1], u_c[2], auxc[0], auxc[1], auxc[2],
            sgmax=auxc[3] if len(auxc) > 3 else None,
            ireg=auxc[4] if len(auxc) > 4 else None,
            somax=auxc[5] if len(auxc) > 5 else None)
        qs_w = wvars[:3]
        bhp_w = wvars[3]
        cmix = stdwells.wellbore_mixture(qs_w, comp_frac, is_inj)
        return stdwells.perf_flux_formula(
            q.po, q.b, q.mob, q.rs, q.rv, wi, bhp_w + cdp_p, cmix, is_inj,
            allow_crossflow=allow_xflow)

    # flatten (nw, mp) -> (nw*mp,); gather first, stack the tiny result
    pc_f = pc.reshape(-1)
    u_pf = jnp.stack([p[pc_f], sw[pc_f], x[pc_f]], axis=-1)
    aux_pf = (hc[pc_f], pvt[pc_f], sat[pc_f])
    if smax is not None or omax is not None:
        # hysteresis / VAPPARS memory rides as extra aux lanes: index 3 =
        # sgmax, 4 = imbnum, 5 = somax (len-gated in perf_local); sgmax
        # without IMBNUM cannot occur (hysteresis implies imbnum)
        z = jnp.zeros_like(p[pc_f])
        aux_pf = aux_pf + (smax[pc_f] if smax is not None else z,
                           ireg[pc_f] if ireg is not None
                           else jnp.zeros_like(pc_f),
                           omax[pc_f] if omax is not None else z)
    wv_f = jnp.repeat(wv, mp, axis=0)
    cf_f = jnp.repeat(wd["comp_frac"], mp, axis=0)
    ii_f = jnp.repeat(wd["is_injector"], mp)
    wi_f = wd["perf_wi"].reshape(-1)
    cdp_f = cdp.reshape(-1)

    cq_val = jax.vmap(perf_local)(u_pf, wv_f, aux_pf, wi_f, cdp_f, cf_f,
                                  ii_f, pc_f)
    jac_u, jac_wv = jax.vmap(jax.jacfwd(perf_local, argnums=(0, 1)))(
        u_pf, wv_f, aux_pf, wi_f, cdp_f, cf_f, ii_f, pc_f)
    m_f = mask.reshape(-1)
    cq_val = cq_val * m_f[:, None]
    jac_u = jac_u * m_f[:, None, None]
    jac_wv = jac_wv * m_f[:, None, None]

    # cell equations: r -= cq; diag -= dcq/du_c at perf cells
    r_cell = r_cell.at[:, pc_f].add(-cq_val.T)
    for i in range(3):
        for j in range(3):
            diag[3 * i + j] = diag[3 * i + j].at[pc_f].add(-jac_u[:, i, j])
    cw = (-jac_wv).reshape(nw, mp, 3, 4)
    wc = (-jac_u).reshape(nw, mp, 3, 3)   # well flux rows: d(q - sum cq)/du

    # well equations: flux rows = qs - sum_p cq; control row
    cq_sum = cq_val.reshape(nw, mp, 3).sum(axis=1)
    flux_res = state.qs - cq_sum
    g = stdwells.control_distribution(state.control, wd["comp_frac"])
    resv_coef = wd.get("resv_coef")
    if resv_coef is not None:
        is_resv = ((state.control == CTRL_RESV) |
                   (state.control == CTRL_RESERVOIR_RATE))[:, None]
        sign = jnp.where(wd["is_injector"], 1.0, -1.0)[:, None]
        g = jnp.where(is_resv, sign * resv_coef, g)
    g = stdwells.effective_distribution(
        g, state.control, wd["is_injector"].astype(bool),
        cq_val.reshape(nw, mp, 3))
    is_bhp = (state.control == CTRL_BHP) | (state.control == CTRL_THP)
    closed = wd["open"] < 0.5
    vfp = wd.get("vfp")

    def ctrl_local(qsw, bhpw, gw, ctrlw, tgtw, slotw, dpw):
        """Per-well control residual (same semantics as
        stdwells.well_residuals' ctrl branch); jacfwd gives the exact row
        incl. the VFP rate dependence."""
        rate = gw @ qsw - tgtw
        bhp_t = tgtw
        if vfp is not None:
            tables = vfp[0]
            for si, tab in enumerate(tables):
                hit = (ctrlw == CTRL_THP) & (slotw == si)
                bhp_t = jnp.where(hit, tab.bhp_at(qsw, tgtw) + dpw, bhp_t)
        return jnp.where((ctrlw == CTRL_BHP) | (ctrlw == CTRL_THP),
                         bhpw - bhp_t, rate)

    if vfp is not None:
        slot_arr, dp_arr = vfp[1], vfp[2]
    else:
        slot_arr = jnp.full(nw, -1)
        dp_arr = jnp.zeros(nw, fdt)
    ctrl_res = jax.vmap(ctrl_local)(state.qs, state.bhp, g, state.control,
                                    state.target, slot_arr, dp_arr)
    ctrl_jq, ctrl_jb = jax.vmap(jax.jacfwd(ctrl_local, argnums=(0, 1)))(
        state.qs, state.bhp, g, state.control, state.target, slot_arr,
        dp_arr)
    flux_res = jnp.where(closed[:, None], state.qs, flux_res)
    ctrl_res = jnp.where(closed, state.bhp - wd["bhp_limit"], ctrl_res)
    r_well = jnp.concatenate([flux_res, ctrl_res[:, None]], axis=1)

    # well diagonal blocks
    eye34 = jnp.zeros((3, 4), fdt).at[:, :3].set(jnp.eye(3, dtype=fdt))
    dwv_sum = jac_wv.reshape(nw, mp, 3, 4).sum(axis=1)   # d(sum cq)/dwv
    flux_rows = eye34[None] - dwv_sum                    # (nw, 3, 4)
    flux_rows = jnp.where(closed[:, None, None], eye34[None], flux_rows)
    ctrl_row = jnp.concatenate([ctrl_jq, ctrl_jb[:, None]], axis=1)
    ctrl_row_bhp = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0]),
                                    (nw, 4))
    ctrl_row = jnp.where(closed[:, None], ctrl_row_bhp, ctrl_row)
    wd_diag = jnp.concatenate([flux_rows, ctrl_row[:, None, :]], axis=1)
    # closed wells: no cell coupling
    cw = cw * wd["open"][:, None, None, None]
    wc = wc * wd["open"][:, None, None, None]

    return BlockSystem(
        r_cell=r_cell, r_well=r_well,
        diag=tuple(diag), face_L=tuple(face_L), face_R=tuple(face_R),
        cw=cw, wc=wc, wd_diag=wd_diag,
        face_cells=model.face_cells, perf_cell=pc,
        perf_mask=mask)


def bapply_rows(rows9, v):
    """Nine-flat-rows block product: rows9 (indexable of 9 arrays,
    row-major (eq, var)) applied to v (3, n) -> (3, n); nine fused
    elementwise products. The (3, n) vector layout keeps the Krylov
    loop's carried buffers free of TPU tile padding (an (n,3) layout pads
    the 3 up to 128 lanes — 42x the memory and bandwidth); the flat-rows
    block storage avoids (3,3,n)-stack relayouts (see BlockSystem)."""
    return jnp.stack([
        rows9[0] * v[0] + rows9[1] * v[1] + rows9[2] * v[2],
        rows9[3] * v[0] + rows9[4] * v[1] + rows9[5] * v[2],
        rows9[6] * v[0] + rows9[7] * v[1] + rows9[8] * v[2]])


# back-compat alias used by older tools; same contract as bapply_rows on
# the 9-tuple layout
_bapply = bapply_rows


def matvec(sys: BlockSystem, v_cell, v_well, dims=None):
    """J @ [v_cell (3, nc); v_well (nw, 4)] -> (out_cell, out_well).

    dims: optional static (nx, ny, nz) for a FULLY-ACTIVE cartesian grid —
    the face gathers/scatters then become static shifted slices (TPU: full
    HBM bandwidth instead of the gather unit). Face order must be the
    cartesian build order of grid.build_grid (x block, y block, z block,
    each C-ordered) — guaranteed when grid.structured is True."""
    if dims is not None:
        out_c = _matvec_cells_structured(sys, v_cell, dims)
    else:
        c1 = sys.face_cells[:, 0]
        c2 = sys.face_cells[:, 1]
        out_c = bapply_rows(sys.diag, v_cell)
        # off-diagonal face pairs: row L gets +dF/du_R * v_R; row R gets
        # -dF/du_L * v_L (diagonal parts already folded into diag)
        out_c = out_c.at[:, c1].add(bapply_rows(sys.face_R, v_cell[:, c2]))
        out_c = out_c.at[:, c2].add(-bapply_rows(sys.face_L,
                                                 v_cell[:, c1]))
    nw, mp = sys.perf_cell.shape
    pc_f = sys.perf_cell.reshape(-1)
    # cell rows x well vars (well arrays are tiny; einsums are fine there)
    vw_rep = jnp.repeat(v_well, mp, axis=0)               # (nw*mp, 4)
    cw_add = jnp.einsum("pij,pj->pi", sys.cw.reshape(-1, 3, 4), vw_rep)
    out_c = out_c.at[:, pc_f].add(cw_add.T)
    # well rows
    out_w = jnp.einsum("wij,wj->wi", sys.wd_diag, v_well)
    vc_perf = v_cell[:, pc_f].T                           # (nw*mp, 3)
    wf = jnp.einsum("pij,pj->pi", sys.wc.reshape(-1, 3, 3), vc_perf)
    out_w = out_w.at[:, :3].add(wf.reshape(nw, mp, 3).sum(axis=1))
    return out_c, out_w


def _bapply9(blocks9, v):
    """Indexable of 9 (eq, var)-row-major block arrays applied to
    (3, ...) vectors. Rows stay SEPARATE arrays end to end — a 5-D
    (3,3,z,y,x) stack tempts XLA into a layout that tiles the (3,3) pair
    (57x padding, 2.1 GB copies observed at SPE10-2 scale), and even a
    9-leading stack pays relayout kLoops when re-sliced."""
    outs = []
    for i in range(3):
        acc = blocks9[3 * i] * v[0]
        acc = acc + blocks9[3 * i + 1] * v[1]
        acc = acc + blocks9[3 * i + 2] * v[2]
        outs.append(acc)
    return jnp.stack(outs)


def _pad_add_backend():
    """Trace-time backend gate: on TPU `.at[static_slice].add` lowers to
    an UNFUSED dynamic-update-slice plus a full-array copy (~60 us each
    at 132k; six per Krylov matvec apply) and the zero-pad + add fuses
    to one elementwise op; on CPU the in-place DUS is the faster form
    and the pads allocate. OPM_TPU_PAD_ADD=0/1 overrides."""
    import os as _os

    v = _os.environ.get("OPM_TPU_PAD_ADD", "auto")
    if v != "auto":
        return v == "1"
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _pad_add_sl(out, v, sl):
    """out + v at the static 3-slice suffix `sl` (the _dir_segments
    L/R slices) via zero-pad — same rationale as _pad_add."""
    if not _pad_add_backend():
        idx = (Ellipsis,) + tuple(sl) if out.ndim > 3 else tuple(sl)
        return out.at[idx].add(v)
    pads = [(0, 0)] * out.ndim
    off = out.ndim - 3
    for ax, s in enumerate(sl):
        n = out.shape[off + ax]
        start = (0 if s.start is None
                 else s.start if s.start >= 0 else n + s.start)
        stop = (n if s.stop is None
                else s.stop if s.stop >= 0 else n + s.stop)
        pads[off + ax] = (start, n - stop)
    return out + jnp.pad(v, pads)


def _pad_add(out, v, axis, lo):
    """out + v placed at offset `lo` along `axis`, via zero-pad (TPU) or
    an in-place slice add (CPU) — see _pad_add_backend."""
    if not _pad_add_backend():
        idx = [slice(None)] * out.ndim
        idx[axis] = slice(lo, lo + v.shape[axis])
        return out.at[tuple(idx)].add(v)
    pads = [(0, 0)] * out.ndim
    pads[axis] = (lo, out.shape[axis] - v.shape[axis] - lo)
    return out + jnp.pad(v, pads)


def _matvec_cells_structured(sys: BlockSystem, v_cell, dims):
    """Cell-block part of the matvec as 7-point stencil slice arithmetic."""
    nx, ny, nz = dims
    nfx = (nx - 1) * ny * nz
    nfy = nx * (ny - 1) * nz
    nfz = nx * ny * (nz - 1)
    v3 = v_cell.reshape(3, nz, ny, nx)
    out = bapply_rows(sys.diag, v_cell).reshape(3, nz, ny, nx)

    def seg(rows, lo, hi, shape):
        return [r[lo:hi].reshape(shape) for r in rows]

    fLx = seg(sys.face_L, 0, nfx, (nz, ny, nx - 1))
    fRx = seg(sys.face_R, 0, nfx, (nz, ny, nx - 1))
    out = _pad_add(out, _bapply9(fRx, v3[:, :, :, 1:]), 3, 0)
    out = _pad_add(out, -_bapply9(fLx, v3[:, :, :, :-1]), 3, 1)
    fLy = seg(sys.face_L, nfx, nfx + nfy, (nz, ny - 1, nx))
    fRy = seg(sys.face_R, nfx, nfx + nfy, (nz, ny - 1, nx))
    out = _pad_add(out, _bapply9(fRy, v3[:, :, 1:, :]), 2, 0)
    out = _pad_add(out, -_bapply9(fLy, v3[:, :, :-1, :]), 2, 1)
    nf_can = nfx + nfy + nfz
    fLz = seg(sys.face_L, nfx + nfy, nf_can, (nz - 1, ny, nx))
    fRz = seg(sys.face_R, nfx + nfy, nf_can, (nz - 1, ny, nx))
    out = _pad_add(out, _bapply9(fRz, v3[:, 1:]), 1, 0)
    out = _pad_add(out, -_bapply9(fLz, v3[:, :-1]), 1, 1)
    out = out.reshape(3, -1)
    if sys.face_L[0].shape[-1] > nf_can:
        # extra faces (embedded grids): small gather-path correction
        e1 = sys.face_cells[nf_can:, 0]
        e2 = sys.face_cells[nf_can:, 1]
        fLe = [r[nf_can:] for r in sys.face_L]
        fRe = [r[nf_can:] for r in sys.face_R]
        out = out.at[:, e1].add(bapply_rows(fRe, v_cell[:, e2]))
        out = out.at[:, e2].add(-bapply_rows(fLe, v_cell[:, e1]))
    return out


def well_apply_B(sys: BlockSystem, v_cell):
    """Well-equation rows x cell vars: B @ v_cell -> (nw, 4) (control rows
    have no cell dependence)."""
    nw, mp = sys.perf_cell.shape
    pc_f = sys.perf_cell.reshape(-1)
    vc_perf = v_cell[:, pc_f].T                           # (nw*mp, 3)
    wf = jnp.einsum("pij,pj->pi", sys.wc.reshape(-1, 3, 3), vc_perf)
    out = jnp.zeros((nw, 4), v_cell.dtype)
    return out.at[:, :3].add(wf.reshape(nw, mp, 3).sum(axis=1))


def well_apply_C(sys: BlockSystem, v_well):
    """Cell rows x well vars: C @ v_well scattered to cells -> (3, nc)."""
    nw, mp = sys.perf_cell.shape
    pc_f = sys.perf_cell.reshape(-1)
    vw_rep = jnp.repeat(v_well, mp, axis=0)               # (nw*mp, 4)
    cw_add = jnp.einsum("pij,pj->pi", sys.cw.reshape(-1, 3, 4), vw_rep)
    nc = sys.nc
    return jnp.zeros((3, nc), v_well.dtype).at[:, pc_f].add(cw_add.T)


def schur_eliminate_wells(sys: BlockSystem, dims=None, op_dtype=None):
    """Schur-eliminate the well unknowns (the reference's eliminateVariable
    on well_flux_eq + well_eq, NewtonIterationUtilities.cpp:45-128: per-well
    dense solve of D, reduced cell system A - C D^-1 B).

    op_dtype: optional storage/arithmetic dtype for the reduced OPERATOR
    only (mixed-precision Krylov: the matvec runs at op_dtype — f32 is
    ~1e-7 relative error per apply, far below the 1e-2 linear reduction
    target — while the rhs, Krylov recurrence vectors/dots, and the
    recover step stay f64). The block inverses are always formed in f64
    (their det guards underflow in f32) and cast after.

    Returns (matvec_cells(v_cell) closure over the reduced operator,
    reduced rhs (3, nc), recover(x_cell) -> x_well closure)."""
    from opm_tpu.linalg.precond import inv4x4

    Dinv = inv4x4(sys.wd_diag)                            # (nw, 4, 4)

    def dinv_apply(rw):
        return jnp.einsum("wij,wj->wi", Dinv, rw)

    rhs = sys.r_cell - well_apply_C(sys, dinv_apply(sys.r_well))

    def recover(x_cell):
        """x_w = D^-1 (r_w - B x_c) (recoverVariable, :134-184)."""
        return dinv_apply(sys.r_well - well_apply_B(sys, x_cell))

    if op_dtype is None:
        sys_op, Dinv_op = sys, Dinv
    else:
        sys_op = jax.tree.map(
            lambda a: (a.astype(op_dtype)
                       if jnp.issubdtype(a.dtype, jnp.floating) else a),
            sys)
        Dinv_op = Dinv.astype(op_dtype)

    def reduced_matvec(v_cell):
        out_dt = v_cell.dtype
        v = v_cell.astype(sys_op.op_dtype)
        out_c = matvec(sys_op, v,
                       jnp.zeros((sys_op.nw, 4), v.dtype), dims=dims)[0]
        w = jnp.einsum("wij,wj->wi", Dinv_op, well_apply_B(sys_op, v))
        return (out_c - well_apply_C(sys_op, w)).astype(out_dt)

    return reduced_matvec, rhs, recover


def residual_norms(sys: BlockSystem):
    return (jnp.max(jnp.abs(sys.r_cell)), jnp.max(jnp.abs(sys.r_well)))
