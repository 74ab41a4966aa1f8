"""Column-wise gravity segregation (vertical equilibrium splitting step).

The reference IMPES-style simulators follow each transport solve with a
gravity-segregation solve applied per vertical column of cells
(TransportSolverTwophaseReorder::solveGravity / solveGravityColumn,
/root/reference/opm/core/transport/reorder/
TransportSolverCompressibleTwophaseReorder.cpp:322-470): an implicit Euler
step of counter-current two-phase buoyancy flow in which each column is an
independent tridiagonal-coupled nonlinear system, solved by per-cell scalar
root finds iterated Gauss-Seidel until the column converges.

TPU redesign: all columns solve *simultaneously* — cells are laid out as a
dense (ncol, maxlen) array (padded with -1), each sweep solves every cell's
monotone scalar residual by vmapped bracketed bisection with neighbor
saturations frozen (Jacobi-in-column), and sweeps repeat inside one
`lax.while_loop` until the largest saturation change is below tolerance.
At the fixed point every cell residual is zero with the *actual* neighbor
values, i.e. the same coupled implicit system the reference's Gauss-Seidel
converges to.

The per-face buoyancy driver follows initGravityDynamic (:409-438):
  gravflux_f = T_f g [ (z_u - z_f) (rho_w - rho_o)_u + (z_f - z_d) (rho_w - rho_o)_d ]
oriented towards the next (deeper) cell in the column.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_BISECT_ITERS = 60


class Columns(NamedTuple):
    """Host-built vertical column layout. cells: (ncol, L) active-cell
    indices padded with -1 (top to bottom); faces: (ncol, L-1) z-face
    indices between consecutive cells, padded with -1."""
    cells: np.ndarray
    faces: np.ndarray


def build_columns(grid) -> Columns:
    """Chase z-direction faces to assemble maximal vertical stacks.
    Columns break at inactive cells (matching the reference's requirement
    that a column is a single non-interacting vertical stack)."""
    nc = grid.nc
    below = np.full(nc, -1, dtype=np.int64)     # cell -> cell underneath
    below_face = np.full(nc, -1, dtype=np.int64)
    has_above = np.zeros(nc, dtype=bool)
    zmask = np.asarray(grid.face_dir) == 2
    for f in np.nonzero(zmask)[0]:
        c1, c2 = grid.face_cells[f]
        below[c1] = c2
        below_face[c1] = f
        has_above[c2] = True
    cols = []
    for top in np.nonzero(~has_above)[0]:
        col = [int(top)]
        while below[col[-1]] >= 0:
            col.append(int(below[col[-1]]))
        cols.append(col)
    L = max(len(c) for c in cols)
    cells = np.full((len(cols), L), -1, dtype=np.int64)
    faces = np.full((len(cols), max(L - 1, 1)), -1, dtype=np.int64)
    for i, col in enumerate(cols):
        cells[i, : len(col)] = col
        for j in range(len(col) - 1):
            faces[i, j] = below_face[col[j]]
    return Columns(cells=cells, faces=faces)


@partial(jax.jit, static_argnames=("relperm_fn", "max_sweeps"))
def segregate(cols_cells, cols_faces, trans, depth, half_dz, s, dtpv,
              mu_w, mu_o, rho_w, rho_o, gravity, relperm_fn,
              max_sweeps=200, tol=1e-9):
    """One implicit gravity-segregation step. Per-cell arrays: s (water
    saturation), dtpv = dt/pv, viscosities and in-situ densities evaluated
    at cell pressure (constants for the incompressible family). Returns the
    new saturation field (same shape as s) and sweep count."""
    valid_c = cols_cells >= 0
    cc = jnp.where(valid_c, cols_cells, 0)
    valid_f = cols_faces >= 0
    cf = jnp.where(valid_f, cols_faces, 0)

    # --- per-column-face buoyancy flux (frozen over the step) -----------
    c_up = cc[:, :-1]
    c_dn = cc[:, 1:]
    z_u = depth[c_up]
    z_d = depth[c_dn]
    z_f = z_u + half_dz[c_up]                       # interface depth
    drho_u = rho_w[c_up] - rho_o[c_up]
    drho_d = rho_w[c_dn] - rho_o[c_dn]
    gf = trans[cf] * gravity * ((z_u - z_f) * drho_u + (z_f - z_d) * drho_d)
    gf = jnp.where(valid_f & valid_c[:, 1:], gf, 0.0)

    s0 = s[cc]
    dtpv_c = dtpv[cc]
    muw_c = mu_w[cc]
    muo_c = mu_o[cc]

    pad = jnp.zeros((gf.shape[0], 1))
    gf_above = -jnp.concatenate([pad, gf], axis=1)   # towards cell above
    gf_below = jnp.concatenate([gf, pad], axis=1)

    def neighbor_term(s_self, mw_nb, mo_nb, muw_self, muo_self, gfv):
        """-gf * lam_w lam_o / lam_t with the reference's frozen-phase
        upwinding (GravityResidual::operator(), :358-374)."""
        krw, kro = relperm_fn(s_self)
        m0 = jnp.where(gfv < 0, krw / muw_self, mw_nb)
        m1 = jnp.where(gfv < 0, mo_nb, kro / muo_self)
        lam = m0 * m1 / jnp.maximum(m0 + m1, 1e-30)
        return -gfv * lam

    def residual(s_try, mw_nb_up, mo_nb_up, mw_nb_dn, mo_nb_dn):
        t_up = neighbor_term(s_try, mw_nb_up, mo_nb_up, muw_c, muo_c,
                             gf_above)
        t_dn = neighbor_term(s_try, mw_nb_dn, mo_nb_dn, muw_c, muo_c,
                             gf_below)
        return s_try - s0 + dtpv_c * (t_up + t_dn)

    def one_sweep(s_col):
        krw, kro = relperm_fn(s_col)
        mw = krw / muw_c
        mo = kro / muo_c
        zcol = jnp.zeros((s_col.shape[0], 1))
        mw_up = jnp.concatenate([zcol, mw[:, :-1]], axis=1)
        mo_up = jnp.concatenate([zcol, mo[:, :-1]], axis=1)
        mw_dn = jnp.concatenate([mw[:, 1:], zcol], axis=1)
        mo_dn = jnp.concatenate([mo[:, 1:], zcol], axis=1)

        lo = jnp.zeros_like(s_col)
        hi = jnp.ones_like(s_col)

        def bis(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            r = residual(mid, mw_up, mo_up, mw_dn, mo_dn)
            lo = jnp.where(r < 0, mid, lo)
            hi = jnp.where(r < 0, hi, mid)
            return (lo, hi)

        lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, bis, (lo, hi))
        s_new = jnp.where(valid_c, 0.5 * (lo + hi), s_col)
        return s_new

    def cond(carry):
        _, k, ds = carry
        return (k < max_sweeps) & (ds > tol)

    def body(carry):
        s_col, k, _ = carry
        s_new = one_sweep(s_col)
        return (s_new, k + 1, jnp.max(jnp.abs(s_new - s_col)))

    s_cols, sweeps, _ = jax.lax.while_loop(
        cond, body, (s0, jnp.asarray(0), jnp.asarray(jnp.inf)))

    # scatter back; padded entries target index nc and are dropped
    flat = s.at[jnp.where(valid_c, cc, s.shape[0]).ravel()].set(
        s_cols.ravel(), mode="drop")
    return flat, sweeps


@partial(jax.jit, static_argnames=("water_mob_fn", "oil_mob_fn", "mc_fn",
                                   "ads_fn", "max_sweeps"))
def segregate_polymer(cols_cells, cols_faces, trans, depth, half_dz, s, c,
                      cmax0, dtpv, rho_w, rho_o, gravity, rock_coef, dps,
                      c_upper, water_mob_fn, oil_mob_fn, mc_fn, ads_fn,
                      max_sweeps=120, tol=1e-7):
    """Coupled (s, c) gravity segregation for polymer flooding
    (TransportSolverTwophasePolymer::solveSingleCellGravity /
    ResidualCGrav, /root/reference/opm/polymer/TransportSolverTwophase
    Polymer.cpp:1123-1232): per cell, a root find on c where each c
    candidate first solves the water residual for s (nested bracketed
    bisection), with neighbor mobilities and mc frozen per sweep — all
    columns and cells advance simultaneously (Jacobi to the same coupled
    fixed point as the reference's Gauss-Seidel).

    water_mob_fn(s, c, cmax0, cell_sel) -> water mobility (with polymer
    factor), oil_mob_fn(s, cell_sel), mc_fn(c, cell_sel), ads_fn(c, cmax0).
    cell_sel is the (ncol, L) active-cell index array for per-cell
    viscosities."""
    valid_c = cols_cells >= 0
    cc = jnp.where(valid_c, cols_cells, 0)
    valid_f = cols_faces >= 0
    cf = jnp.where(valid_f, cols_faces, 0)

    c_up_ = cc[:, :-1]
    c_dn = cc[:, 1:]
    z_u = depth[c_up_]
    z_f = z_u + half_dz[c_up_]
    drho_u = rho_w[c_up_] - rho_o[c_up_]
    drho_d = rho_w[c_dn] - rho_o[c_dn]
    gf = trans[cf] * gravity * ((z_u - z_f) * drho_u
                                + (z_f - depth[c_dn]) * drho_d)
    gf = jnp.where(valid_f & valid_c[:, 1:], gf, 0.0)

    s0 = s[cc]
    c0 = c[cc]
    cmax_c = cmax0[cc]
    dtpv_c = dtpv[cc]
    rock_c = rock_coef[cc]

    pad = jnp.zeros((gf.shape[0], 1))
    gf_above = -jnp.concatenate([pad, gf], axis=1)
    gf_below = jnp.concatenate([gf, pad], axis=1)

    def shift_up(a):
        return jnp.concatenate([jnp.zeros((a.shape[0], 1)), a[:, :-1]],
                               axis=1)

    def shift_dn(a):
        return jnp.concatenate([a[:, 1:], jnp.zeros((a.shape[0], 1))],
                               axis=1)

    def lam_terms(s_try, c_try, gfv, mw_nb, mo_nb, mc_nb):
        """(water-lambda term, polymer term) for one neighbor side."""
        m0_own = water_mob_fn(s_try, c_try, cmax_c, cc)
        m1_own = oil_mob_fn(s_try, cc)
        mc_own = mc_fn(c_try, cc)
        out = gfv < 0
        m0 = jnp.where(out, m0_own, mw_nb)
        m1 = jnp.where(out, mo_nb, m1_own)
        mc = jnp.where(out, mc_own, mc_nb)
        lam = m0 * m1 / jnp.maximum(m0 + m1, 1e-30)
        return -gfv * lam, -gfv * lam * mc

    def residuals(s_try, c_try, frozen):
        (mw_u, mo_u, mc_u, mw_d, mo_d, mc_d) = frozen
        t_up, tc_up = lam_terms(s_try, c_try, gf_above, mw_u, mo_u, mc_u)
        t_dn, tc_dn = lam_terms(s_try, c_try, gf_below, mw_d, mo_d, mc_d)
        r_s = s_try - s0 + dtpv_c * (t_up + t_dn)
        ads = ads_fn(c_try, cmax_c)
        ads0 = ads_fn(c0, cmax_c)
        r_c = ((1 - dps) * (s_try * c_try - s0 * c0)
               + rock_c * (ads - ads0) + dtpv_c * (tc_up + tc_dn))
        return r_s, r_c

    def solve_s(c_try, frozen, iters=50):
        lo = jnp.zeros_like(s0)
        hi = jnp.ones_like(s0)

        def bis(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            rs, _ = residuals(mid, c_try, frozen)
            lo = jnp.where(rs < 0, mid, lo)
            hi = jnp.where(rs < 0, hi, mid)
            return (lo, hi)

        lo, hi = jax.lax.fori_loop(0, iters, bis, (lo, hi))
        return 0.5 * (lo + hi)

    def one_sweep(sc):
        s_col, c_col = sc
        mw = water_mob_fn(s_col, c_col, cmax_c, cc)
        mo = oil_mob_fn(s_col, cc)
        mcv = mc_fn(c_col, cc)
        frozen = (shift_up(mw), shift_up(mo), shift_up(mcv),
                  shift_dn(mw), shift_dn(mo), shift_dn(mcv))

        lo = jnp.zeros_like(c_col)
        hi = jnp.full_like(c_col, c_upper)

        def bis_c(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            s_mid = solve_s(mid, frozen)
            _, rc = residuals(s_mid, mid, frozen)
            lo = jnp.where(rc < 0, mid, lo)
            hi = jnp.where(rc < 0, hi, mid)
            return (lo, hi)

        lo, hi = jax.lax.fori_loop(0, 40, bis_c, (lo, hi))
        c_new = 0.5 * (lo + hi)
        s_new = solve_s(c_new, frozen)
        s_new = jnp.where(valid_c, s_new, s_col)
        c_new = jnp.where(valid_c, c_new, c_col)
        ds = jnp.maximum(jnp.max(jnp.abs(s_new - s_col)),
                         jnp.max(jnp.abs(c_new - c_col))
                         / jnp.maximum(c_upper, 1e-30))
        return (s_new, c_new), ds

    def cond(carry):
        _, k, ds = carry
        return (k < max_sweeps) & (ds > tol)

    def body(carry):
        sc, k, _ = carry
        sc_new, ds = one_sweep(sc)
        return (sc_new, k + 1, ds)

    (s_cols, c_cols), sweeps, _ = jax.lax.while_loop(
        cond, body, ((s0, c0), jnp.asarray(0), jnp.asarray(jnp.inf)))

    tgt = jnp.where(valid_c, cc, s.shape[0]).ravel()
    s_out = s.at[tgt].set(s_cols.ravel(), mode="drop")
    c_out = c.at[tgt].set(c_cols.ravel(), mode="drop")
    return s_out, c_out, sweeps
