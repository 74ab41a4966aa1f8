"""Black-oil PVT: differentiable table evaluation.

Re-implements the property stack the reference reaches through
BlackoilPropsAdFromDeck (/root/reference/opm/autodiff/BlackoilPropsAdFromDeck.hpp:201-360:
muWat/muOil/muGas, bWat/bOil/bGas, rsSat/rvSat) on top of plain JAX
interpolation instead of opm-material template magic + hand-coded derivative
columns — derivatives come from jax AD.

Conventions (all SI):
  b_alpha = 1/B_alpha  (inverse formation-volume factor, surface/reservoir)
  rho_o = (rho_o_surf + rs*rho_g_surf) * b_o     (live oil)
  rho_g = (rho_g_surf + rv*rho_o_surf) * b_g     (wet gas)
Tables interpolate 1/B and 1/(B*mu) linearly in p (the standard ECLIPSE
convention, also used by opm-material's PvtDead/PvtLiveOil), so
mu = (1/B)/(1/(B*mu)).

Undersaturated PVTO/PVTG branches are resampled onto a dense rectangular
(record, delta-p) grid at construction; records without undersaturated data
borrow the relative pressure-variation of the nearest record that has it
(same fill-in idea as opm-material's PvtLiveOil table extension). The dense
grid makes evaluation a bilinear gather — regular memory access, TPU-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from opm_tpu.utils.tables import (interp, interp2, interp2_multi,
                                  reg_pick, reg_row)


def _pad_rows(arrs, ncol):
    """Stack per-region (n_i, ncol) tables into (nreg, nmax, ncol), repeating
    the last row (constant extrapolation is then harmless: equal abscissae
    are avoided by nudging)."""
    nmax = max(a.shape[0] for a in arrs)
    out = np.empty((len(arrs), nmax, ncol))
    for r, a in enumerate(arrs):
        out[r, : a.shape[0]] = a
        if a.shape[0] < nmax:
            last = a[-1].copy()
            for k in range(a.shape[0], nmax):
                last = last.copy()
                last[0] *= 1.0 + 1e-7  # keep abscissa strictly increasing
                out[r, k] = last
    return out


# ---------------------------------------------------------------------------
@dataclass
class WaterPVT:
    """PVTW: b_w and mu_w from reference values + compressibilities."""

    p_ref: jnp.ndarray      # (nreg,)
    b_ref: jnp.ndarray      # FVF at p_ref
    comp: jnp.ndarray
    mu_ref: jnp.ndarray
    viscosibility: jnp.ndarray

    @classmethod
    def from_tables(cls, recs):
        g = lambda k: jnp.asarray([r[k] for r in recs])
        return cls(g("p_ref"), g("b_ref"), g("comp"), g("mu_ref"),
                   g("viscosibility"))

    def b(self, p, reg=0):
        x = reg_pick(self.comp, reg) * (p - reg_pick(self.p_ref, reg))
        return (1.0 + x + 0.5 * x * x) / reg_pick(self.b_ref, reg)

    def mu(self, p, reg=0):
        y = (reg_pick(self.viscosibility, reg)
             * (p - reg_pick(self.p_ref, reg)))
        return reg_pick(self.mu_ref, reg) / (1.0 + y + 0.5 * y * y)


@dataclass
class ConstCompOilPVT:
    """PVCDO: dead oil with constant compressibility (same math as PVTW)."""

    p_ref: jnp.ndarray
    b_ref: jnp.ndarray
    comp: jnp.ndarray
    mu_ref: jnp.ndarray
    viscosibility: jnp.ndarray

    from_tables = classmethod(WaterPVT.from_tables.__func__)
    b = WaterPVT.b
    mu = WaterPVT.mu


@dataclass
class DeadPVT:
    """PVDO/PVDG: p -> (1/B, 1/(B mu)) tables, one per PVT region."""

    p: jnp.ndarray        # (nreg, n)
    inv_b: jnp.ndarray
    inv_bmu: jnp.ndarray

    @classmethod
    def from_tables(cls, tables):
        padded = _pad_rows(tables, 3)
        p = padded[..., 0]
        inv_b = 1.0 / padded[..., 1]
        inv_bmu = inv_b / padded[..., 2]
        return cls(jnp.asarray(p), jnp.asarray(inv_b), jnp.asarray(inv_bmu))

    def b(self, p, reg=0):
        return interp(reg_row(self.p, reg),
                      reg_row(self.inv_b, reg), p)

    def mu(self, p, reg=0):
        ib = interp(reg_row(self.p, reg),
                    reg_row(self.inv_b, reg), p)
        ibm = interp(reg_row(self.p, reg),
                     reg_row(self.inv_bmu, reg), p)
        return ib / ibm


@dataclass
class LiveOilPVT:
    """PVTO: live oil with dissolved gas rs.

    Saturated curve arrays (per region): rs_sat[i] <-> p_bub[i]; dense
    undersaturated grid over (record, dp = p - p_bub(rs)).
    """

    rs_tab: jnp.ndarray      # (nreg, nrec) saturated rs (increasing)
    pbub_tab: jnp.ndarray    # (nreg, nrec) bubble pressure
    dp_grid: jnp.ndarray     # (nreg, ndp) pressure offsets >= 0
    inv_b_grid: jnp.ndarray  # (nreg, nrec, ndp)
    inv_bmu_grid: jnp.ndarray

    @classmethod
    def from_tables(cls, regions):
        nreg = len(regions)
        nrec = max(len(recs) for recs in regions)
        # union dp grid per region
        reg_data = []
        max_ndp = 2
        for recs in regions:
            dps = {0.0}
            for rs, rows in recs:
                psat = rows[0, 0]
                for p in rows[1:, 0]:
                    dps.add(float(p - psat))
            dp = np.array(sorted(dps))
            if len(dp) == 1:
                dp = np.array([0.0, 1.0e5])
            max_ndp = max(max_ndp, len(dp))
            reg_data.append(dp)
        ndp = max_ndp

        rs_tab = np.zeros((nreg, nrec))
        pbub_tab = np.zeros((nreg, nrec))
        dp_grid = np.zeros((nreg, ndp))
        ib_grid = np.zeros((nreg, nrec, ndp))
        ibm_grid = np.zeros((nreg, nrec, ndp))

        for r, recs in enumerate(regions):
            dp = reg_data[r]
            if len(dp) < ndp:
                extra = dp[-1] + np.arange(1, ndp - len(dp) + 1) * max(dp[-1], 1e5)
                dp = np.concatenate([dp, extra])
            dp_grid[r] = dp
            n = len(recs)
            # per-record raw interpolants of inv_b, inv_bmu on dp
            rel_ib = np.ones((n, ndp))
            rel_ibm = np.ones((n, ndp))
            has_usat = np.zeros(n, dtype=bool)
            for i, (rs, rows) in enumerate(recs):
                rs_tab[r, i] = rs
                pbub_tab[r, i] = rows[0, 0]
                ib0 = 1.0 / rows[0, 1]
                ibm0 = ib0 / rows[0, 2]
                ib_grid[r, i, 0] = ib0
                ibm_grid[r, i, 0] = ibm0
                if rows.shape[0] > 1:
                    has_usat[i] = True
                    d = rows[:, 0] - rows[0, 0]
                    ib = 1.0 / rows[:, 1]
                    ibm = ib / rows[:, 2]
                    rel_ib[i] = np.interp(dp, d, ib / ib0)
                    rel_ibm[i] = np.interp(dp, d, ibm / ibm0)
            # donor: nearest record with undersaturated data (prefer higher rs)
            donors = np.nonzero(has_usat)[0]
            for i in range(n):
                if has_usat[i]:
                    src = i
                elif len(donors):
                    src = donors[np.argmin(np.abs(donors - i))]
                else:
                    src = None
                if src is None:
                    # no undersaturated info at all: constant compressibility 0
                    ib_grid[r, i, :] = ib_grid[r, i, 0]
                    ibm_grid[r, i, :] = ibm_grid[r, i, 0]
                else:
                    ib_grid[r, i, :] = ib_grid[r, i, 0] * rel_ib[src]
                    ibm_grid[r, i, :] = ibm_grid[r, i, 0] * rel_ibm[src]
            # pad missing records by repeating the last with nudged rs
            for i in range(n, nrec):
                rs_tab[r, i] = rs_tab[r, n - 1] * (1 + 1e-7 * (i - n + 1))
                pbub_tab[r, i] = pbub_tab[r, n - 1] * (1 + 1e-7 * (i - n + 1))
                ib_grid[r, i] = ib_grid[r, n - 1]
                ibm_grid[r, i] = ibm_grid[r, n - 1]

        return cls(jnp.asarray(rs_tab), jnp.asarray(pbub_tab),
                   jnp.asarray(dp_grid), jnp.asarray(ib_grid),
                   jnp.asarray(ibm_grid))

    def rs_sat(self, p, reg=0):
        """Saturated (maximum) dissolved gas-oil ratio at pressure p
        (BlackoilPropsAdFromDeck::rsSat)."""
        return interp(reg_row(self.pbub_tab, reg),
                      reg_row(self.rs_tab, reg), p)

    def p_bub(self, rs, reg=0):
        return interp(reg_row(self.rs_tab, reg),
                      reg_row(self.pbub_tab, reg), rs)

    def _grids(self, p, rs, reg):
        pb = self.p_bub(rs, reg)
        dp = jnp.maximum(p - pb, 0.0)
        # one shared-mask pass for both grids (interp2_multi; the
        # separate-einsum form serialized as f64 while loops on TPU)
        ib, ibm = interp2_multi(
            reg_row(self.rs_tab, reg), reg_row(self.dp_grid, reg),
            [reg_row(self.inv_b_grid, reg),
             reg_row(self.inv_bmu_grid, reg)], rs, dp)
        return ib, ibm

    def b(self, p, rs, reg=0):
        return self._grids(p, rs, reg)[0]

    def mu(self, p, rs, reg=0):
        ib, ibm = self._grids(p, rs, reg)
        return ib / ibm


@dataclass
class WetGasPVT:
    """PVTG: wet gas with vaporized oil rv.

    Records are indexed by gas pressure; within a record, rows vary rv
    downward from the saturated rv. Dense grid over (pressure record,
    drv = rv_sat(p) - rv).
    """

    pg_tab: jnp.ndarray      # (nreg, nrec)
    rv_sat_tab: jnp.ndarray  # (nreg, nrec) saturated rv at pg
    drv_grid: jnp.ndarray    # (nreg, ndrv) >= 0
    inv_b_grid: jnp.ndarray  # (nreg, nrec, ndrv)
    inv_bmu_grid: jnp.ndarray

    @classmethod
    def from_tables(cls, regions):
        nreg = len(regions)
        nrec = max(len(recs) for recs in regions)
        reg_drv = []
        max_nd = 2
        for recs in regions:
            ds = {0.0}
            for pg, rows in recs:
                rvsat = rows[0, 0]
                for rv in rows[1:, 0]:
                    ds.add(float(rvsat - rv))
            d = np.array(sorted(ds))
            if len(d) == 1:
                d = np.array([0.0, max(1e-6, 1.0)])
            max_nd = max(max_nd, len(d))
            reg_drv.append(d)
        nd = max_nd

        pg_tab = np.zeros((nreg, nrec))
        rv_tab = np.zeros((nreg, nrec))
        drv_grid = np.zeros((nreg, nd))
        ib_grid = np.zeros((nreg, nrec, nd))
        ibm_grid = np.zeros((nreg, nrec, nd))
        for r, recs in enumerate(regions):
            d = reg_drv[r]
            if len(d) < nd:
                extra = d[-1] + np.arange(1, nd - len(d) + 1) * max(d[-1], 1e-3)
                d = np.concatenate([d, extra])
            drv_grid[r] = d
            n = len(recs)
            rel_ib = np.ones((n, nd))
            rel_ibm = np.ones((n, nd))
            has = np.zeros(n, dtype=bool)
            for i, (pg, rows) in enumerate(recs):
                pg_tab[r, i] = pg
                rv_tab[r, i] = rows[0, 0]
                ib0 = 1.0 / rows[0, 1]
                ibm0 = ib0 / rows[0, 2]
                ib_grid[r, i, 0] = ib0
                ibm_grid[r, i, 0] = ibm0
                if rows.shape[0] > 1:
                    has[i] = True
                    dd = rows[0, 0] - rows[:, 0]
                    ib = 1.0 / rows[:, 1]
                    ibm = ib / rows[:, 2]
                    order = np.argsort(dd)
                    rel_ib[i] = np.interp(d, dd[order], (ib / ib0)[order])
                    rel_ibm[i] = np.interp(d, dd[order], (ibm / ibm0)[order])
            donors = np.nonzero(has)[0]
            for i in range(n):
                src = i if has[i] else (donors[np.argmin(np.abs(donors - i))]
                                        if len(donors) else None)
                if src is None:
                    ib_grid[r, i, :] = ib_grid[r, i, 0]
                    ibm_grid[r, i, :] = ibm_grid[r, i, 0]
                else:
                    ib_grid[r, i, :] = ib_grid[r, i, 0] * rel_ib[src]
                    ibm_grid[r, i, :] = ibm_grid[r, i, 0] * rel_ibm[src]
            for i in range(n, nrec):
                pg_tab[r, i] = pg_tab[r, n - 1] * (1 + 1e-7 * (i - n + 1))
                rv_tab[r, i] = rv_tab[r, n - 1]
                ib_grid[r, i] = ib_grid[r, n - 1]
                ibm_grid[r, i] = ibm_grid[r, n - 1]
        return cls(jnp.asarray(pg_tab), jnp.asarray(rv_tab),
                   jnp.asarray(drv_grid), jnp.asarray(ib_grid),
                   jnp.asarray(ibm_grid))

    def rv_sat(self, p, reg=0):
        return interp(reg_row(self.pg_tab, reg),
                      reg_row(self.rv_sat_tab, reg), p)

    def _grids(self, p, rv, reg):
        rvs = self.rv_sat(p, reg)
        drv = jnp.maximum(rvs - rv, 0.0)
        ib, ibm = interp2_multi(
            reg_row(self.pg_tab, reg), reg_row(self.drv_grid, reg),
            [reg_row(self.inv_b_grid, reg),
             reg_row(self.inv_bmu_grid, reg)], p, drv)
        return ib, ibm

    def b(self, p, rv, reg=0):
        return self._grids(p, rv, reg)[0]

    def mu(self, p, rv, reg=0):
        ib, ibm = self._grids(p, rv, reg)
        return ib / ibm


@dataclass
class RockPVT:
    """ROCK: pore-volume multiplier vs pressure (quadratic expansion of
    exp(c (p - p_ref)), as in opm-material RockCompressibility)."""

    p_ref: jnp.ndarray
    comp: jnp.ndarray

    @classmethod
    def from_tables(cls, recs):
        return cls(jnp.asarray([r["p_ref"] for r in recs]),
                   jnp.asarray([r["comp"] for r in recs]))

    def pv_mult(self, p, reg=0):
        x = reg_pick(self.comp, reg) * (p - reg_pick(self.p_ref, reg))
        return 1.0 + x + 0.5 * x * x

    def trans_mult(self, p, reg=0):
        return jnp.ones_like(p)


@dataclass
class RockTabPVT:
    """ROCKTAB: tabulated pore-volume AND transmissibility multipliers vs
    pressure per ROCKNUM region (the reference's RockCompressibility
    poroMult/transMult, opm/core/props/rock/RockCompressibility.cpp)."""

    p: jnp.ndarray          # (nreg, n)
    pv_m: jnp.ndarray       # (nreg, n)
    tr_m: jnp.ndarray       # (nreg, n)

    @classmethod
    def from_tables(cls, tabs):
        a = _pad_rows(tabs, 3)
        return cls(p=jnp.asarray(a[..., 0]), pv_m=jnp.asarray(a[..., 1]),
                   tr_m=jnp.asarray(a[..., 2]))

    def pv_mult(self, p, reg=0):
        from opm_tpu.utils.tables import interp
        return interp(reg_row(self.p, reg),
                      reg_row(self.pv_m, reg), p)

    def trans_mult(self, p, reg=0):
        from opm_tpu.utils.tables import interp
        return interp(reg_row(self.p, reg),
                      reg_row(self.tr_m, reg), p)
