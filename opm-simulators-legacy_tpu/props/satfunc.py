"""Relative permeability and capillary pressure from SWOF/SGOF (or
SWFN/SGFN/SOF3) tables.

Replaces the reference's SaturationPropsFromDeck / MaterialLawManager stack
(/root/reference/opm/core/props/satfunc/, consumed through
BlackoilPropsAdFromDeck::relperm/capPress at BlackoilPropsAdFromDeck.hpp:305-330)
with stacked per-SATNUM-region tables evaluated by differentiable linear
interpolation. Three-phase oil relperm uses the ECLIPSE default model
(saturation-weighted interpolation between krow and krog):

    kro = ((sw - swco) * krow(sw) + sg * krog(sg)) / (sw - swco + sg)

which is opm-material's EclDefaultMaterial law (the reference's default).
Capillary sign conventions: pcow = po - pw (SWOF col 4), pcgo = pg - po
(SGOF col 4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from opm_tpu.props.pvt import _pad_rows
from opm_tpu.utils.tables import interp, reg_pick


@dataclass
class SatFuncFamily1:
    """SWOF + SGOF (family 1)."""

    # SWOF columns per region
    sw: jnp.ndarray      # (nreg, n)
    krw: jnp.ndarray
    krow: jnp.ndarray
    pcow: jnp.ndarray
    # SGOF columns per region
    sg: jnp.ndarray
    krg: jnp.ndarray
    krog: jnp.ndarray
    pcgo: jnp.ndarray
    swco: jnp.ndarray    # (nreg,) connate water
    swcr_: jnp.ndarray   # critical water (last sw with krw == 0)
    sgcr_: jnp.ndarray
    sowcr_: jnp.ndarray  # critical oil-in-water
    sogcr_: jnp.ndarray
    smax_w: jnp.ndarray  # max sw in table
    sgmax: jnp.ndarray   # max sg in table
    krw_tab_max: jnp.ndarray   # (nreg,) table kr maxima (vertical scaling)
    kro_tab_max: jnp.ndarray
    krg_tab_max: jnp.ndarray
    has_gas: bool = True
    has_water: bool = True
    eps: Optional["EndpointScaling"] = None  # per-cell endpoint scaling
    # per-cell pcow multiplier (SWATINIT capillary scaling,
    # BlackoilPropsAdFromDeck::setSwatInitScaling)
    pcw_mult: Optional[jnp.ndarray] = None
    # gas-kr hysteresis (EHYSTR + IMBNUM; the reference's updateSatHyst /
    # opm-material EclHysteresisTwoPhaseLaw Killough model)
    hyst: Optional["HysteresisConfig"] = None

    @classmethod
    def from_tables(cls, swof_tables, sgof_tables):
        if swof_tables is not None:
            swof = _pad_rows(swof_tables, 4)
        else:
            # gas-oil only: trivial water table
            nreg = len(sgof_tables)
            swof = np.zeros((nreg, 2, 4))
            swof[:, 1, 0] = 1.0
            swof[:, 1, 1] = 1.0
            swof[:, 0, 2] = 1.0
        if sgof_tables is not None:
            sgof = _pad_rows(sgof_tables, 4)
        else:
            nreg = swof.shape[0]
            sgof = np.zeros((nreg, 2, 4))
            sgof[:, 1, 0] = 1.0
            sgof[:, 1, 1] = 1.0
            sgof[:, 0, 2] = 1.0

        swco = swof[:, 0, 0]

        def crit(s, kr):
            """Largest saturation with kr == 0 (per region)."""
            out = np.zeros(s.shape[0])
            for r in range(s.shape[0]):
                zero = np.nonzero(kr[r] <= 0.0)[0]
                out[r] = s[r, zero[-1]] if len(zero) else s[r, 0]
            return out

        swcr = crit(swof[..., 0], swof[..., 1])
        sgcr = crit(sgof[..., 0], sgof[..., 1])
        # critical oil: largest so with krow/krog == 0, scanning from high sw/sg
        sowcr = np.zeros(swof.shape[0])
        sogcr = np.zeros(sgof.shape[0])
        for r in range(swof.shape[0]):
            nz = np.nonzero(swof[r, :, 2] <= 0.0)[0]
            sowcr[r] = 1.0 - swof[r, nz[0], 0] if len(nz) else 0.0
            nzg = np.nonzero(sgof[r, :, 2] <= 0.0)[0]
            sogcr[r] = (1.0 - sgof[r, nzg[0], 0] - swco[r]) if len(nzg) else 0.0

        J = jnp.asarray
        return cls(
            sw=J(swof[..., 0]), krw=J(swof[..., 1]), krow=J(swof[..., 2]),
            pcow=J(swof[..., 3]),
            sg=J(sgof[..., 0]), krg=J(sgof[..., 1]), krog=J(sgof[..., 2]),
            pcgo=J(sgof[..., 3]),
            swco=J(swco), swcr_=J(swcr), sgcr_=J(sgcr), sowcr_=J(sowcr),
            sogcr_=J(sogcr), smax_w=J(swof[:, -1, 0]),
            sgmax=J(sgof[:, -1, 0]),
            krw_tab_max=J(swof[..., 1].max(axis=1)),
            kro_tab_max=J(swof[..., 2].max(axis=1)),
            krg_tab_max=J(sgof[..., 1].max(axis=1)),
            has_gas=sgof_tables is not None,
            has_water=swof_tables is not None,
        )

    @classmethod
    def from_case(cls, case):
        t = case.tables
        if "SWOF" in t or "SGOF" in t:
            return cls.from_tables(t.get("SWOF"), t.get("SGOF"))
        if "SWFN" in t or "SGFN" in t:
            return cls.from_family2(t.get("SWFN"), t.get("SGFN"),
                                    t.get("SOF3"), t.get("SOF2"))
        return None

    @classmethod
    def from_family2(cls, swfn, sgfn, sof3, sof2=None):
        """Family-2 keywords (SWFN/SGFN + SOF3/SOF2): resample the oil
        relperm (tabulated over So) onto the water/gas saturation axes so
        the evaluation path is shared with family 1."""
        nreg = len(swfn) if swfn else len(sgfn)
        swof_tabs = []
        sgof_tabs = []
        for r in range(nreg):
            sw_tab = np.asarray(swfn[r]) if swfn else \
                np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 0.0]])
            sg_tab = np.asarray(sgfn[r]) if sgfn else \
                np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 0.0]])
            swco = sw_tab[0, 0]
            if sof3 is not None:
                so = np.asarray(sof3[r])[:, 0]
                krow_of_so = np.asarray(sof3[r])[:, 1]
                krog_of_so = np.asarray(sof3[r])[:, 2]
            else:
                so = np.asarray(sof2[r])[:, 0]
                krow_of_so = krog_of_so = np.asarray(sof2[r])[:, 1]
            # krow on the sw axis: so = 1 - sw (no gas)
            krow = np.interp(1.0 - sw_tab[:, 0], so, krow_of_so,
                             left=krow_of_so[0], right=krow_of_so[-1])
            # krog on the sg axis: so = 1 - sg - swco (connate water present)
            krog = np.interp(1.0 - sg_tab[:, 0] - swco, so, krog_of_so,
                             left=krog_of_so[0], right=krog_of_so[-1])
            swof_tabs.append(np.column_stack(
                [sw_tab[:, 0], sw_tab[:, 1], krow, sw_tab[:, 2]]))
            sgof_tabs.append(np.column_stack(
                [sg_tab[:, 0], sg_tab[:, 1], krog, sg_tab[:, 2]]))
        return cls.from_tables(swof_tabs, sgof_tabs)

    # -- evaluation; reg is an int array broadcastable with saturations -----

    def _scaled_sats(self, sw, sg, reg):
        """Cell -> table saturation mapping under two-point EPS."""
        if self.eps is None:
            return sw, sg
        e = self.eps
        sw_t = sw
        sg_t = sg
        if e.swl is not None or e.swu is not None:
            lo_c = (e.swl if e.swl is not None
                    else reg_pick(self.swco, reg))
            hi_c = (e.swu if e.swu is not None
                    else reg_pick(self.smax_w, reg))
            sw_t = two_point_scale(sw, lo_c, hi_c,
                                   reg_pick(self.swco, reg),
                                   reg_pick(self.smax_w, reg))
        if e.sgl is not None or e.sgu is not None:
            sgl_tab = reg_pick(self.sg[:, 0], reg)
            lo_c = e.sgl if e.sgl is not None else sgl_tab
            hi_c = (e.sgu if e.sgu is not None
                    else reg_pick(self.sgmax, reg))
            sg_t = two_point_scale(sg, lo_c, hi_c, sgl_tab,
                                   reg_pick(self.sgmax, reg))
        return sw_t, sg_t

    def relperm(self, sw, so, sg, reg, sgmax=None, ireg=None, somax=None):
        """(krw, kro, krg) with ECL-default three-phase oil interpolation
        and optional endpoint scaling. With hysteresis configured
        (EHYSTR + IMBNUM; the reference's updateSatHyst hooks at
        BlackoilPropsAdFromDeck.hpp:360-430) the NONWETTING-phase curves
        follow scanning curves between the drainage (SATNUM) and
        imbibition (IMBNUM) tables — Killough (EHYSTR item 2 = 2/3) or
        Carlson (item 2 = 0/1): krg from the per-cell historical maximum
        gas saturation `sgmax`, krow (oil in the oil-water pair) from
        the historical maximum oil saturation `somax`. The wetting phase
        (water) follows its bounding drainage curve, the reference
        default."""
        sw_t, sg_t = self._scaled_sats(sw, sg, reg)
        krw = _interp_reg(self.sw, self.krw, sw_t, reg)
        krg = _interp_reg(self.sg, self.krg, sg_t, reg)
        if self.hyst is not None and sgmax is not None:
            krg = self._krg_scan(sg_t, sgmax, reg, krg, ireg)
        krow = _interp_reg(self.sw, self.krow, sw_t, reg)
        if self.hyst is not None and somax is not None:
            krow = self._krow_scan(sw_t, somax, reg, krow, ireg)
        krog = _interp_reg(self.sg, self.krog, sg_t, reg)
        if self.eps is not None:
            e = self.eps
            if e.krw_max is not None:
                krw = krw * e.krw_max / jnp.maximum(
                    reg_pick(self.krw_tab_max, reg), 1e-30)
            if e.krg_max is not None:
                krg = krg * e.krg_max / jnp.maximum(
                    reg_pick(self.krg_tab_max, reg), 1e-30)
            if e.kro_max is not None:
                scale_o = e.kro_max / jnp.maximum(
                    reg_pick(self.kro_tab_max, reg), 1e-30)
                krow = krow * scale_o
                krog = krog * scale_o
        swco = (self.eps.swl if self.eps is not None
                and self.eps.swl is not None
                else reg_pick(self.swco, reg))
        ssw = jnp.maximum(sw - swco, 0.0)
        den = ssw + sg
        safe = den > 1e-12
        kro = jnp.where(
            safe, (ssw * krow + sg * krog) / jnp.where(safe, den, 1.0), krow)
        # an absent phase has zero mobility: the ECL-default interpolation
        # can give kro > 0 at so <= 0 when sw sits slightly above connate
        # (krow-weighted term), which exports NONEXISTENT oil from dry-gas
        # cells — in a gas-condensate column that bleeds rv negative and
        # deadlocks Newton at the rv >= 0 bound. Same guard for krg/krw.
        kro = jnp.where(so > 0.0, kro, 0.0)
        krg = jnp.where(sg > 0.0, krg, 0.0)
        krw = jnp.where(sw > 0.0, krw, 0.0)
        return krw, kro, krg

    def _scan_nonwet(self, xs, ys, s, smax, reg, ireg, kr_drain,
                     scr_tab, stab_max_tab):
        """Nonwetting-phase kr scanning curve between the drainage (reg)
        and imbibition (ireg) bounding curves (opm-material
        EclHysteresisTwoPhaseLaw semantics). xs/ys: (nreg, n) stacked
        tables in the nonwetting saturation coordinate; s the current
        saturation, smax the per-cell historical maximum (the reversal
        point, updated per report step like the reference's
        updateSatHyst).

        Killough 1976 (EHYSTR item 2 = 2/3): Land trapping from the
        drainage/imbibition critical saturations; scanning curve =
        imbibition curve renormalized onto [s_trap, smax] and scaled to
        meet the drainage curve at the historical maximum.
        Carlson (item 2 = 0/1): scanning curve = imbibition curve
        shifted horizontally to pass through (smax, kr_drain(smax));
        trapping falls out of where the shifted curve hits zero."""
        if ireg is None:
            ireg = self.hyst.imbnum   # full-cell context only
        scr_d = reg_pick(scr_tab, reg)
        scr_i = reg_pick(scr_tab, ireg)  # max trapped, imbibition curve
        s_tab_max = reg_pick(stab_max_tab, reg)
        kr_d_at_max = _interp_reg(xs, ys, smax, reg)
        if self.hyst.kr_model in (2, 3):
            # Land parameter from the bounding curves
            span_t = jnp.maximum(scr_i - scr_d, 1e-12)
            span_m = jnp.maximum(s_tab_max - scr_d, 1e-12)
            C = 1.0 / span_t - 1.0 / span_m
            ds = jnp.maximum(smax - scr_d, 0.0)
            s_trap = scr_d + ds / (1.0 + C * ds)
            # normalize [s_trap, smax] -> imbibition axis [scr_i, s_tab_max]
            span_h = jnp.maximum(smax - s_trap, 1e-12)
            s_norm = scr_i + jnp.maximum(s - s_trap, 0.0) * \
                (s_tab_max - scr_i) / span_h
            kr_i = _interp_reg(xs, ys, s_norm, ireg)
            # scale so the scanning curve meets drainage at smax
            kr_i_top = jnp.maximum(
                _interp_reg(xs, ys, s_tab_max, ireg), 1e-12)
            kr_scan = kr_i * kr_d_at_max / kr_i_top
        else:
            # Carlson: shift = kr_imb^{-1}(kr_drain(smax)) - smax, so the
            # shifted imbibition curve passes through the reversal point
            s_at_kr = _interp_reg(ys, xs, kr_d_at_max, ireg)
            shift = s_at_kr - smax
            kr_scan = _interp_reg(xs, ys, s + shift, ireg)
        kr_scan = jnp.clip(kr_scan, 0.0, None)
        # on the drainage branch (s at the historical max) keep drainage
        on_drainage = s >= smax - 1e-12
        return jnp.where(on_drainage, kr_drain, kr_scan)

    def _krg_scan(self, sg, sgmax, reg, krg_drain, ireg=None):
        return self._scan_nonwet(self.sg, self.krg, sg, sgmax, reg, ireg,
                                 krg_drain, self.sgcr_, self.sgmax)

    def _krow_scan(self, sw, somax, reg, krow_drain, ireg=None):
        """Oil (nonwetting in the oil-water pair) kr scanning, keyed on
        the historical maximum oil saturation. krow is tabulated against
        sw; the scanning coordinate is the pair oil saturation
        so = 1 - sw, so the table is evaluated on the flipped axis."""
        xs = jnp.flip(1.0 - self.sw, axis=-1)     # increasing so axis
        ys = jnp.flip(self.krow, axis=-1)
        so = 1.0 - sw
        so_tab_max = 1.0 - self.sw[:, 0]          # (nreg,) max pair-so
        return self._scan_nonwet(xs, ys, so, somax, reg, ireg,
                                 krow_drain, self.sowcr_, so_tab_max)

    def capillary(self, sw, sg, reg, somax=None, ireg=None):
        """(pcow, pcgo): po - pw and pg - po (EPS-scaled abscissae,
        SWATINIT pcow multiplier). With pc hysteresis enabled (EHYSTR
        item 2 even) pcow follows the Killough curvature-parameter
        scanning curve between the drainage (SATNUM) and imbibition
        (IMBNUM) bounding curves, anchored at the reversal water
        saturation sw_hy = 1 - somax (the oil-water-pair view of the
        historical max oil saturation):
            F = (1/(sw-sw_hy+E) - 1/E) / (1/(sw_ma-sw_hy+E) - 1/E)
            pc = pc_drain + F * (pc_imb - pc_drain)
        with E the EHYSTR item 1 curvature parameter (Killough 1976)."""
        sw_t, sg_t = self._scaled_sats(sw, sg, reg)
        pcow = _interp_reg(self.sw, self.pcow, sw_t, reg)
        pcgo = _interp_reg(self.sg, self.pcgo, sg_t, reg)
        if (self.hyst is not None and self.hyst.pc_hyst
                and somax is not None):
            if ireg is None:
                ireg = self.hyst.imbnum
            pcow_i = _interp_reg(self.sw, self.pcow, sw_t, ireg)
            sw_ma = reg_pick(self.smax_w, reg)
            sw_hy = jnp.clip(1.0 - somax, reg_pick(self.swco, reg), sw_ma)
            E = self.hyst.curvature
            num = 1.0 / (jnp.maximum(sw_t - sw_hy, 0.0) + E) - 1.0 / E
            den = 1.0 / (jnp.maximum(sw_ma - sw_hy, 1e-12) + E) - 1.0 / E
            F = jnp.clip(num / jnp.where(den == 0, 1.0, den), 0.0, 1.0)
            pcow = pcow + F * (pcow_i - pcow)
        if self.pcw_mult is not None:
            pcow = pcow * self.pcw_mult
        return pcow, pcgo

    def local_view(self, idx):
        """Satfunc view whose per-CELL arrays (SWATINIT pcow multiplier,
        ENDSCALE endpoint-scaling fields) are gathered at `idx`, so the
        evaluation path can be fed saturations of shape idx.shape instead
        of (nc,). Region tables are shared (region indices are passed per
        call). Used by the perf-local well property evaluation
        (models/blackoil.py well_cell_quantities_local); without this any
        SWATINIT/ENDSCALE deck with wells hits a (nperf,) vs (nc,)
        broadcast error."""
        import dataclasses as _dc
        if self.eps is None and self.pcw_mult is None:
            return self
        eps = self.eps
        if eps is not None:
            eps = _dc.replace(eps, **{
                f.name: (getattr(eps, f.name)[idx]
                         if getattr(eps, f.name) is not None else None)
                for f in _dc.fields(eps)})
        pcw = self.pcw_mult[idx] if self.pcw_mult is not None else None
        return _dc.replace(self, eps=eps, pcw_mult=pcw)

    # endpoint queries used by init / well logic
    def connate_water(self, reg):
        return reg_pick(self.swco, reg)

    def pcow_inverse(self, pc, reg):
        """sw(pcow) — equilibration capillary inversion
        (EquilibrationHelpers.hpp satFromPc). pcow is non-increasing in sw,
        so interpolate on the negated curve (increasing)."""
        return _interp_reg(-self.pcow, self.sw, -pc, reg)


@dataclass
class HysteresisConfig:
    """EHYSTR + IMBNUM (the reference's hysteresis wiring in
    BlackoilPropsAdFromDeck::updateSatHyst + MaterialLawManager /
    opm-material EclHysteresisConfig). imbnum is the per-cell 0-based
    imbibition table index (into the same stacked table arrays as
    SATNUM). EHYSTR record 1: item 1 = pc-scanning curvature parameter
    (Killough), item 2 = model flag: 0/1 Carlson nonwetting kr, 2/3
    Killough nonwetting kr; even values also enable pc hysteresis."""

    imbnum: jnp.ndarray          # (nc,) int
    curvature: float = 0.1       # EHYSTR item 1
    kr_model: int = 2            # default Killough for direct construction
    pc_hyst: bool = False

    @classmethod
    def from_case(cls, case, global_cell):
        names = [kw.name for kw in case.deck]
        if "EHYSTR" not in names:
            return None
        imb = case.regions.get("IMBNUM")
        if imb is None:
            return None
        rec = next(kw.records[0] if kw.records else []
                   for kw in case.deck if kw.name == "EHYSTR")
        curv = _hyst_val(rec, 0, 0.1)
        model = int(_hyst_val(rec, 1, 0))
        return cls(imbnum=jnp.asarray((imb[global_cell] - 1)
                                      .astype("int32")),
                   curvature=float(curv), kr_model=model,
                   pc_hyst=model in (0, 2))


@dataclass
class EndpointScaling:
    """Two-point horizontal + vertical endpoint scaling (ENDSCALE +
    SWL/SWCR/SWU/SGL/SGU/SOWCR/SOGCR/KRW/KRO/KRG arrays — the reference's
    EPS layer in SaturationPropsFromDeck, tested by tests/test_satfunc.cpp
    satfuncEPS_* fixtures). Per-cell arrays; None = unscaled."""

    swl: Optional[jnp.ndarray] = None    # scaled connate water
    swu: Optional[jnp.ndarray] = None    # scaled max water
    sgl: Optional[jnp.ndarray] = None
    sgu: Optional[jnp.ndarray] = None
    krw_max: Optional[jnp.ndarray] = None  # vertical scaling
    kro_max: Optional[jnp.ndarray] = None
    krg_max: Optional[jnp.ndarray] = None

    @classmethod
    def from_case(cls, case, global_cell):
        ga = case.grid_arrays
        if "ENDSCALE" not in [kw.name for kw in case.deck]:
            return None

        def grab(name):
            return (jnp.asarray(ga[name][global_cell]) if name in ga
                    else None)

        obj = cls(swl=grab("SWL"), swu=grab("SWU"), sgl=grab("SGL"),
                  sgu=grab("SGU"), krw_max=grab("KRW"),
                  kro_max=grab("KRO"), krg_max=grab("KRG"))
        if all(getattr(obj, f) is None for f in
               ("swl", "swu", "sgl", "sgu", "krw_max", "kro_max",
                "krg_max")):
            return None
        return obj


def _hyst_val(rec, i, default):
    """EHYSTR record item with ECLIPSE defaulting (DEFAULT sentinel or
    short record -> default)."""
    from opm_tpu.io.deck import DEFAULT
    if rec is None or i >= len(rec) or rec[i] is DEFAULT:
        return default
    return rec[i]


def two_point_scale(s, s_lo_cell, s_hi_cell, s_lo_tab, s_hi_tab):
    """Map the cell saturation onto the table's saturation axis:
    s_tab = s_lo_tab + (s - s_lo_cell) (s_hi_tab - s_lo_tab) /
            (s_hi_cell - s_lo_cell)."""
    span_cell = jnp.maximum(s_hi_cell - s_lo_cell, 1e-12)
    return s_lo_tab + (s - s_lo_cell) * (s_hi_tab - s_lo_tab) / span_cell


def _interp_reg(xs_tab, ys_tab, x, reg):
    """Per-element table selection: xs_tab (nreg, n), reg broadcast with x.
    Single-region stacks skip the gather (TPU tile-padding of the
    constant-folded (nc, n) literal — see utils.tables.reg_row); small
    region counts evaluate every region's gather-free interp and
    where-select (O(nreg) VPU work beats an nc-sized row gather)."""
    from opm_tpu.utils.tables import interp
    if xs_tab.shape[0] == 1:
        return interp(xs_tab[0], ys_tab[0], x, extrap="clamp")
    if xs_tab.shape[0] <= 4:
        out = interp(xs_tab[0], ys_tab[0], x, extrap="clamp")
        for k in range(1, xs_tab.shape[0]):
            out = jnp.where(reg == k,
                            interp(xs_tab[k], ys_tab[k], x,
                                   extrap="clamp"), out)
        return out
    xs = xs_tab[reg]          # (..., n)
    ys = ys_tab[reg]
    n = xs.shape[-1]
    i = jnp.clip(jnp.sum(xs <= x[..., None], axis=-1) - 1, 0, n - 2)
    x0 = jnp.take_along_axis(xs, i[..., None], axis=-1)[..., 0]
    x1 = jnp.take_along_axis(xs, (i + 1)[..., None], axis=-1)[..., 0]
    y0 = jnp.take_along_axis(ys, i[..., None], axis=-1)[..., 0]
    y1 = jnp.take_along_axis(ys, (i + 1)[..., None], axis=-1)[..., 0]
    t = jnp.clip((x - x0) / jnp.maximum(x1 - x0, 1e-300), 0.0, 1.0)
    return y0 * (1.0 - t) + y1 * t
