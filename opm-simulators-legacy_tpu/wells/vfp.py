"""Vertical-flow-performance (VFP) tables: THP <-> BHP.

Re-implements the reference's VFP stack
(/root/reference/opm/autodiff/VFPProdPropertiesLegacy.hpp,
VFPInjPropertiesLegacy.hpp, VFPHelpersLegacy.hpp): 5-D (prod) / 2-D (inj)
multilinear interpolation of BHP(thp, wfr, gfr, alq, flo), differentiable in
the rates so THP control equations participate in the Newton Jacobian.

Tables are padded and stacked so a whole well set evaluates with one gather
(table id per well) — no per-well branching.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

import jax

from opm_tpu.models.state import GAS, OIL, WATER

# flo/wfr/gfr type codes
FLO_OIL, FLO_LIQ, FLO_GAS = 0, 1, 2
WFR_WOR, WFR_WCT, WFR_WGR = 0, 1, 2
GFR_GOR, GFR_GLR, GFR_OGR = 0, 1, 2


def _axis_interp_weights(axis, x):
    n = axis.shape[0]
    i = jnp.clip(jnp.searchsorted(axis, x, side="right") - 1, 0, n - 2)
    t = (x - axis[i]) / jnp.where(axis[i + 1] == axis[i], 1.0,
                                  axis[i + 1] - axis[i])
    return i, jnp.clip(t, 0.0, 1.0)


@dataclass
class VFPProdTable:
    table_id: int
    datum_depth: float
    flo_type: int
    wfr_type: int
    gfr_type: int
    flo: jnp.ndarray     # (nflo,)
    thp: jnp.ndarray     # (nthp,)
    wfr: jnp.ndarray
    gfr: jnp.ndarray
    alq: jnp.ndarray
    bhp: jnp.ndarray     # (nthp, nwfr, ngfr, nalq, nflo)

    def eval(self, flo, thp, wfr, gfr, alq):
        """Multilinear interpolation; broadcasts over inputs."""
        axes = (self.thp, self.wfr, self.gfr, self.alq, self.flo)
        xs = (thp, wfr, gfr, alq, flo)
        idx = []
        ts = []
        for a, x in zip(axes, xs):
            i, t = _axis_interp_weights(a, x)
            idx.append(i)
            ts.append(t)
        out = 0.0
        for corner in range(32):
            w = 1.0
            ii = []
            for d in range(5):
                hi = (corner >> d) & 1
                ii.append(idx[d] + hi)
                w = w * jnp.where(hi, ts[d], 1.0 - ts[d])
            out = out + w * self.bhp[tuple(ii)]
        return out

    def flo_value(self, qs):
        """Extract the table's FLO coordinate from signed surface rates
        (production negative)."""
        prod = jnp.maximum(-qs, 0.0)
        if self.flo_type == FLO_OIL:
            return prod[..., OIL]
        if self.flo_type == FLO_LIQ:
            return prod[..., OIL] + prod[..., WATER]
        return prod[..., GAS]

    def wfr_value(self, qs):
        prod = jnp.maximum(-qs, 0.0)
        o, w, g = prod[..., OIL], prod[..., WATER], prod[..., GAS]
        if self.wfr_type == WFR_WOR:
            return w / jnp.maximum(o, 1e-12)
        if self.wfr_type == WFR_WCT:
            return w / jnp.maximum(o + w, 1e-12)
        return w / jnp.maximum(g, 1e-12)

    def gfr_value(self, qs):
        prod = jnp.maximum(-qs, 0.0)
        o, w, g = prod[..., OIL], prod[..., WATER], prod[..., GAS]
        if self.gfr_type == GFR_GOR:
            return g / jnp.maximum(o, 1e-12)
        if self.gfr_type == GFR_GLR:
            return g / jnp.maximum(o + w, 1e-12)
        return o / jnp.maximum(g, 1e-12)

    def bhp_at(self, qs, thp, alq=0.0):
        return self.eval(self.flo_value(qs), thp, self.wfr_value(qs),
                         self.gfr_value(qs), alq)

    def thp_at(self, qs, bhp, alq=0.0, *, n=64):
        """Inverse lookup THP(bhp) by sampling the THP axis and inverting
        the (monotone) bhp(thp) curve (VFPHelpersLegacy getTHP; the
        reference's THP back-calculation for WTHP reporting lives in
        StandardWells_impl.hpp:613-703). qs is one well's signed surface
        rates (3,); bhp a scalar. The sampled bhp(thp) curve broadcasts
        in one eval call — no per-sample python loop."""
        thps = jnp.linspace(self.thp[0], self.thp[-1], n)
        bhps = self.eval(self.flo_value(qs), thps, self.wfr_value(qs),
                         self.gfr_value(qs), alq)
        from opm_tpu.utils.tables import interp
        return interp(bhps, thps, bhp, extrap="clamp")


@dataclass
class VFPInjTable:
    table_id: int
    datum_depth: float
    flo_type: int
    flo: jnp.ndarray
    thp: jnp.ndarray
    bhp: jnp.ndarray     # (nthp, nflo)

    def eval(self, flo, thp):
        i_t, t_t = _axis_interp_weights(self.thp, thp)
        i_f, t_f = _axis_interp_weights(self.flo, flo)
        return ((1 - t_t) * (1 - t_f) * self.bhp[i_t, i_f]
                + (1 - t_t) * t_f * self.bhp[i_t, i_f + 1]
                + t_t * (1 - t_f) * self.bhp[i_t + 1, i_f]
                + t_t * t_f * self.bhp[i_t + 1, i_f + 1])

    def flo_value(self, qs):
        inj = jnp.maximum(qs, 0.0)
        if self.flo_type == FLO_GAS:
            return inj[..., GAS]
        if self.flo_type == FLO_OIL:
            return inj[..., OIL]
        return inj[..., WATER] + inj[..., OIL]

    def bhp_at(self, qs, thp):
        return self.eval(self.flo_value(qs), thp)

    def thp_at(self, qs, bhp, alq=0.0, *, n=64):
        """Inverse lookup THP(bhp) at the well's injection rate (monotone
        bhp(thp) sampling, matching VFPProdTable.thp_at)."""
        thps = jnp.linspace(self.thp[0], self.thp[-1], n)
        bhps = self.eval(self.flo_value(qs), thps)
        from opm_tpu.utils.tables import interp
        return interp(bhps, thps, bhp, extrap="clamp")


# make the tables jit-traversable (they ride inside the well-data pytree)
jax.tree_util.register_dataclass(
    VFPProdTable,
    data_fields=["flo", "thp", "wfr", "gfr", "alq", "bhp"],
    meta_fields=["table_id", "datum_depth", "flo_type", "wfr_type",
                 "gfr_type"])
jax.tree_util.register_dataclass(
    VFPInjTable,
    data_fields=["flo", "thp", "bhp"],
    meta_fields=["table_id", "datum_depth", "flo_type"])


_FLO_CODES = {"OIL": FLO_OIL, "LIQ": FLO_LIQ, "GAS": FLO_GAS,
              "WAT": FLO_LIQ}
_WFR_CODES = {"WOR": WFR_WOR, "WCT": WFR_WCT, "WGR": WFR_WGR}
_GFR_CODES = {"GOR": GFR_GOR, "GLR": GFR_GLR, "OGR": GFR_OGR}


def parse_vfp_tables(deck, units) -> Dict[int, object]:
    """All VFPPROD/VFPINJ tables from the deck, SI-converted."""
    out: Dict[int, object] = {}
    p_f = units.factor("Pressure")
    liq_f = units.factor("LiquidSurfaceVolume/Time")
    gas_f = units.factor("GasSurfaceVolume/Time")
    len_f = units.factor("Length")
    gor_f = units.factor("GasSurfaceVolume/LiquidSurfaceVolume")

    def clean(rec):
        return np.asarray([x for x in rec], dtype=np.float64)

    for kw in deck.get_all("VFPPROD"):
        hdr = kw.records[0]
        tid = int(hdr[0])
        datum = float(hdr[1]) * len_f
        flo_t = _FLO_CODES.get(str(hdr[2]).upper(), FLO_LIQ)
        wfr_t = _WFR_CODES.get(str(hdr[3]).upper(), WFR_WCT)
        gfr_t = _GFR_CODES.get(str(hdr[4]).upper(), GFR_GOR)
        flo_fac = gas_f if flo_t == FLO_GAS else liq_f
        wfr_fac = 1.0 if wfr_t in (WFR_WOR, WFR_WCT) else 1.0 / gor_f
        gfr_fac = gor_f if gfr_t in (GFR_GOR, GFR_GLR) else 1.0 / gor_f
        flo = clean(kw.records[1]) * flo_fac
        thp = clean(kw.records[2]) * p_f
        wfr = clean(kw.records[3]) * wfr_fac
        gfr = clean(kw.records[4]) * gfr_fac
        alq = clean(kw.records[5])
        nthp, nwfr, ngfr, nalq, nflo = (len(thp), len(wfr), len(gfr),
                                        len(alq), len(flo))
        bhp = np.zeros((nthp, nwfr, ngfr, nalq, nflo))
        for rec in kw.records[6:]:
            it, iw, ig, ia = (int(rec[0]) - 1, int(rec[1]) - 1,
                              int(rec[2]) - 1, int(rec[3]) - 1)
            bhp[it, iw, ig, ia, :] = np.asarray(rec[4:4 + nflo]) * p_f
        out[tid] = VFPProdTable(
            table_id=tid, datum_depth=datum, flo_type=flo_t, wfr_type=wfr_t,
            gfr_type=gfr_t, flo=jnp.asarray(flo), thp=jnp.asarray(thp),
            wfr=jnp.asarray(wfr), gfr=jnp.asarray(gfr),
            alq=jnp.asarray(alq), bhp=jnp.asarray(bhp))
    for kw in deck.get_all("VFPINJ"):
        hdr = kw.records[0]
        tid = int(hdr[0])
        datum = float(hdr[1]) * len_f
        flo_t = _FLO_CODES.get(str(hdr[2]).upper(), FLO_LIQ)
        flo_fac = gas_f if flo_t == FLO_GAS else liq_f
        flo = clean(kw.records[1]) * flo_fac
        thp = clean(kw.records[2]) * p_f
        bhp = np.zeros((len(thp), len(flo)))
        for rec in kw.records[3:]:
            it = int(rec[0]) - 1
            bhp[it, :] = np.asarray(rec[1:1 + len(flo)]) * p_f
        out[tid] = VFPInjTable(table_id=tid, datum_depth=datum,
                               flo_type=flo_t, flo=jnp.asarray(flo),
                               thp=jnp.asarray(thp), bhp=jnp.asarray(bhp))
    return out
