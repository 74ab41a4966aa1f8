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
from opm_tpu.utils.tables import interp


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
    has_gas: bool = True
    has_water: bool = True

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
            has_gas=sgof_tables is not None,
            has_water=swof_tables is not None,
        )

    @classmethod
    def from_case(cls, case):
        t = case.tables
        return cls.from_tables(t.get("SWOF"), t.get("SGOF"))

    # -- evaluation; reg is an int array broadcastable with saturations -----

    def relperm(self, sw, so, sg, reg):
        """(krw, kro, krg) with ECL-default three-phase oil interpolation."""
        krw = _interp_reg(self.sw, self.krw, sw, reg)
        krg = _interp_reg(self.sg, self.krg, sg, reg)
        krow = _interp_reg(self.sw, self.krow, sw, reg)
        krog = _interp_reg(self.sg, self.krog, sg, reg)
        swco = self.swco[reg]
        ssw = jnp.maximum(sw - swco, 0.0)
        den = ssw + sg
        safe = den > 1e-12
        kro = jnp.where(
            safe, (ssw * krow + sg * krog) / jnp.where(safe, den, 1.0), krow)
        return krw, kro, krg

    def capillary(self, sw, sg, reg):
        """(pcow, pcgo): po - pw and pg - po."""
        pcow = _interp_reg(self.sw, self.pcow, sw, reg)
        pcgo = _interp_reg(self.sg, self.pcgo, sg, reg)
        return pcow, pcgo

    # endpoint queries used by init / well logic
    def connate_water(self, reg):
        return self.swco[reg]

    def pcow_inverse(self, pc, reg):
        """sw(pcow) — equilibration capillary inversion
        (EquilibrationHelpers.hpp satFromPc). pcow is non-increasing in sw,
        so interpolate on the negated curve (increasing)."""
        return _interp_reg(-self.pcow, self.sw, -pc, reg)


def _interp_reg(xs_tab, ys_tab, x, reg):
    """Per-element table selection: xs_tab (nreg, n), reg broadcast with x."""
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
