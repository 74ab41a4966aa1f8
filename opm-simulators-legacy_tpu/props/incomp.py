"""Incompressible two-phase properties.

Counterpart of the reference's IncompPropertiesInterface family
(/root/reference/opm/core/props/IncompPropertiesBasic.hpp,
IncompPropertiesFromDeck.hpp): constant densities/viscosities with relperm
from analytic power laws or from SWOF tables.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from opm_tpu.props.satfunc import _interp_reg


@dataclass
class IncompProps:
    viscosity: tuple = (1e-3, 1e-3)          # (water, oil) [Pa s]
    density: tuple = (1000.0, 800.0)         # [kg/m3]
    # analytic relperm kr = ((s - sr)/(1 - srw - sro))^expo
    exponent: float = 2.0
    sr: tuple = (0.0, 0.0)                   # residual (water, oil)
    # optional tabulated relperm (SWOF): (nreg, n, 4)
    swof: Optional[jnp.ndarray] = None
    satnum: Optional[jnp.ndarray] = None

    @classmethod
    def from_case(cls, case, **kw):
        t = case.tables
        dens = t.get("DENSITY", [dict(water=1000.0, oil=800.0)])[0]
        visc = (1e-3, 1e-3)
        if "PVTW" in t and "PVCDO" in t:
            visc = (t["PVTW"][0]["mu_ref"], t["PVCDO"][0]["mu_ref"])
        swof = None
        if "SWOF" in t:
            from opm_tpu.props.pvt import _pad_rows
            swof = jnp.asarray(_pad_rows(t["SWOF"], 4))
        return cls(viscosity=visc, density=(dens["water"], dens["oil"]),
                   swof=swof, **kw)

    def relperm(self, sw, reg=None):
        """(krw, kro) for water saturation sw."""
        if self.swof is not None:
            reg = jnp.zeros_like(sw, dtype=jnp.int32) if reg is None else reg
            krw = _interp_reg(self.swof[..., 0], self.swof[..., 1], sw, reg)
            kro = _interp_reg(self.swof[..., 0], self.swof[..., 2], sw, reg)
            return krw, kro
        srw, sro = self.sr
        ssw = jnp.clip((sw - srw) / (1.0 - srw - sro), 0.0, 1.0)
        sso = jnp.clip((1.0 - sw - sro) / (1.0 - srw - sro), 0.0, 1.0)
        return ssw ** self.exponent, sso ** self.exponent

    def mobility(self, sw, reg=None):
        krw, kro = self.relperm(sw, reg)
        return krw / self.viscosity[0], kro / self.viscosity[1]

    def fractional_flow(self, sw, reg=None):
        mw, mo = self.mobility(sw, reg)
        return mw / (mw + mo)
