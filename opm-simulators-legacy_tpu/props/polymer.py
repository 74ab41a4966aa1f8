"""Polymer flooding properties.

Re-implements /root/reference/opm/polymer/PolymerProperties.hpp:43-300:
Todd-Longstaff mixing (TLMIXPAR omega), PLYVISC viscosity-multiplier table,
PLYADS adsorption isotherm (with desorption switch), dead pore volume,
residual resistance factor (PLYROCK), and the effective water/polymer
mobilities used by both the pressure and transport stages.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from opm_tpu.utils.tables import interp

ADS_DESORPTION = 1   # retention reversible
ADS_NO_DESORPTION = 2  # adsorption irreversible (uses cmax history)


@dataclass
class PolymerProperties:
    c_max: float = 5.0                 # kg/m3 (PLYMAX)
    mix_param: float = 1.0             # omega (TLMIXPAR)
    rock_density: float = 2000.0       # kg/m3 (PLYROCK)
    dead_pore_vol: float = 0.05
    res_factor: float = 1.0            # residual resistance factor RRF
    adsorption_index: int = ADS_DESORPTION
    visc_table: Optional[jnp.ndarray] = None   # (n, 2): c, multiplier
    ads_table: Optional[jnp.ndarray] = None    # (n, 2): c, adsorbed kg/kg
    # PLYSHLOG: (n, 2) water velocity [m/s] -> shear viscosity-reduction
    # factor (normalized to 1 at the lowest tabulated velocity)
    shear_table: Optional[jnp.ndarray] = None

    @classmethod
    def from_case(cls, case):
        t = case.tables
        rock = t.get("PLYROCK", [dict(dead_pore_vol=0.05, res_rrf=1.0,
                                      rock_density=2000.0,
                                      adsorption_index=1, max_ads=0.0)])[0]
        plymax = t.get("PLYMAX", [dict(c_max=5.0)])[0]
        tl = t.get("TLMIXPAR", [dict(omega=1.0)])[0]
        shear = None
        if "PLYSHLOG" in t:
            # record 1 = reference conditions; the velocity/factor pairs
            # follow (PolymerProperties plyshlog parsing; the table is
            # interpolated in log(velocity) per computeShearMultLog,
            # opm/polymer/PolymerProperties.cpp)
            raw = np.asarray(t["PLYSHLOG"][0], dtype=np.float64)
            if raw.ndim == 1:
                raw = raw.reshape(-1, 2)
            shear = jnp.asarray(raw)
        return cls(
            c_max=plymax["c_max"], mix_param=tl["omega"],
            rock_density=rock["rock_density"],
            dead_pore_vol=rock["dead_pore_vol"],
            res_factor=rock["res_rrf"],
            adsorption_index=int(rock["adsorption_index"]),
            visc_table=(jnp.asarray(t["PLYVISC"][0]) if "PLYVISC" in t
                        else None),
            ads_table=(jnp.asarray(t["PLYADS"][0]) if "PLYADS" in t
                       else None),
            shear_table=shear)

    # -- tables ------------------------------------------------------------
    def visc_mult(self, c):
        """Polymer-solution viscosity multiplier (PLYVISC)."""
        if self.visc_table is None:
            return 1.0 + 2.0 * c / self.c_max
        return interp(self.visc_table[:, 0], self.visc_table[:, 1], c,
                      extrap="clamp")

    def adsorption(self, c, cmax_hist=None):
        """Adsorbed polymer (kg polymer / kg rock). With no-desorption, the
        isotherm is evaluated at max(c, cmax history)."""
        if self.adsorption_index == ADS_NO_DESORPTION and cmax_hist is not None:
            c = jnp.maximum(c, cmax_hist)
        if self.ads_table is None:
            return jnp.zeros_like(c)
        return interp(self.ads_table[:, 0], self.ads_table[:, 1], c,
                      extrap="clamp")

    # -- Todd-Longstaff effective viscosities -------------------------------
    def effective_viscosities(self, c, mu_w, v_w=None):
        """(mu_w_eff, mu_p_eff): effective water and polymer-solution
        viscosities (PolymerProperties::effectiveViscosities). With v_w,
        the PLYSHLOG shear factor thins the polymer contribution."""
        cbar = jnp.clip(c / self.c_max, 0.0, 1.0)
        if v_w is not None and self.shear_table is not None:
            mult_c = self.visc_mult_shear(c, v_w)
            mult_max = self.visc_mult_shear(
                jnp.full_like(c, self.c_max), v_w)
        else:
            mult_c = self.visc_mult(c)
            mult_max = self.visc_mult(self.c_max)
        mu_m = mu_w * mult_c                       # fully mixed
        mu_p = mu_w * mult_max                     # fully polymer
        w = self.mix_param
        mu_p_eff = mu_m ** w * mu_p ** (1.0 - w)
        mu_w_e = mu_m ** w * mu_w ** (1.0 - w)
        inv_mu_w_eff = (1.0 - cbar) / mu_w_e + cbar / mu_p_eff
        return 1.0 / inv_mu_w_eff, mu_p_eff

    def shear_mult(self, v_w):
        """PLYSHLOG shear factor Z(|v_w|) in [0, 1]: reduction of the
        POLYMER viscosity contribution at high water velocity
        (computeShearMultLog semantics: log-velocity interpolation,
        normalized to the lowest tabulated velocity)."""
        if self.shear_table is None:
            return jnp.ones_like(v_w)
        vt = self.shear_table[:, 0]
        zt = self.shear_table[:, 1] / self.shear_table[0, 1]
        v = jnp.maximum(jnp.abs(v_w), vt[0])
        return interp(jnp.log(vt), zt, jnp.log(v), extrap="clamp")

    def visc_mult_shear(self, c, v_w):
        """Concentration multiplier with the polymer contribution scaled by
        the shear factor: 1 + (mult(c) - 1) Z(v) (the reference's applied
        form in the shear-thinning update)."""
        return 1.0 + (self.visc_mult(c) - 1.0) * self.shear_mult(v_w)

    def rk(self, c, cmax_hist=None):
        """Permeability-reduction factor RK = 1 + (RRF-1) ads/ads_max."""
        if self.ads_table is None or self.res_factor <= 1.0:
            return jnp.ones_like(c)
        ads_max = self.ads_table[-1, 1]
        ads = self.adsorption(c, cmax_hist)
        return 1.0 + (self.res_factor - 1.0) * ads / jnp.maximum(
            ads_max, 1e-30)

    def water_mob_factor(self, c, mu_w, cmax_hist=None, v_w=None):
        """Multiplier on the waterphase mobility krw/mu_w: effective
        viscosity (optionally shear-thinned, PLYSHLOG) + permeability
        reduction."""
        mu_w_eff, _ = self.effective_viscosities(c, mu_w, v_w=v_w)
        return mu_w / (self.rk(c, cmax_hist) * mu_w_eff)

    def polymer_frac_in_water(self, c, mu_w):
        """Fraction of the water-phase volumetric flux carrying polymer,
        m(c) = mu_w_eff / mu_p_eff weighting (transport velocity factor)."""
        mu_w_eff, mu_p_eff = self.effective_viscosities(c, mu_w)
        return mu_w_eff / mu_p_eff
