"""BlackoilProps: the bundled fluid/rock property facade.

TPU-native counterpart of BlackoilPropsAdFromDeck
(/root/reference/opm/autodiff/BlackoilPropsAdFromDeck.hpp:201-430). All
evaluation functions are pure jnp over cell arrays; derivatives are obtained
by jax AD in the model instead of hand-assembled sparse Jacobian blocks.

Phase indexing is canonical (water=0, oil=1, gas=2) matching the reference's
BlackoilPhases::{Aqua, Liquid, Vapour}.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from opm_tpu.props.pvt import (ConstCompOilPVT, DeadPVT, LiveOilPVT,
                               RockPVT, RockTabPVT,
                               WaterPVT, WetGasPVT)
from opm_tpu.props.satfunc import SatFuncFamily1

WATER, OIL, GAS = 0, 1, 2


def _inert_gas_pvt():
    """Placeholder gas PVT for two-phase (water-oil) decks.

    The reference's BlackoilModelBase supports active-phase subsets (np=2
    oil-water: the spe1_2p regression class, compareECLFiles.cmake:93-98;
    phase usage from the deck, BlackoilPropsAdFromDeck). Here the model
    always carries three equations; with no GAS in RUNSPEC the gas
    saturation is identically zero (init_hcstate -> HC_GASOIL, x = sg;
    krg(0) = 0 from the trivial synthesized SGOF; no gas source), so the
    gas mass-balance row reduces to pv*bg/dt * dsg = 0 and keeps sg = 0
    exactly. Any positive constant b works: B = 1, mu = 0.02 cp."""
    return DeadPVT.from_tables(
        [np.array([[1.0e5, 1.0, 2.0e-5], [1.0e8, 1.0, 2.0e-5]])])


@dataclass
class BlackoilProps:
    phases: tuple                 # subset of ("WATER","OIL","GAS")
    disgas: bool
    vapoil: bool
    # surface densities per region, shape (nreg, 3) order (w, o, g)
    surface_density: jnp.ndarray
    water: Optional[WaterPVT]
    oil_dead: Optional[DeadPVT]
    oil_cc: Optional[ConstCompOilPVT]
    oil_live: Optional[LiveOilPVT]
    gas_dead: Optional[DeadPVT]
    gas_wet: Optional[WetGasPVT]
    rock: Optional[RockPVT]
    satfunc: Optional[SatFuncFamily1]
    # VAPPARS exponents (applyVap, BlackoilPropsAdFromDeck.cpp:1027-1075):
    # vap1 scales rv_sat, vap2 scales rs_sat by (so/so_max)^vap
    vap1: float = 0.0
    vap2: float = 0.0

    # ------------------------------------------------------------------
    @classmethod
    def from_case(cls, case):
        t = case.tables
        rs = case.runspec
        dens = t.get("DENSITY", [dict(oil=600.0, water=1000.0, gas=1.0)])
        sd = jnp.asarray([[d["water"], d["oil"], d["gas"]] for d in dens])
        return cls(
            phases=rs.phases, disgas=rs.disgas, vapoil=rs.vapoil,
            surface_density=sd,
            water=WaterPVT.from_tables(t["PVTW"]) if "PVTW" in t else None,
            oil_dead=DeadPVT.from_tables(t["PVDO"]) if "PVDO" in t else None,
            oil_cc=(ConstCompOilPVT.from_tables(t["PVCDO"])
                    if "PVCDO" in t else None),
            oil_live=(LiveOilPVT.from_tables(t["PVTO"])
                      if "PVTO" in t else None),
            gas_dead=(DeadPVT.from_tables(t["PVDG"]) if "PVDG" in t
                      else _inert_gas_pvt()
                      if "GAS" not in rs.phases and "PVTG" not in t
                      else None),
            gas_wet=WetGasPVT.from_tables(t["PVTG"]) if "PVTG" in t else None,
            rock=(RockTabPVT.from_tables(t["ROCKTAB"])
                  if "ROCKTAB" in t else
                  RockPVT.from_tables(t["ROCK"]) if "ROCK" in t else None),
            satfunc=SatFuncFamily1.from_case(case),
            vap1=t.get("VAPPARS", (0.0, 0.0))[0],
            vap2=t.get("VAPPARS", (0.0, 0.0))[1],
        )

    # -- inverse formation volume factors (b = 1/B) ----------------------
    def b_water(self, p, reg):
        return self.water.b(p, reg)

    def mu_water(self, p, reg):
        return self.water.mu(p, reg)

    def b_oil(self, p, rs, reg):
        if self.oil_live is not None:
            return self.oil_live.b(p, rs, reg)
        if self.oil_dead is not None:
            return self.oil_dead.b(p, reg)
        return self.oil_cc.b(p, reg)

    def mu_oil(self, p, rs, reg):
        if self.oil_live is not None:
            return self.oil_live.mu(p, rs, reg)
        if self.oil_dead is not None:
            return self.oil_dead.mu(p, reg)
        return self.oil_cc.mu(p, reg)

    def b_gas(self, p, rv, reg):
        if self.gas_wet is not None:
            return self.gas_wet.b(p, rv, reg)
        return self.gas_dead.b(p, reg)

    def mu_gas(self, p, rv, reg):
        if self.gas_wet is not None:
            return self.gas_wet.mu(p, rv, reg)
        return self.gas_dead.mu(p, reg)

    # -- saturated dissolution ratios ------------------------------------
    def rs_sat(self, p, reg):
        if self.disgas and self.oil_live is not None:
            return self.oil_live.rs_sat(p, reg)
        return jnp.zeros_like(p)

    def rv_sat(self, p, reg):
        if self.vapoil and self.gas_wet is not None:
            return self.gas_wet.rv_sat(p, reg)
        return jnp.zeros_like(p)

    # -- phase mass densities at reservoir conditions ---------------------
    def rho_water(self, p, reg):
        return self.surface_density[reg, WATER] * self.b_water(p, reg)

    def rho_oil(self, p, rs, reg):
        return (self.surface_density[reg, OIL]
                + rs * self.surface_density[reg, GAS]) * self.b_oil(p, rs, reg)

    def rho_gas(self, p, rv, reg):
        return (self.surface_density[reg, GAS]
                + rv * self.surface_density[reg, OIL]) * self.b_gas(p, rv, reg)

    # -- rock --------------------------------------------------------------
    def pv_mult(self, p, reg):
        if self.rock is None:
            return jnp.ones_like(p)
        return self.rock.pv_mult(p, reg)

    def trans_mult(self, p, reg):
        """Pressure-dependent transmissibility multiplier (ROCKTAB col 3;
        applied to phase mobility like the reference's tr_mult in
        computeMassFlux, BlackoilModelBase_impl.hpp:1486-1493)."""
        if self.rock is None:
            return None
        tm = self.rock.trans_mult(p, reg)
        return tm

    @property
    def has_trans_mult(self):
        return isinstance(self.rock, RockTabPVT)

    # -- saturation functions ----------------------------------------------
    def relperm(self, sw, so, sg, reg, sgmax=None, ireg=None, somax=None):
        return self.satfunc.relperm(sw, so, sg, reg, sgmax=sgmax,
                                    ireg=ireg, somax=somax)

    def capillary(self, sw, sg, reg, somax=None, ireg=None):
        if self.satfunc is None:
            z = jnp.zeros_like(sw)
            return z, z
        return self.satfunc.capillary(sw, sg, reg, somax=somax, ireg=ireg)
