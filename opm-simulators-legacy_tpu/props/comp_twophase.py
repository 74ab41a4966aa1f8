"""Compressible two-phase (water/oil, immiscible) properties.

The capability of the reference's two-phase use of
BlackoilPropertiesInterface (/root/reference/opm/core/props/
BlackoilPropertiesFromDeck.hpp) as consumed by `sim_2p_comp_reorder`:
pressure-dependent inverse formation-volume factors b_w(p), b_o(p) and
viscosities mu(p) (PVTW + PVDO/PVCDO), constant surface densities, and
water/oil relative permeability from SWOF tables or analytic power laws.

Immiscibility is required by the reference transport solver
(TransportSolverCompressibleTwophaseReorder.cpp:100-105 checks the A
matrix is diagonal); here it holds by construction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from opm_tpu.props.incomp import IncompProps
from opm_tpu.props.pvt import ConstCompOilPVT, DeadPVT, WaterPVT


@dataclass
class CompTwophaseProps:
    water: WaterPVT
    oil: object                                # DeadPVT | ConstCompOilPVT
    surface_density: tuple = (1000.0, 800.0)   # (water, oil) [kg/m3]
    relperm_props: Optional[IncompProps] = None

    @classmethod
    def from_case(cls, case):
        t = case.tables
        dens = t.get("DENSITY", [dict(water=1000.0, oil=800.0)])[0]
        water = WaterPVT.from_tables(t["PVTW"]) if "PVTW" in t else \
            WaterPVT.from_tables([dict(p_ref=1e7, b_ref=1.0, comp=0.0,
                                       mu_ref=1e-3, viscosibility=0.0)])
        if "PVDO" in t:
            oil = DeadPVT.from_tables(
                [jnp.asarray(r) for r in t["PVDO"]])
        elif "PVCDO" in t:
            oil = ConstCompOilPVT.from_tables(t["PVCDO"])
        else:
            oil = ConstCompOilPVT.from_tables(
                [dict(p_ref=1e7, b_ref=1.0, comp=0.0, mu_ref=1e-3,
                      viscosibility=0.0)])
        return cls(water=water, oil=oil,
                   surface_density=(dens["water"], dens["oil"]),
                   relperm_props=IncompProps.from_case(case))

    @classmethod
    def analytic(cls, *, c_w=4e-10, c_o=1e-9, mu=(1e-3, 4e-3),
                 rho_s=(1000.0, 800.0), p_ref=2e7, exponent=2.0,
                 sr=(0.0, 0.0)):
        """Synthetic constant-compressibility fluids for tests/examples."""
        water = WaterPVT.from_tables([dict(p_ref=p_ref, b_ref=1.0, comp=c_w,
                                           mu_ref=mu[0], viscosibility=0.0)])
        oil = ConstCompOilPVT.from_tables([dict(p_ref=p_ref, b_ref=1.0,
                                                comp=c_o, mu_ref=mu[1],
                                                viscosibility=0.0)])
        return cls(water=water, oil=oil, surface_density=rho_s,
                   relperm_props=IncompProps(viscosity=mu, density=rho_s,
                                             exponent=exponent, sr=sr))

    # -- pressure-dependent PVT (b = 1/B convention) -----------------------
    def b_w(self, p):
        return self.water.b(p)

    def b_o(self, p):
        return self.oil.b(p)

    def mu_w(self, p):
        return self.water.mu(p)

    def mu_o(self, p):
        return self.oil.mu(p)

    def density(self, p):
        """In-situ mass densities (rho_w, rho_o) = b * rho_surface
        (the reference computes these from the A matrix,
        TransportSolverCompressibleTwophaseReorder.cpp:421)."""
        rw, ro = self.surface_density
        return self.b_w(p) * rw, self.b_o(p) * ro

    def relperm(self, sw):
        return self.relperm_props.relperm(sw)

    def mobility(self, sw, p):
        krw, kro = self.relperm(sw)
        return krw / self.mu_w(p), kro / self.mu_o(p)

    def fractional_flow(self, sw, p):
        mw, mo = self.mobility(sw, p)
        return mw / jnp.maximum(mw + mo, 1e-30)
