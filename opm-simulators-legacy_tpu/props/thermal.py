"""Thermal PVT wrappers: temperature dependence over isothermal PVT.

Re-implements the reference's ThermalWaterPvtWrapper / ThermalOilPvtWrapper /
ThermalGasPvtWrapper (/root/reference/opm/core/props/pvt/
Thermal*PvtWrapper.hpp):

  * viscosity:  mu(p, T) = mu_iso(p) * visct(T) / mu_ref, where visct is
    the WATVISCT/OILVISCT/GASVISCT table and mu_ref the isothermal
    viscosity at the VISCREF reference pressure
    (ThermalOilPvtWrapper.hpp:138-163);
  * density:    B(p, T) = B_iso(p) * (1 + c1 (T - Tref) [+ c2 (T-Tref)^2])
    i.e. b /= alpha — WATDENT for water (linear+quadratic), THERMEX1 for
    oil (linear) (ThermalOilPvtWrapper.hpp:210-230,
    ThermalWaterPvtWrapper.hpp:85-120).

The wrapper keeps the (b(p), mu(p)) protocol of props/pvt.py classes with
the cell temperature field held as a frozen per-cell array (the legacy
simulators are isothermal in the equations; temperature only parameterizes
the properties — BlackoilState carries T but never evolves it)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from opm_tpu.props.comp_twophase import CompTwophaseProps
from opm_tpu.utils.tables import interp


@dataclass
class ThermalWrapper:
    """Temperature wrapper over one phase's isothermal (b, mu) object."""

    base: object
    temperature: jnp.ndarray                 # (nc,) or scalar [K]
    visct: Optional[jnp.ndarray] = None      # (n, 2) T -> mu table
    mu_ref: Optional[float] = None           # iso viscosity at VISCREF p
    dent_tref: float = 293.15
    dent_c1: float = 0.0
    dent_c2: float = 0.0

    @classmethod
    def wrap(cls, base, temperature, *, visct=None, viscref_p=None,
             dent=None, thermex1=None, tref=293.15):
        mu_ref = None
        if visct is not None:
            p_ref = viscref_p if viscref_p is not None else 1.0e7
            mu_ref = float(base.mu(jnp.asarray(p_ref)))
            visct = jnp.asarray(visct)
        c1 = c2 = 0.0
        t0 = tref
        if dent is not None:                 # WATDENT record
            t0, c1, c2 = dent["t_ref"], dent["c1"], dent["c2"]
        elif thermex1 is not None:           # THERMEX1 linear expansion
            c1 = thermex1
        return cls(base=base, temperature=jnp.asarray(temperature),
                   visct=visct, mu_ref=mu_ref, dent_tref=t0, dent_c1=c1,
                   dent_c2=c2)

    def _alpha_B(self):
        dT = self.temperature - self.dent_tref
        return 1.0 + self.dent_c1 * dT + self.dent_c2 * dT * dT

    def b(self, p, reg=0):
        return self.base.b(p, reg) / self._alpha_B()

    def mu(self, p, reg=0):
        mu = self.base.mu(p, reg)
        if self.visct is None:
            return mu
        mu_t = interp(self.visct[:, 0], self.visct[:, 1], self.temperature)
        return mu * mu_t / self.mu_ref


class ThermalCompTwophaseProps(CompTwophaseProps):
    """Compressible two-phase property stack with thermal corrections —
    plugs into the CompressibleTwophase/Polymer model family unchanged."""

    @classmethod
    def from_case_thermal(cls, case, temperature):
        self = cls.from_case(case)
        t = case.tables
        vr = t.get("VISCREF", [dict(p_ref=None)])[0]["p_ref"] \
            if "VISCREF" in t else None
        self.water = ThermalWrapper.wrap(
            self.water, temperature,
            visct=t.get("WATVISCT", [None])[0], viscref_p=vr,
            dent=t.get("WATDENT", [None])[0])
        self.oil = ThermalWrapper.wrap(
            self.oil, temperature,
            visct=t.get("OILVISCT", [None])[0], viscref_p=vr,
            thermex1=t.get("THERMEX1"), tref=t.get("TREF", 293.15))
        return self
