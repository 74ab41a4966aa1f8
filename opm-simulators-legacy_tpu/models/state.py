"""Simulation state containers (pytrees).

Counterpart of the reference's BlackoilState
(/root/reference/opm/core/simulator/BlackoilState.*: pressure, saturations,
rs, rv, surfacevol, hydroCarbonState) and WellStateFullyImplicitBlackoil
(bhp, wellRates, perfPhaseRates, currentControls) — collapsed into one
fixed-shape NamedTuple so the whole Newton step jits.

Primary variables follow the reference's switched scheme
(BlackoilModelBase_impl.hpp:616-703 variableStateExtractVars):
  p   — oil-phase pressure
  sw  — water saturation
  x   — sg (HC_GASOIL) | rs (HC_OILONLY) | rv (HC_GASONLY)
Well variables: qs (nw,3) surface rates (injection positive, production
negative — OPM sign convention) and bhp (nw,).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

# hydroCarbonState enum (initHydroCarbonState.hpp:10-44)
HC_GASOIL = 0   # free gas and oil present: x = sg
HC_OILONLY = 1  # undersaturated oil, no free gas: x = rs
HC_GASONLY = 2  # no oil, vaporized oil in gas: x = rv

WATER, OIL, GAS = 0, 1, 2


class BlackoilState(NamedTuple):
    pressure: jnp.ndarray   # (nc,) oil pressure [Pa]
    sw: jnp.ndarray         # (nc,)
    x: jnp.ndarray          # (nc,) sg | rs | rv
    hcstate: jnp.ndarray    # (nc,) int32
    bhp: jnp.ndarray        # (nw,) [Pa]
    qs: jnp.ndarray         # (nw, 3) surface rates [m3/s], injection > 0
    # well control state (switchable inside a report step,
    # StandardWells_impl.hpp updateWellControls)
    control: jnp.ndarray    # (nw,) int32 active control code
    target: jnp.ndarray     # (nw,) active control target
    # hysteresis memory: per-cell historical max gas saturation, updated
    # once per report step (the reference's updateSatHyst,
    # BlackoilPropsAdFromDeck.hpp:201-430). None = hysteresis off.
    sgmax: Optional[jnp.ndarray] = None
    # VAPPARS memory: per-cell historical max oil saturation (the
    # reference's satOilMax_/updateSatOilMax). None = vappars off.
    somax: Optional[jnp.ndarray] = None

    @property
    def nc(self):
        return self.pressure.shape[0]

    @property
    def nw(self):
        return self.bhp.shape[0]


def saturations(state: BlackoilState):
    """(sw, so, sg) from switched primary variables."""
    is_sg = state.hcstate == HC_GASOIL
    is_rv = state.hcstate == HC_GASONLY
    sg = jnp.where(is_sg, state.x, jnp.where(is_rv, 1.0 - state.sw, 0.0))
    so = 1.0 - state.sw - sg
    return state.sw, so, sg


def rs_rv(state: BlackoilState, props, pvtnum):
    """(rs, rv): dissolved/vaporized ratios; saturated values where the
    respective phase is present (variableStateExtractVars semantics)."""
    is_rs = state.hcstate == HC_OILONLY
    is_rv = state.hcstate == HC_GASONLY
    rssat = props.rs_sat(state.pressure, pvtnum)
    rvsat = props.rv_sat(state.pressure, pvtnum)
    rs = jnp.where(is_rs, state.x, rssat)
    rv = jnp.where(is_rv, state.x, rvsat)
    return rs, rv


def init_hcstate(sw, sg, so=None, *, disgas=True, vapoil=False):
    """Classify cells (initHydroCarbonState.hpp:10-44)."""
    if so is None:
        so = 1.0 - sw - sg
    st = jnp.full(sw.shape, HC_GASOIL, dtype=jnp.int32)
    if disgas:
        st = jnp.where(sg <= 0.0, HC_OILONLY, st)
    if vapoil:
        st = jnp.where(so <= 0.0, HC_GASONLY, st)
    return st
