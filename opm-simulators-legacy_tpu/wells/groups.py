"""Group controls: GRUP wells inherit distributed group targets.

Re-implements the capability the reference gets from opm-core's
WellCollection (guide rates, group targets; hooks setupGroupControl /
applyVREPGroupControl / updateWellTargets at
/root/reference/opm/autodiff/BlackoilModelBase_impl.hpp:779-792, :2548-2596):
wells under GRUP control receive a share of their group's target,
distributed by guide rates (current phase rates, falling back to equal
shares), re-resolved at every report step. Supported group modes: production
ORAT/WRAT/GRAT/LRAT/RESV, injection RATE/RESV/VREP (voidage replacement) /
REIN (re-injection).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from opm_tpu.io.schedule import (BHP, GRAT, GRUP, INJECTOR, LRAT, ORAT,
                                 PRODUCER, RESERVOIR_RATE, RESV,
                                 SURFACE_RATE, WRAT, GroupConfig, WellConfig)

_PHASE_OF = {ORAT: 1, WRAT: 0, GRAT: 2, LRAT: 1}


def _in_group(well: WellConfig, group: str,
              groups: Dict[str, GroupConfig]) -> bool:
    g = well.group
    seen = set()
    while g and g not in seen:
        if g == group:
            return True
        seen.add(g)
        g = groups[g].parent if g in groups else None
    return group == "FIELD"


def resolve_group_controls(step_wells: List[WellConfig],
                           groups: Dict[str, GroupConfig],
                           rates: Dict[str, np.ndarray],
                           voidage_rate: float = 0.0,
                           potentials: Dict[str, np.ndarray] = None
                           ) -> List[WellConfig]:
    """Return well configs with GRUP controls replaced by concrete targets.

    rates: current surface rates per well name (production negative), used
    as guide rates; wells with no flow yet fall back to their production
    POTENTIALS (computeWellPotentials guide rates,
    StandardWells_impl.hpp:1005 + WellCollection), then to equal shares.
    voidage_rate: total reservoir voidage of the field's producers (for
    VREP), computed by the caller from the rate converter.
    """
    wells = [w.copy() for w in step_wells]
    for gname, g in groups.items():
        # --- production groups -----------------------------------------
        if g.prod_control and g.prod_control not in ("NONE", "FLD"):
            members = [w for w in wells
                       if w.type == PRODUCER and w.control == GRUP
                       and _in_group(w, gname, groups)]
            if members:
                ctl = g.prod_control
                target = g.prod_targets.get(ctl, np.nan)
                if np.isfinite(target):
                    ph = _PHASE_OF.get(ctl, 1)
                    # explicit WGRUPCON guide rates take precedence
                    explicit = np.array([getattr(w, "guide_rate", np.nan)
                                         for w in members])
                    if np.isfinite(explicit).all() and explicit.sum() > 0:
                        guides = explicit
                    else:
                        guides = np.array([
                            max(-rates.get(w.name, np.zeros(3))[ph], 0.0)
                            for w in members])
                    if guides.sum() <= 0 and potentials:
                        guides = np.array([
                            max(potentials.get(w.name, np.zeros(3))[ph], 0.0)
                            for w in members])
                    if guides.sum() <= 0:
                        guides = np.ones(len(members))
                    shares = guides / guides.sum()
                    for w, s in zip(members, shares):
                        w.control = ctl
                        setattr(w, ctl.lower(), target * s)
        # --- injection groups -------------------------------------------
        if g.inj_control and g.inj_control not in ("NONE", "FLD"):
            members = [w for w in wells
                       if w.type == INJECTOR and w.control == GRUP
                       and _in_group(w, gname, groups)
                       and (g.inj_fluid is None
                            or w.injector_fluid == g.inj_fluid)]
            if members:
                if g.inj_control == "RATE" and np.isfinite(g.inj_target):
                    tgt = g.inj_target
                    per = tgt / len(members)
                    for w in members:
                        w.control = SURFACE_RATE
                        w.surf_inj_rate = per
                elif g.inj_control == "RESV" and np.isfinite(g.inj_target):
                    per = g.inj_target / len(members)
                    for w in members:
                        w.control = RESERVOIR_RATE
                        w.resv_inj_rate = per
                elif g.inj_control == "REIN" and np.isfinite(g.inj_target):
                    # re-inject a fraction of the group's produced volume
                    # of the injection phase (GCONINJE REIN)
                    ph = {"WATER": 0, "OIL": 1,
                          "GAS": 2}.get(g.inj_fluid or "GAS", 2)
                    produced = sum(
                        max(-rates.get(w.name, np.zeros(3))[ph], 0.0)
                        for w in wells if w.type == PRODUCER
                        and _in_group(w, gname, groups))
                    per = g.inj_target * produced / len(members)
                    for w in members:
                        w.control = SURFACE_RATE
                        w.surf_inj_rate = per
                elif g.inj_control == "VREP":
                    # replace the group's production voidage
                    per = g.voidage_frac * voidage_rate / len(members)
                    for w in members:
                        w.control = RESERVOIR_RATE
                        w.resv_inj_rate = per
    # any remaining GRUP wells: fall back to BHP limits
    for w in wells:
        if w.control == GRUP:
            w.control = BHP
    return wells
