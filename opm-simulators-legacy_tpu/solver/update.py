"""Newton state update: chopped increments and primary-variable switching.

Re-implements BlackoilModelBase::updateState
(/root/reference/opm/autodiff/BlackoilModelBase_impl.hpp:1149-1389) as a pure,
fixed-shape function: relative pressure chopping (dpMaxRel), per-cell
saturation-step scaling (dsMax), rs/rv chopping (drMaxRel), and the masked
hydrocarbon-state transitions (appearing/disappearing free gas or oil) that
the reference does with per-cell branches.
"""

from __future__ import annotations

import jax.numpy as jnp

from opm_tpu.models.state import (HC_GASOIL, HC_GASONLY, HC_OILONLY,
                                  BlackoilState)


def update_state(model, state: BlackoilState, du) -> BlackoilState:
    """Apply the Newton increment du (solution of J dx = r, subtracted:
    x <- x - dx, matching the reference's sign convention)."""
    p = model.params
    nc = model.nc
    nw = state.bhp.shape[0]
    dp = du[:nc]
    dsw = du[nc:2 * nc]
    dx = du[2 * nc:3 * nc]
    dbhp = du[3 * nc:3 * nc + nw]
    dqs = du[3 * nc + nw:3 * nc + nw + 3 * nw].reshape(nw, 3)

    is_sg = state.hcstate == HC_GASOIL
    is_rs = state.hcstate == HC_OILONLY
    is_rv = state.hcstate == HC_GASONLY

    # pressure chop: |dp| <= dp_max_rel * |p|   (:1184)
    dp = jnp.clip(dp, -p.dp_max_rel * jnp.abs(state.pressure),
                  p.dp_max_rel * jnp.abs(state.pressure))
    pressure = state.pressure - dp

    # saturation-step scaling (:1203-1230): per-cell factor so that the
    # largest saturation change is ds_max
    dsg = jnp.where(is_sg, dx, 0.0)
    dso = -(dsw + dsg)
    max_ds = jnp.maximum(jnp.maximum(jnp.abs(dsw), jnp.abs(dsg)),
                         jnp.abs(dso))
    scale = p.ds_max / jnp.maximum(max_ds, p.ds_max)
    sw = state.sw - scale * dsw
    sg_new = jnp.where(is_sg, state.x - scale * dsg, 0.0)

    # rs / rv chop (:1232-1260)
    rs_old = jnp.where(is_rs, state.x, 0.0)
    drs = jnp.where(is_rs, dx, 0.0)
    drs = jnp.clip(drs, -p.dr_max_rel * jnp.abs(rs_old),
                   p.dr_max_rel * jnp.abs(rs_old))
    rs_new = rs_old - drs
    rv_old = jnp.where(is_rv, state.x, 0.0)
    drv = jnp.where(is_rv, dx, 0.0)
    drv = jnp.clip(drv, -p.dr_max_rel * jnp.abs(rv_old),
                   p.dr_max_rel * jnp.abs(rv_old))
    rv_new = rv_old - drv

    # --- phase transitions (:1262-1356) --------------------------------
    props = model.props
    rssat = props.rs_sat(pressure, model.pvtnum)
    rvsat = props.rv_sat(pressure, model.pvtnum)
    disgas = props.disgas
    vapoil = props.vapoil

    hc = state.hcstate
    # free gas vanished: GASOIL -> OILONLY, x becomes rs = rsSat(p)
    gas_gone = is_sg & (sg_new <= 0.0) & disgas
    # dissolved gas exceeds saturation: OILONLY -> GASOIL, sg reappears at 0
    gas_back = is_rs & (rs_new > rssat * (1.0 + 1e-8))
    # oil vanished: GASOIL -> GASONLY, x becomes rv = rvSat(p)
    so_new = 1.0 - sw - jnp.where(is_sg, sg_new, jnp.where(is_rv, 1.0 - sw,
                                                           0.0))
    oil_gone = is_sg & (so_new <= 0.0) & vapoil & ~gas_gone
    oil_back = is_rv & (rv_new > rvsat * (1.0 + 1e-8))

    hc = jnp.where(gas_gone, HC_OILONLY, hc)
    hc = jnp.where(gas_back, HC_GASOIL, hc)
    hc = jnp.where(oil_gone, HC_GASONLY, hc)
    hc = jnp.where(oil_back, HC_GASOIL, hc)

    x = jnp.where(hc == HC_GASOIL, jnp.clip(sg_new, 0.0, 1.0), 0.0)
    x = jnp.where(gas_back, 0.0, x)                    # sg reappears at 0
    x = jnp.where(oil_back, 0.0, x)                    # sg = 0 (so appears)
    x = jnp.where(hc == HC_OILONLY,
                  jnp.where(gas_gone, rssat,
                            jnp.clip(rs_new, 0.0, rssat * (1 + 1e-8))), x)
    x = jnp.where(hc == HC_GASONLY,
                  jnp.where(oil_gone, rvsat,
                            jnp.clip(rv_new, 0.0, rvsat * (1 + 1e-8))), x)
    sw = jnp.clip(sw, 0.0, 1.0)

    # --- well updates (StandardWells_impl.hpp:613-703) -------------------
    dbhp = jnp.clip(dbhp, -p.dp_max_rel * jnp.abs(state.bhp),
                    p.dp_max_rel * jnp.abs(state.bhp))
    bhp = state.bhp - dbhp
    qs = state.qs - dqs

    return state._replace(pressure=pressure, sw=sw, x=x, hcstate=hc,
                          bhp=bhp, qs=qs)
