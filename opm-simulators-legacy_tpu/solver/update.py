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

    # saturation-step scaling (:1195-1230): per-cell factor so that the
    # largest saturation change is ds_max. For rv-primary cells sg = 1-sw,
    # so dsg = -dsw rides along (the reference's isRv_ term, :1206)
    from opm_tpu.models.state import saturations as _sats

    sw_old, so_old, sg_old = _sats(state)
    dsg = jnp.where(is_sg, dx, 0.0) - jnp.where(is_rv, dsw, 0.0)
    dso = -(dsw + dsg)
    max_ds = jnp.maximum(jnp.maximum(jnp.abs(dsw), jnp.abs(dsg)),
                         jnp.abs(dso))
    scale = p.ds_max / jnp.maximum(max_ds, p.ds_max)
    sw = sw_old - scale * dsw
    sg_new = sg_old - scale * dsg
    so_upd = so_old - scale * dso

    # negative saturations renormalize into the other phases instead of
    # clipping (:1232-1271; a clip absorbs the Newton increment every
    # iteration and stagnates the residual at a nonzero value)
    neg_g = jnp.minimum(sg_new, 0.0)
    sw = sw / (1.0 - neg_g)
    so_upd = so_upd / (1.0 - neg_g)
    sg_new = jnp.maximum(sg_new, 0.0)
    neg_o = jnp.minimum(so_upd, 0.0)
    sw = sw / (1.0 - neg_o)
    sg_new = sg_new / (1.0 - neg_o)
    so_upd = jnp.maximum(so_upd, 0.0)
    neg_w = jnp.minimum(sw, 0.0)
    so_upd = so_upd / (1.0 - neg_w)
    sg_new = sg_new / (1.0 - neg_w)
    sw = jnp.maximum(sw, 0.0)

    # rs / rv chop (:1275-1290): relative limit with the reference's
    # ABSOLUTE floors (1.0 for rs, 1e-3 for rv) so ratios can grow from 0
    # A hard max(.,0) floor here deadlocks Newton when the discrete
    # solution demands a slightly negative ratio (e.g. the last vapor
    # leaving a gravity-stripped dry-gas layer): the update is absorbed
    # every iteration and the residual freezes above tolerance. Allow a
    # small negative excursion (bounded by a fraction of the saturated
    # value, PVT extrapolation stays smooth there) — the reference floors
    # at zero and relies on summed-MB cancellation instead.
    rs_old = jnp.where(is_rs, state.x, 0.0)
    drs = jnp.where(is_rs, dx, 0.0)
    lim_rs = jnp.maximum(jnp.abs(rs_old) * p.dr_max_rel, 1.0)
    rs_new = rs_old - jnp.clip(drs, -lim_rs, lim_rs)
    rv_old = jnp.where(is_rv, state.x, 0.0)
    drv = jnp.where(is_rv, dx, 0.0)
    lim_rv = jnp.maximum(jnp.abs(rv_old) * p.dr_max_rel, 1e-3)
    rv_new = rv_old - jnp.clip(drv, -lim_rv, lim_rv)

    # --- phase transitions (:1293-1356), mirrored exactly ---------------
    # useSg = watOnly | hasGas | gasVaporized decides saturated (sg primary)
    # vs rs-primary; the vaporized/condensed switch is DOUBLE-conditioned:
    # the ratio must exceed saturation at the NEW state AND have been at
    # saturation at the OLD state (kills dew/bubble-point limit cycles).
    props = model.props
    rssat0 = props.rs_sat(state.pressure, model.pvtnum)
    rvsat0 = props.rv_sat(state.pressure, model.pvtnum)
    rssat = props.rs_sat(pressure, model.pvtnum)
    rvsat = props.rv_sat(pressure, model.pvtnum)
    if state.somax is not None:
        # VAPPARS-adjusted saturation points (fluidRsSat/fluidRvSat call
        # applyVap in the reference's updateState too)
        from opm_tpu.models.blackoil import vap_factor
        if getattr(props, "vap2", 0.0) > 0.0:
            f0 = vap_factor(so_old, state.somax, props.vap2)
            f1 = vap_factor(so_upd, state.somax, props.vap2)
            rssat0 = rssat0 * f0
            rssat = rssat * f1
        if getattr(props, "vap1", 0.0) > 0.0:
            f0 = vap_factor(so_old, state.somax, props.vap1)
            f1 = vap_factor(so_upd, state.somax, props.vap1)
            rvsat0 = rvsat0 * f0
            rvsat = rvsat * f1
    disgas = props.disgas
    vapoil = props.vapoil
    eps = 1.4901161193847656e-08   # sqrt(double machine epsilon)

    sg_cur = sg_new
    so_cur = so_upd
    wat_only = sw > (1.0 - eps)

    hc = jnp.full_like(state.hcstate, HC_GASOIL)
    if disgas:
        has_gas = (sg_cur > 0.0) & ~is_rs
        gas_vaporized = (is_rs & (rs_new > rssat * (1.0 + eps))
                         & (rs_old > rssat0 * (1.0 - eps)))
        use_sg = wat_only | has_gas | gas_vaporized
        hc = jnp.where(use_sg, hc, HC_OILONLY)
    if vapoil:
        has_oil = (so_cur > 0.0) & ~is_rv
        oil_condensed = (is_rv & (rv_new > rvsat * (1.0 + eps))
                         & (rv_old > rvsat0 * (1.0 - eps)))
        use_sg_v = wat_only | has_oil | oil_condensed
        hc = jnp.where(use_sg_v, hc, HC_GASONLY)

    # primary variable per final state; saturated cells implicitly carry
    # rs = rsSat / rv = rvSat (rs_rv() recomputes them on demand);
    # the reference deliberately does NOT cap rs/rv at saturation for
    # unswitched cells (commented-out rs.min(rsSat), :1325)
    x = jnp.where(hc == HC_GASOIL,
                  jnp.where(wat_only, 0.0, jnp.clip(sg_cur, 0.0, 1.0)), 0.0)
    # newly switched-to-undersaturated cells (gas/oil just vanished) start
    # exactly at the saturated ratio; rs/rv-primary cells keep their value
    # bounded negative excursion: -5% of the saturated value caps the
    # unphysical transient while keeping the Newton direction feasible
    rs_new = jnp.maximum(rs_new, -0.05 * rssat)
    rv_new = jnp.maximum(rv_new, -0.05 * rvsat)
    x = jnp.where(hc == HC_OILONLY, jnp.where(is_rs, rs_new, rssat), x)
    x = jnp.where(hc == HC_GASONLY, jnp.where(is_rv, rv_new, rvsat), x)
    sw = jnp.clip(sw, 0.0, 1.0)

    # --- well updates (StandardWells_impl.hpp:613-703) -------------------
    dbhp = jnp.clip(dbhp, -p.dp_max_rel * jnp.abs(state.bhp),
                    p.dp_max_rel * jnp.abs(state.bhp))
    bhp = state.bhp - dbhp
    qs = state.qs - dqs

    return state._replace(pressure=pressure, sw=sw, x=x, hcstate=hc,
                          bhp=bhp, qs=qs)
