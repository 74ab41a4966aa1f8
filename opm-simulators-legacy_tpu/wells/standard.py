"""StandardWells: device-side well model.

Re-implements the semantics of the reference's StandardWells
(/root/reference/opm/autodiff/StandardWells_impl.hpp):
  * computeWellFlux (:398-571) — drawdown-signed perforation fluxes;
    producing perfs give surface rates b*mob*WI*drawdown with rs/rv
    transfers; injecting perfs distribute a total-mobility volume rate by the
    wellbore surface mixture over the volume ratio (d = 1 - rs*rv).
  * addWellFluxEq (:809) — q_s - sum(perf fluxes) = 0.
  * addWellControlEq (:838-997) — BHP / rate-distribution control residual.
  * updateWellControls (:613-703 area) — constraint switching.
  * WellDensitySegmented (../WellDensitySegmented.cpp) — explicit wellbore
    mixture density -> connection pressure offsets cdp.

All functions are pure jnp over padded (nw, max_perf) arrays; everything
vmap-free (plain broadcasting) so it fuses into the residual kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from opm_tpu.wells.wells import (CTRL_BHP, CTRL_GRAT, CTRL_GRUP, CTRL_LRAT,
                                 CTRL_ORAT, CTRL_RESERVOIR_RATE, CTRL_RESV,
                                 CTRL_SURFACE_RATE, CTRL_THP, CTRL_WRAT)

WATER, OIL, GAS = 0, 1, 2
_EPS = 1e-14


def _gather_ph(a3, c):
    """Gather a phase-leading (3, nc) cell array at (nw, mp) cells and
    return the wells' phase-trailing (nw, mp, 3) convention. Gather first,
    transpose the tiny result — never materialize an (nc, 3) array (TPU
    tile padding)."""
    return jnp.moveaxis(a3[:, c], 0, -1)


def _perf_fields(cellq, c, keys):
    """Per-perforation views of the requested cellq fields: gathered at
    the (nw, mp) perf cells from full-grid arrays, or passed through when
    cellq is PERF-LOCAL (cellq["perf_local"] truthy — arrays already
    (nw, mp) / (nw, mp, 3), e.g. built by evaluating the PVT stack only
    at the perforated cells instead of the whole grid; see
    solver/newton.py _cdp)."""
    if cellq.get("perf_local"):
        return tuple(cellq[k] for k in keys)
    return tuple(_gather_ph(cellq[k], c) if cellq[k].ndim == 2
                 else cellq[k][c] for k in keys)


def wellbore_mixture(qs, comp_frac, is_injector=None):
    """Surface-volume fractions of the wellbore mixture
    (StandardWells::wellSurfaceVolumeFraction): current well rates for
    producers (crossflow re-injection mixture), the SPECIFIED injection
    composition for injectors. Injectors must not use the rate-based
    mixture: at the converged well solution cqt_s/total == 1 exactly and
    the zero-component flux-equation rows become identically zero
    (singular Jacobian)."""
    total = jnp.sum(qs, axis=-1, keepdims=True)
    flowing = jnp.abs(total) > _EPS
    frac = qs / jnp.where(flowing, total, 1.0)
    mix = jnp.where(flowing, frac, comp_frac)
    if is_injector is not None:
        inj = jnp.asarray(is_injector, dtype=bool)
        mix = jnp.where(inj[..., None] if inj.ndim < mix.ndim else inj,
                        comp_frac, mix)
    return mix


def perf_flux_formula(p_cell, b, mob, rs, rv, wi, bhp_plus_cdp, cmix,
                      is_injector, *, allow_crossflow=True):
    """Shape-generic perforation flux (computeWellFlux:398-571): cq_s
    (..., 3), positive = injection into the reservoir cell.

    p_cell, rs, rv, wi, bhp_plus_cdp, is_injector: (...); b, mob, cmix:
    (..., 3). Works for padded (nw, mp) arrays and for scalars (single-perf
    linearization in models/linearize.py)."""
    ddn = p_cell - bhp_plus_cdp              # drawdown (:421)

    # --- producing perforations (drawdown > 0) --------------------------
    cq_r = -wi[..., None] * mob * ddn[..., None]   # reservoir-volume rates
    base = b * cq_r
    prod = jnp.stack([
        base[..., WATER],
        base[..., OIL] + rv * base[..., GAS],
        base[..., GAS] + rs * base[..., OIL],
    ], axis=-1)

    # --- injecting perforations (drawdown <= 0) --------------------------
    totmob = jnp.sum(mob, axis=-1)
    cqt_r = -wi * totmob * ddn                      # > 0 for injection
    cw = cmix[..., WATER]
    co = cmix[..., OIL]
    cg = cmix[..., GAS]
    d = jnp.maximum(1.0 - rs * rv, _EPS)
    volrat = (cw / jnp.maximum(b[..., WATER], _EPS)
              + (co - rv * cg) / d / jnp.maximum(b[..., OIL], _EPS)
              + (cg - rs * co) / d / jnp.maximum(b[..., GAS], _EPS))
    cqt_s = cqt_r / jnp.maximum(volrat, _EPS)
    inj = cmix * cqt_s[..., None]

    producing = ddn > 0.0
    cq_s = jnp.where(producing[..., None], prod, inj)
    if not allow_crossflow:
        # suppress producer-injection / injector-production perfs
        keep = jnp.where(is_injector, ~producing, producing)
        cq_s = jnp.where(keep[..., None], cq_s, 0.0)
    return cq_s


def perforation_fluxes(wd, cellq, bhp, qs, cdp, *, allow_crossflow=True):
    """Padded-array perforation fluxes cq_s (nw, mp, 3).

    wd: dict of padded well arrays (perf_cell, perf_wi, perf_mask, comp_frac,
        is_injector, open).
    cellq: dict of per-cell arrays (p_oil, mob (3,nc), b (3,nc), rs, rv).
    """
    c = wd["perf_cell"]                      # (nw, mp)
    mask = wd["perf_mask"] * wd["open"][:, None]
    cmix = wellbore_mixture(qs, wd["comp_frac"], wd["is_injector"])
    po_p, b_p, mob_p, rs_p, rv_p = _perf_fields(
        cellq, c, ("p_oil", "b", "mob", "rs", "rv"))
    cq_s = perf_flux_formula(
        po_p, b_p, mob_p, rs_p, rv_p, wd["perf_wi"], bhp[:, None] + cdp,
        jnp.broadcast_to(cmix[:, None, :], c.shape + (3,)),
        jnp.broadcast_to(wd["is_injector"][:, None], c.shape),
        allow_crossflow=allow_crossflow)
    return cq_s * mask[..., None]


def effective_distribution(g, control, is_injector, cq_s):
    """Dead-well fallback (addWellControlEq:838-997 aliveWells): a
    rate-controlled producer that cannot flow AT ALL gets a total-rate
    distribution — otherwise the control equation's bhp column is
    singular. A well whose CONTROLLED phase is dead but that can still
    flow others (e.g. a watered-out ORAT producer) is NOT dead: its
    control equation stays, and update_controls switches it to its BHP
    limit (producing water as 'oil' through a total-rate fallback was a
    round-2 bug — trapped residual oil looked produced)."""
    prod_rates = jnp.maximum(-jnp.sum(cq_s, axis=1), 0.0)     # (nw, 3)
    total = jnp.sum(prod_rates, axis=1)
    is_rate_prod = (~is_injector) & (jnp.sum(jnp.abs(g), axis=1) > 0)
    dead = is_rate_prod & (total <= 1e-14)
    g_total = jnp.full_like(g, -1.0)
    return jnp.where(dead[:, None], g_total, g)


def control_distribution(control, comp_frac):
    """Rate-distribution vector g such that the rate-control residual is
    g.qs - target (addWellControlEq:838-997). Production rates are negative
    in qs, targets positive, hence negative entries for producers."""
    nw = control.shape[0]
    g = jnp.zeros((nw, 3))
    g = jnp.where((control == CTRL_ORAT)[:, None],
                  jnp.array([0.0, -1.0, 0.0]), g)
    g = jnp.where((control == CTRL_WRAT)[:, None],
                  jnp.array([-1.0, 0.0, 0.0]), g)
    g = jnp.where((control == CTRL_GRAT)[:, None],
                  jnp.array([0.0, 0.0, -1.0]), g)
    g = jnp.where((control == CTRL_LRAT)[:, None],
                  jnp.array([-1.0, -1.0, 0.0]), g)
    g = jnp.where((control == CTRL_SURFACE_RATE)[:, None], comp_frac, g)
    return g


def well_residuals(wd, qs, bhp, cq_s, control, target, *, resv_coef=None,
                   vfp=None):
    """(flux_res (nw,3), ctrl_res (nw,)).

    flux_res: q_s - sum_perf cq_s (addWellFluxEq).
    ctrl_res: bhp - target (BHP), g.qs - target (rate controls; RESV uses
    voidage coefficients), or bhp - VFP(thp_target, rates) - dp_datum for
    THP control (addWellControlEq's THP branch with the VFP lookup,
    StandardWells_impl.hpp:884-960).
    vfp: optional (tables tuple, slot (nw,), dp_corr (nw,)) — slot -1 means
    no table.
    """
    flux_res = qs - jnp.sum(cq_s, axis=1)
    g = control_distribution(control, wd["comp_frac"])
    if resv_coef is not None:
        is_resv = ((control == CTRL_RESV) |
                   (control == CTRL_RESERVOIR_RATE))[:, None]
        sign = jnp.where(wd["is_injector"], 1.0, -1.0)[:, None]
        g = jnp.where(is_resv, sign * resv_coef, g)
    g = effective_distribution(g, control, wd["is_injector"].astype(bool),
                               cq_s)
    is_bhp = (control == CTRL_BHP) | (control == CTRL_THP)
    rate_res = jnp.einsum("wp,wp->w", g, qs) - target
    # a rate-controlled well that cannot flow AT ALL (every perforation
    # clamped: zero flux AND zero bhp-sensitivity) has a structurally
    # singular well block under ANY rate distribution — pin its control
    # equation to the BHP limit instead (the reference operates unable
    # wells at their pressure limit, updateWellControls/aliveWells,
    # BlackoilModelBase_impl.hpp:838-997). Threshold is relative to the
    # target so near-zero trickles (~1e-6 of target) count as dead too.
    tot_flow = jnp.sum(jnp.abs(jnp.sum(cq_s, axis=1)), axis=1)
    is_rate = jnp.sum(jnp.abs(g), axis=1) > 0
    dead_all = is_rate & (tot_flow
                          <= jnp.maximum(1e-14, 1e-6 * jnp.abs(target)))
    bhp_target = target
    if vfp is not None:
        tables, slot, dp_corr = vfp
        bhp_vfp = jnp.zeros_like(bhp)
        for si, tab in enumerate(tables):
            vals = tab.bhp_at(qs, target) + dp_corr
            bhp_vfp = jnp.where(slot == si, vals, bhp_vfp)
        is_thp = control == CTRL_THP
        bhp_target = jnp.where(is_thp, bhp_vfp, target)
    ctrl_res = jnp.where(is_bhp, bhp - bhp_target, rate_res)
    ctrl_res = jnp.where(dead_all, bhp - wd["bhp_limit"], ctrl_res)
    # closed wells: pin rates to zero and bhp to the limit
    closed = ~wd["open"].astype(bool)
    flux_res = jnp.where(closed[:, None], qs, flux_res)
    ctrl_res = jnp.where(closed, bhp - wd["bhp_limit"], ctrl_res)
    return flux_res, ctrl_res


def wellbore_mixture_density(wd, cellq, qs, perf_rates=None):
    """Per-connection wellbore mixture densities rho_mix (nw, mp)
    (WellDensitySegmented computeConnectionDensities): surface-rate mixture
    partitioned with rs/rv into in-situ volumes. Column 0 (the shallowest,
    reference-depth-adjacent connection) is the density the reference uses
    for the VFP hydrostatic datum correction
    (computeHydrostaticCorrection, StandardWells_impl.hpp:918-960)."""
    c = wd["perf_cell"]
    # rho_avg: saturation-weighted fallback; sd: (nw, mp, 3) (w,o,g)
    b, rs, rv, rho_cell, sd = _perf_fields(
        cellq, c, ("b", "rs", "rv", "rho_avg", "surface_density"))

    if perf_rates is not None:
        # flow through segment above perf j = sum of perf rates j..end
        seg = jnp.cumsum(perf_rates[:, ::-1, :], axis=1)[:, ::-1, :]
        tot = jnp.sum(seg, axis=-1, keepdims=True)
        ok = jnp.abs(tot) > _EPS
        frac = jnp.abs(seg) / jnp.maximum(jnp.sum(jnp.abs(seg), axis=-1,
                                                  keepdims=True), _EPS)
        fallback = wellbore_mixture(qs, wd["comp_frac"],
                                    wd["is_injector"])[:, None, :]
        mix3 = jnp.where(ok, frac, fallback)
        qw = mix3[..., WATER]
        qo = mix3[..., OIL]
        qg = mix3[..., GAS]
    else:
        mix = wellbore_mixture(qs, wd["comp_frac"],
                               wd["is_injector"])     # (nw, 3)
        qw = mix[:, None, WATER]
        qo = mix[:, None, OIL]
        qg = mix[:, None, GAS]
    d = jnp.maximum(1.0 - rs * rv, _EPS)
    vol_w = qw / jnp.maximum(b[..., WATER], _EPS)
    vol_o = (qo - rv * qg) / d / jnp.maximum(b[..., OIL], _EPS)
    vol_g = (qg - rs * qo) / d / jnp.maximum(b[..., GAS], _EPS)
    vol = vol_w + vol_o + vol_g
    mass = (qw * sd[..., WATER] + qo * sd[..., OIL] + qg * sd[..., GAS])
    return jnp.where(vol > _EPS, mass / jnp.maximum(vol, _EPS), rho_cell)


def connection_pressure_offsets(wd, cellq, qs, perf_rates=None):
    """Explicit wellbore hydrostatic pressure offsets cdp (nw, mp).

    WellDensitySegmented semantics (WellDensitySegmented.hpp:40-75): mixture
    density from surface rates partitioned with rs/rv into in-situ volumes;
    hydrostatic integration from the well reference depth down the
    depth-sorted perforation list. With perf_rates (nw, mp, 3) — the
    previous iteration's perforation surface rates, as the reference's
    perfPhaseRates — the segment mixture is the CUMULATIVE flow above each
    perforation; otherwise the well-level mixture is used."""
    mask = wd["perf_mask"].astype(jnp.float64)
    rho_mix = wellbore_mixture_density(wd, cellq, qs, perf_rates)

    z = wd["perf_depth"]
    zprev = jnp.concatenate([wd["ref_depth"][:, None], z[:, :-1]], axis=1)
    # segment density = the deeper connection's mixture density
    # (computeConnectionPressureDelta semantics, pinned by the reference's
    # tests/test_welldensitysegmented.cpp expected values)
    dz = (z - zprev) * mask
    dp = wd["gravity"] * rho_mix * dz
    return jnp.cumsum(dp, axis=1)


def well_potentials(wd, cellq, cdp):
    """Phase production/injection potentials at the wells' BHP limits
    (computeWellPotentials, StandardWells_impl.hpp:1005): the surface rates
    each well could deliver with its pressure constraint active. Used for
    guide rates. Returns (nw, 3), production positive for producers."""
    bhp = wd["bhp_limit"]
    qs0 = jnp.zeros((bhp.shape[0], 3))
    cq = perforation_fluxes(wd, cellq, bhp, qs0, cdp, allow_crossflow=False)
    tot = jnp.sum(cq, axis=1)
    return jnp.where(wd["is_injector"][:, None], tot, -tot)


def update_controls(wd, bhp, qs, control, target, cq_sum=None):
    """First-broken-constraint switching (updateWellControls,
    StandardWells_impl.hpp:712-790): walk EVERY constraint the well
    carries — BHP limit, THP limit (BHP target via the VFP tables already
    on device, :884-960), producer ORAT/WRAT/GRAT/LRAT/RESV limits,
    injector surface/reservoir rate limits — and switch to the first one
    violated that is not already the active control, with its target.
    This subsumes the primary<->BHP switching and adds the secondary-limit
    switches the reference performs (an ORAT producer that trips its WRAT
    limit moves to WRAT control; a THP-limited well moves to THP control).

    cq_sum (nw, 3), the current summed perforation rates, additionally
    switches rate-controlled producers whose CONTROLLED phase cannot flow
    (while others can — e.g. watered-out ORAT wells) to their BHP limit:
    their rate equation is unsatisfiable (zero deliverability in the
    controlled phase makes the bhp column singular)."""
    is_inj = wd["is_injector"].astype(bool)
    primary = wd["primary_control"]
    primary_target = wd["primary_target"]
    prod = jnp.maximum(-qs, 0.0)
    inj = jnp.maximum(qs, 0.0)
    eps = 1e-10

    # pressure-limit violation
    viol_bhp = jnp.where(is_inj, bhp > wd["bhp_limit"],
                         bhp < wd["bhp_limit"])
    if cq_sum is not None:
        gd = control_distribution(control, wd["comp_frac"])
        cprod = jnp.maximum(-cq_sum, 0.0)
        sel = (jnp.abs(gd) > 0.0).astype(cprod.dtype)
        controlled = jnp.sum(sel * cprod, axis=1)
        total = jnp.sum(cprod, axis=1)
        ctrl_dead = (~is_inj & (jnp.sum(jnp.abs(gd), axis=1) > 0)
                     & (controlled <= 1e-10 * jnp.maximum(total, 1e-30))
                     & (total > 1e-14))
        viol_bhp = viol_bhp | ctrl_dead

    # ordered candidate list [(code, violated, target)] — BHP (the hard
    # physical backstop) first, then THP, then rate limits
    candidates = [(CTRL_BHP, viol_bhp, wd["bhp_limit"])]

    thp_lim = wd.get("thp_limit")
    vfp = wd.get("vfp")
    if vfp is not None and thp_lim is not None:
        # the BHP the well would need to sustain its THP limit; the THP
        # constraint is broken when the well operates beyond it
        tables, slot, dp_corr = vfp
        bhp_thp = jnp.zeros_like(bhp)
        for si, tab in enumerate(tables):
            vals = tab.bhp_at(qs, thp_lim) + dp_corr
            bhp_thp = jnp.where(slot == si, vals, bhp_thp)
        has = jnp.isfinite(thp_lim) & (slot >= 0)
        viol_thp = has & jnp.where(is_inj, bhp > bhp_thp, bhp < bhp_thp)
        candidates.append((CTRL_THP, viol_thp, thp_lim))

    rt = wd.get("rate_targets")
    is_hist = wd.get("is_history")
    if rt is not None:
        cur = {CTRL_ORAT: (prod[:, OIL], rt[:, 0]),
               CTRL_WRAT: (prod[:, WATER], rt[:, 1]),
               CTRL_GRAT: (prod[:, GAS], rt[:, 2]),
               CTRL_LRAT: (prod[:, OIL] + prod[:, WATER], rt[:, 3])}
        resv_coef = wd.get("resv_coef")
        if resv_coef is not None:
            cur[CTRL_RESV] = (jnp.sum(prod * resv_coef, axis=1), rt[:, 4])
        for code, (rate, lim) in cur.items():
            # the primary control's target may have been recomputed
            # (group distribution, WCONHIST RESV voidage) — prefer it
            lim = jnp.where(primary == code, primary_target, lim)
            mask = ~is_inj & jnp.isfinite(lim)
            if is_hist is not None:
                # WCONHIST rate_targets are observed rates, not limits;
                # only the primary-control target applies
                mask = mask & (~is_hist.astype(bool) | (primary == code))
            viol = mask & (rate > lim * (1.0 + eps))
            candidates.append((code, viol, lim))

    irt = wd.get("inj_rate_target")
    if irt is not None:
        lim = jnp.where(primary == CTRL_SURFACE_RATE, primary_target, irt)
        viol = (is_inj & jnp.isfinite(lim)
                & (jnp.sum(inj, axis=1) > lim * (1.0 + eps)))
        candidates.append((CTRL_SURFACE_RATE, viol, lim))
        irv = wd.get("inj_resv_target")
        resv_coef = wd.get("resv_coef")
        if irv is not None and resv_coef is not None:
            lim = jnp.where(primary == CTRL_RESERVOIR_RATE,
                            primary_target, irv)
            viol = (is_inj & jnp.isfinite(lim)
                    & (jnp.sum(inj * resv_coef, axis=1)
                       > lim * (1.0 + eps)))
            candidates.append((CTRL_RESERVOIR_RATE, viol, lim))

    new_control, new_target = control, target
    chosen = jnp.zeros(bhp.shape, dtype=bool)
    for code, viol, tgt in candidates:
        hit = viol & (control != code) & ~chosen
        new_control = jnp.where(hit, jnp.full_like(control, code),
                                new_control)
        new_target = jnp.where(hit, tgt, new_target)
        chosen = chosen | hit
    closed = ~wd["open"].astype(bool)
    new_control = jnp.where(closed, control, new_control)
    new_target = jnp.where(closed, target, new_target)

    # per-Newton group reallocation (updateWellTargets / setupGroupControl,
    # BlackoilModelBase_impl.hpp:779-792, 2548-2596): members that fell to
    # their BHP limit contribute whatever they can make; the remaining
    # group target is redistributed over the members still on group
    # control. Shares are proportional to the members' CURRENT targets
    # (which entered the step proportional to the guide rates — identical
    # shares, but consistent with the span path's per-step re-distribution
    # of targets), falling back to the step-start guides when all current
    # targets are zero.
    for spec in wd.get("groups", ()):
        code, pv, total, mask, guides, sign = spec[:6]
        on_grp = (mask > 0.0) & (new_control == code)
        on_bhp = (mask > 0.0) & (new_control == CTRL_BHP)
        made = jnp.maximum(sign * (qs @ pv), 0.0)
        absorbed = jnp.sum(jnp.where(on_bhp, made, 0.0))
        remaining = jnp.maximum(total - absorbed, 0.0)
        g_dyn = jnp.where(on_grp, jnp.abs(new_target), 0.0)
        g_dyn = jnp.where(jnp.sum(g_dyn) > 0.0, g_dyn,
                          jnp.where(on_grp, guides, 0.0))
        share = g_dyn / jnp.maximum(jnp.sum(g_dyn), 1e-300)
        new_target = jnp.where(on_grp, remaining * share, new_target)
    return new_control, new_target
