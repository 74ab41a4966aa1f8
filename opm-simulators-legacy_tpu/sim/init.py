"""Initial-state computation: EQUIL equilibration and explicit deck init.

Re-implements the reference's initStateEquil
(/root/reference/opm/core/simulator/initStateEquil.hpp:233
InitialStateComputer + EquilibrationHelpers.hpp:178-700): per-EQLNUM-region
integration of hydrostatic phase-pressure columns from the datum (here a
fixed-step ``lax.scan`` march instead of the reference's RK4 ODE solver),
RSVD/PBVD dissolved-gas columns, capillary-pressure inversion for the
saturation profile (satFromPc), and sharp contacts when the capillary curves
are degenerate. Also initStateBasic-style explicit init from PRESSURE/SWAT/
SGAS/RS arrays (/root/reference/opm/core/simulator/initState.hpp:76-218).
"""

from __future__ import annotations

from contextlib import nullcontext

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.models.state import (HC_GASOIL, BlackoilState, init_hcstate)
from opm_tpu.utils.tables import interp
from opm_tpu.wells.wells import CTRL_BHP

_NZ = 2000  # column resolution


def _equil_device_ctx():
    """Pin the equilibration's eager jnp work to the host CPU backend.

    EQUIL is O(nc) latency-bound setup: hundreds of tiny ops (column scans,
    interps, capillary inversions). On a tunneled TPU each eager dispatch
    costs ~0.5-1 s of round-trip, so a 113k-cell init took ~2 minutes of
    wall time for milliseconds of compute. All results are pulled back to
    numpy and only the finished state is shipped to the accelerator, so the
    physics is identical (tests run this exact code on CPU already)."""
    if jax.default_backend() == "cpu":
        return nullcontext()
    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:
        return nullcontext()


def _integrate_column(z_grid, z0, p0, rho_fn):
    """March p along z_grid (ascending depth) from anchor (z0, p0):
    dp/dz = rho(p, z) * g, midpoint rule, both directions."""
    n = z_grid.shape[0]
    i0 = jnp.clip(jnp.searchsorted(z_grid, z0), 0, n - 1)
    # pressure at the nearest grid point below/above the anchor
    p_at = p0 + rho_fn(p0, z0) * (z_grid[i0] - z0)

    def down_step(p, i):
        dz = z_grid[i] - z_grid[i - 1]
        p_mid = p + rho_fn(p, z_grid[i - 1]) * 0.5 * dz
        p_new = p + rho_fn(p_mid, z_grid[i - 1] + 0.5 * dz) * dz
        take = i > i0
        p = jnp.where(take, p_new, p)
        return p, p

    def up_step(p, i):
        dz = z_grid[i + 1] - z_grid[i]
        p_mid = p - rho_fn(p, z_grid[i + 1]) * 0.5 * dz
        p_new = p - rho_fn(p_mid, z_grid[i + 1] - 0.5 * dz) * dz
        take = i < i0
        p = jnp.where(take, p_new, p)
        return p, p

    _, p_down = jax.lax.scan(down_step, p_at, jnp.arange(1, n))
    _, p_up = jax.lax.scan(up_step, p_at, jnp.arange(0, n - 1),
                           reverse=True)
    p = jnp.concatenate([p_up, jnp.array([p_at])])
    p = p.at[1:].set(jnp.where(jnp.arange(1, n) > i0, p_down, p[1:]))
    p = p.at[i0].set(p_at)
    return p


def equilibrate_region(grid, props, rec, cells, rsvd=None, rvvd=None,
                       pdvd=None,
                       pbvd=None):
    """Phase pressures + saturations + rs/rv for the active cells of one
    equilibration region. Returns numpy arrays over `cells`."""
    g = grid.gravity
    depth = grid.depth[cells]
    reg_pvt = grid.pvtnum[cells]
    reg_sat = grid.satnum[cells]
    pvt0 = int(np.bincount(reg_pvt).argmax()) if len(reg_pvt) else 0

    zmin = min(depth.min(), rec.datum_depth, rec.woc_depth, rec.goc_depth) - 1.0
    zmax = max(depth.max(), rec.datum_depth, rec.woc_depth, rec.goc_depth) + 1.0
    z = jnp.linspace(zmin, zmax, _NZ)

    # dissolved-gas column: RSVD table or saturated at current p
    if rsvd is not None:
        rs_of_z = lambda zz: interp(jnp.asarray(rsvd[:, 0]),
                                    jnp.asarray(rsvd[:, 1]), zz,
                                    extrap="clamp")
    else:
        rs_of_z = None
    if pbvd is not None:
        pb_of_z = lambda zz: interp(jnp.asarray(pbvd[:, 0]),
                                    jnp.asarray(pbvd[:, 1]), zz,
                                    extrap="clamp")
    else:
        pb_of_z = None

    def rho_o(p, zz):
        if not props.disgas:
            return props.rho_oil(p, jnp.zeros_like(p), pvt0) * g
        if rs_of_z is not None:
            rs = jnp.minimum(rs_of_z(zz), props.rs_sat(p, pvt0))
        elif pb_of_z is not None:
            rs = props.rs_sat(jnp.minimum(pb_of_z(zz), p), pvt0)
        else:
            rs = props.rs_sat(p, pvt0)
        return props.rho_oil(p, rs, pvt0) * g

    def rho_w(p, zz):
        return props.rho_water(p, pvt0) * g

    def rho_g(p, zz):
        rv = props.rv_sat(p, pvt0) if props.vapoil else jnp.zeros_like(p)
        return props.rho_gas(p, rv, pvt0) * g

    po = _integrate_column(z, rec.datum_depth, rec.datum_pressure, rho_o)
    # anchor water at WOC, gas at GOC (EquilibrationHelpers PhasePressure)
    po_woc = interp(z, po, jnp.asarray(rec.woc_depth))
    pw = _integrate_column(z, rec.woc_depth, po_woc - rec.woc_pc, rho_w)
    po_goc = interp(z, po, jnp.asarray(rec.goc_depth))
    pg = _integrate_column(z, rec.goc_depth, po_goc + rec.goc_pc, rho_g)

    zc = jnp.asarray(depth)
    po_c = interp(z, po, zc)
    pw_c = interp(z, pw, zc)
    pg_c = interp(z, pg, zc)

    # saturations from capillary inversion / sharp contacts
    sf = props.satfunc
    swco = np.asarray(sf.swco)[np.asarray(reg_sat)] if sf is not None else \
        np.zeros(len(depth))
    pcow_range = float(jnp.max(jnp.abs(sf.pcow))) if sf is not None else 0.0
    pcgo_range = float(jnp.max(jnp.abs(sf.pcgo))) if sf is not None else 0.0

    if sf is not None and pcow_range > 1e-9:
        sw = np.asarray(sf.pcow_inverse(po_c - pw_c, jnp.asarray(reg_sat)))
    else:
        sw = np.where(np.asarray(zc) > rec.woc_depth, 1.0, swco)
    if sf is not None and pcgo_range > 1e-9:
        # invert pcgo(sg) = pg - po (increasing in sg)
        pc = pg_c - po_c
        sg = np.asarray(_invert_increasing(sf.sg, sf.pcgo,
                                           jnp.asarray(pc),
                                           jnp.asarray(reg_sat)))
        sg = np.where(np.asarray(zc) < rec.goc_depth, sg, 0.0)
    else:
        sg = np.where(np.asarray(zc) < rec.goc_depth, 1.0 - swco, 0.0)
    sg = np.clip(sg, 0.0, 1.0 - sw)

    # rs / rv per cell
    rssat_c = np.asarray(props.rs_sat(po_c, jnp.asarray(reg_pvt)))
    if props.disgas:
        if rsvd is not None:
            rs_c = np.minimum(np.interp(np.asarray(zc), rsvd[:, 0],
                                        rsvd[:, 1]), rssat_c)
        elif pbvd is not None:
            pb = np.interp(np.asarray(zc), pbvd[:, 0], pbvd[:, 1])
            rs_c = np.asarray(props.rs_sat(
                jnp.minimum(jnp.asarray(pb), po_c), jnp.asarray(reg_pvt)))
        else:
            rs_c = rssat_c
    else:
        rs_c = np.zeros(len(depth))
    rvsat_c = np.asarray(props.rv_sat(pg_c, jnp.asarray(reg_pvt)))
    if props.vapoil:
        if rvvd is not None:
            rv_c = np.minimum(np.interp(np.asarray(zc), rvvd[:, 0],
                                        rvvd[:, 1]), rvsat_c)
        elif pdvd is not None:
            # dew-point-vs-depth table: rv = rv_sat at min(pd(z), pg)
            # (EquilibrationHelpers.hpp PDVD role)
            pd = np.interp(np.asarray(zc), pdvd[:, 0], pdvd[:, 1])
            rv_c = np.asarray(props.rv_sat(
                jnp.minimum(jnp.asarray(pd), pg_c), jnp.asarray(reg_pvt)))
        else:
            rv_c = rvsat_c
    else:
        rv_c = np.zeros(len(depth))

    return (np.asarray(po_c), sw, sg, rs_c, rv_c)


def _invert_increasing(s_tab, pc_tab, pc, reg):
    from opm_tpu.props.satfunc import _interp_reg
    return _interp_reg(pc_tab, s_tab, pc, reg)


def initial_state(grid, props, case, nw: int) -> BlackoilState:
    """Full initial BlackoilState from the deck SOLUTION section
    (FlowMain.hpp:594-694 setupState)."""
    nc = grid.nc
    sol = case.solution
    pcw_mult = None
    with _equil_device_ctx():
        if sol.pressure is not None:
            p = np.asarray(sol.pressure)[grid.global_cell]
            sw = np.asarray(sol.swat)[grid.global_cell] \
                if sol.swat is not None else np.zeros(nc)
            sg = np.asarray(sol.sgas)[grid.global_cell] \
                if sol.sgas is not None else np.zeros(nc)
            rs = np.asarray(sol.rs)[grid.global_cell] \
                if sol.rs is not None \
                else np.asarray(props.rs_sat(jnp.asarray(p),
                                             jnp.asarray(grid.pvtnum)))
            rv = np.asarray(sol.rv)[grid.global_cell] \
                if sol.rv is not None else np.zeros(nc)
        elif sol.equil:
            p = np.zeros(nc)
            sw = np.zeros(nc)
            sg = np.zeros(nc)
            rs = np.zeros(nc)
            rv = np.zeros(nc)
            eql = grid.eqlnum
            for ireg, rec in enumerate(sol.equil):
                cells = np.nonzero(np.asarray(eql) == ireg)[0]
                if len(cells) == 0:
                    continue
                rsvd = sol.rsvd[ireg] if ireg < len(sol.rsvd) else None
                rvvd = sol.rvvd[ireg] if ireg < len(sol.rvvd) else None
                pbvd = sol.pbvd[ireg] if ireg < len(sol.pbvd) else None
                pdvd = sol.pdvd[ireg] if ireg < len(sol.pdvd) else None
                po_c, sw_c, sg_c, rs_c, rv_c = equilibrate_region(
                    grid, props, rec, cells, rsvd=rsvd, rvvd=rvvd,
                    pdvd=pdvd, pbvd=pbvd)
                p[cells] = po_c
                sw[cells] = sw_c
                sg[cells] = sg_c
                rs[cells] = rs_c
                rv[cells] = rv_c
        else:
            raise ValueError(
                "deck has neither EQUIL nor explicit initial state")

        # SWATINIT: honor the given initial water saturation by scaling the
        # capillary curve per cell (setSwatInitScaling,
        # BlackoilPropsAdFromDeck.hpp + FlowMain.hpp:594-694 setupState)
        if "SWATINIT" in case.grid_arrays and sol.equil and \
                props.satfunc is not None:
            swinit = np.asarray(
                case.grid_arrays["SWATINIT"])[grid.global_cell]
            sf = props.satfunc
            reg = jnp.asarray(grid.satnum)
            swco = np.asarray(sf.swco)[np.asarray(grid.satnum)]
            swi = np.clip(swinit, swco, 1.0)
            # equilibrium pc (= pcow at the equilibrated sw, by construction
            # of the capillary inversion) vs the table pc at sw = swatinit
            pc_eff = np.asarray(
                sf.capillary(jnp.asarray(sw), jnp.asarray(sg), reg)[0])
            pc_tab = np.asarray(
                sf.capillary(jnp.asarray(swi), jnp.asarray(sg), reg)[0])
            good = (np.abs(pc_tab) > 1e-12) & (pc_eff > 0) & (swi < 1.0)
            factor = np.where(good, pc_eff / np.where(good, pc_tab, 1.0),
                              1.0)
            sw = np.where(good, swi, sw)
            pcw_mult = factor
    if pcw_mult is not None:
        # assign OUTSIDE the CPU context: the multiplier is closed over by
        # jit traces and must stay an uncommitted default-device array
        props.satfunc.pcw_mult = jnp.asarray(pcw_mult)

    hc = init_hcstate(jnp.asarray(sw), jnp.asarray(sg),
                      disgas=props.disgas, vapoil=props.vapoil)
    is_rs = hc == 1
    is_rv = hc == 2
    x = jnp.where(is_rs, jnp.asarray(rs),
                  jnp.where(is_rv, jnp.asarray(rv), jnp.asarray(sg)))
    return BlackoilState(
        pressure=jnp.asarray(p), sw=jnp.asarray(sw), x=x,
        hcstate=hc,
        bhp=jnp.zeros(nw), qs=jnp.zeros((nw, 3)),
        control=jnp.zeros(nw, dtype=jnp.int32),
        target=jnp.zeros(nw))
