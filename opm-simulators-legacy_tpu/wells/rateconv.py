"""Surface-rate -> reservoir-voidage conversion (RESV controls).

Re-implements /root/reference/opm/autodiff/RateConverterLegacy.hpp
(SurfaceToReservoirVoidage + AverageIncrementCalculator): per FIP region,
pore-volume-weighted averages of (p, rs, rv) define linear coefficients such
that reservoir voidage = coef . q_surface:

    V_w = q_w / b_w
    V_o = (q_o - rv q_g) / (d b_o)          d = 1 - rs rv
    V_g = (q_g - rs q_o) / (d b_g)

    coef = [1/b_w,  1/(d b_o) - rs/(d b_g),  1/(d b_g) - rv/(d b_o)]

Used by computeRESV (SimulatorBase_impl.hpp:196) and VREP group control.
The MPI-aware region averaging of the reference becomes jnp segment means
(sharding-ready: psum-able).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from opm_tpu.models.state import GAS, OIL, WATER


def region_averages(model, state, region, temperature=None):
    """PV-weighted (p, rs, rv) per FIP region (region: (nc,) 0-based).
    With a per-cell `temperature` array, also returns its PV-weighted
    region average as a 4th element (the reference's
    AverageIncrementCalculator averages T alongside p/rs/rv,
    RateConverterLegacy.hpp:60-120 — it matters once thermal PVT is
    active)."""
    q = model.cell_quantities(state)
    nreg = int(np.asarray(region).max()) + 1
    pv = getattr(model, "pv_out", model.pv)
    w = jnp.asarray(pv)

    def avg(x):
        num = jnp.zeros(nreg).at[region].add(w * x)
        den = jnp.zeros(nreg).at[region].add(w)
        return num / jnp.maximum(den, 1e-300)

    if temperature is not None:
        return (avg(q.po), avg(q.rs), avg(q.rv),
                avg(jnp.asarray(temperature)))
    return avg(q.po), avg(q.rs), avg(q.rv)


def voidage_coefficients(props, p_avg, rs_avg, rv_avg, pvtnum=0,
                         t_avg=None):
    """(nreg, 3) coefficients in (w, o, g) surface-rate order. t_avg:
    region-average temperature, forwarded to thermal-wrapped PVT objects
    (props/thermal.py ThermalWrapper) when the props carry them."""
    if t_avg is not None and hasattr(props, "with_temperature"):
        props = props.with_temperature(t_avg)
    bw = props.b_water(p_avg, pvtnum)
    bo = props.b_oil(p_avg, rs_avg, pvtnum)
    bg = props.b_gas(p_avg, rv_avg, pvtnum)
    d = jnp.maximum(1.0 - rs_avg * rv_avg, 1e-14)
    coef_w = 1.0 / bw
    coef_o = 1.0 / (d * bo) - rs_avg / (d * bg)
    coef_g = 1.0 / (d * bg) - rv_avg / (d * bo)
    return jnp.stack([coef_w, coef_o, coef_g], axis=-1)


def well_resv_coefficients(model, state, well_set):
    """(nw, 3) voidage coefficients per well, from the FIP region of the
    well's first perforation (computeRESV / SimFIBODetails semantics)."""
    region = jnp.asarray(model.grid.fipnum)
    p_avg, rs_avg, rv_avg = region_averages(model, state, region)
    coefs = voidage_coefficients(model.props, p_avg, rs_avg, rv_avg)
    first_cell = well_set.perf_cell[:, 0]
    wreg = np.asarray(region)[first_cell]
    return coefs[jnp.asarray(wreg)]
