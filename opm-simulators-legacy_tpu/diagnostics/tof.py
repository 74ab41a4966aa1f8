"""Time-of-flight and tracer by upwind finite volumes.

Re-implements TofReorder (/root/reference/opm/core/flowdiagnostics/
TofReorder.hpp:43-117: v . grad(tof) = porevolume, solved cell-by-cell in
upwind order, tracer variant solveTofTracer) as wavefront sweeps: the local
update  tof_i = (pv_i + sum_in |f| tof_up) / sum_out |f|  is evaluated for
every cell simultaneously and repeated; after `nlevels` sweeps (from
native/tarjan.cpp) the acyclic part is exact, extra sweeps converge SCC
loops Gauss-Seidel-style (the reference's multicell handling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from opm_tpu.native.graph import upwind_levels


def _sweep_structure(face_cells, flux, nc):
    c1 = face_cells[:, 0]
    c2 = face_cells[:, 1]
    absf = jnp.abs(flux)
    pos = flux >= 0
    upcell = jnp.where(pos, c1, c2)
    downcell = jnp.where(pos, c2, c1)
    return upcell, downcell, absf


def _tof_sweep(tof, upcell, downcell, absf, pv, outflux):
    influx = jnp.zeros_like(tof).at[downcell].add(absf * tof[upcell])
    return (pv + influx) / outflux


def solve_tof(face_cells, flux, pore_volume, source, *, nsweeps=None):
    """Forward time-of-flight from inflow (source > 0). For backward TOF
    (from producers), call with flux negated and source = -source."""
    nc = len(pore_volume)
    face_cells = jnp.asarray(face_cells)
    flux = jnp.asarray(flux)
    pv = jnp.asarray(pore_volume)
    src = jnp.asarray(source)
    upcell, downcell, absf = _sweep_structure(face_cells, flux, nc)
    outflux = jnp.zeros(nc).at[upcell].add(absf) + jnp.maximum(-src, 0.0)
    outflux = jnp.maximum(outflux, 1e-300)
    if nsweeps is None:
        sched = upwind_levels(nc, np.asarray(face_cells), np.asarray(flux))
        nsweeps = sched.nlevels + (30 if sched.max_scc > 1 else 1)

    def body(_, tof):
        return _tof_sweep(tof, upcell, downcell, absf, pv, outflux)

    tof0 = pv / outflux
    tof = jax.lax.fori_loop(0, int(nsweeps), body, tof0)
    return tof


def solve_tof_tracer(face_cells, flux, pore_volume, source, tracer_heads,
                     *, nsweeps=None):
    """TOF plus tracer partitions (solveTofTracer, TofReorder.hpp:75).

    tracer_heads: list of arrays of cell indices, one per tracer (injector);
    returns (tof (nc,), tracer (ntracer, nc)) with tracer in [0,1]."""
    nc = len(pore_volume)
    face_cells = jnp.asarray(face_cells)
    flux = jnp.asarray(flux)
    pv = jnp.asarray(pore_volume)
    src = jnp.asarray(source)
    upcell, downcell, absf = _sweep_structure(face_cells, flux, nc)
    outflux = jnp.zeros(nc).at[upcell].add(absf) + jnp.maximum(-src, 0.0)
    influx_tot = jnp.zeros(nc).at[downcell].add(absf) + jnp.maximum(src, 0.0)
    if nsweeps is None:
        sched = upwind_levels(nc, np.asarray(face_cells), np.asarray(flux))
        nsweeps = sched.nlevels + (30 if sched.max_scc > 1 else 1)

    tof = solve_tof(face_cells, flux, pore_volume, source, nsweeps=nsweeps)

    ntr = len(tracer_heads)
    conc = jnp.zeros((ntr, nc))
    head_mask = jnp.zeros((ntr, nc))
    for t, cells in enumerate(tracer_heads):
        head_mask = head_mask.at[t, jnp.asarray(cells)].set(1.0)

    def body(_, conc):
        cin = jnp.zeros((ntr, nc)).at[:, downcell].add(
            absf[None, :] * conc[:, upcell])
        # head cells carry their injected tracer at concentration 1
        out = cin / jnp.maximum(influx_tot, 1e-300)[None, :]
        return jnp.where(head_mask > 0, 1.0, out)

    conc = jax.lax.fori_loop(0, int(nsweeps), body, conc)
    return tof, conc
