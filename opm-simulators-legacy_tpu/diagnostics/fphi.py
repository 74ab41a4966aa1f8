"""Flow-capacity / storage-capacity diagnostics.

Re-implements /root/reference/opm/core/flowdiagnostics/FlowDiagnostics.hpp:
46-96 (.cpp 226): F-Phi curve from forward+backward TOF, Lorenz coefficient,
sweep efficiency, and injector-producer pair volumes from tracer fields.
"""

from __future__ import annotations

import numpy as np


def compute_f_phi(pore_volume, ftof, btof):
    """(F, Phi) curves: sort cells by residence time tof_f + tof_b; Phi is
    cumulative pore volume fraction, F cumulative flow-capacity fraction
    (pv/tof as throughput proxy — computeFandPhi)."""
    pv = np.asarray(pore_volume)
    tr = np.asarray(ftof) + np.asarray(btof)
    order = np.argsort(tr)
    pv_s = pv[order]
    flux_s = pv_s / np.maximum(tr[order], 1e-300)
    phi = np.concatenate([[0.0], np.cumsum(pv_s)]) / pv_s.sum()
    F = np.concatenate([[0.0], np.cumsum(flux_s)]) / flux_s.sum()
    return F, phi


def compute_lorenz(F, phi):
    """Lorenz coefficient: 2 * (area under F(phi) - 1/2) (computeLorenz)."""
    integral = np.trapezoid(F, phi)
    return 2.0 * (integral - 0.5)


def compute_sweep(F, phi):
    """Sweep efficiency curve (Ev, tD) (computeSweep): dimensionless time
    tD = dPhi/dF; Ev = phi + (1 - F) * tD."""
    dF = np.diff(F)
    dphi = np.diff(phi)
    good = dF > 1e-12
    tD = np.where(good, dphi / np.where(good, dF, 1.0), 0.0)
    Ev = phi[1:] + (1.0 - F[1:]) * tD
    return Ev, tD


def compute_well_pairs(pore_volume, inj_tracer, prod_tracer):
    """Pore volume associated with each (injector, producer) pair
    (computeWellPairs): vol[i, p] = sum_c pv_c * C_i(c) * C_p(c)."""
    pv = np.asarray(pore_volume)
    ci = np.asarray(inj_tracer)    # (ninj, nc)
    cp = np.asarray(prod_tracer)   # (nprod, nc)
    return np.einsum("ic,pc,c->ip", ci, cp, pv)
