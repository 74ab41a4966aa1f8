"""Checkpoint / restart.

The reference writes ECL-format restart files each report step and can
resume mid-run (BlackoilOutputWriter::writeTimeStep / initFromRestartFile,
/root/reference/opm/autodiff/SimulatorFullyImplicitBlackoilOutput.hpp:
229-288, restart regression tests in compareECLFiles.cmake:123-136). The
rebuild checkpoints the full solution state + stepper state as .npz — the
same capability (mid-run resume reproducing the uninterrupted run, verified
by tests/test_restart.py) with a TPU-friendly container.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from opm_tpu.models.state import BlackoilState

FORMAT_VERSION = 1


def save_restart(path: str, state: BlackoilState, *, report_step: int,
                 time: float, suggested_dt: float, extra: Optional[dict] = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = dict(
        version=FORMAT_VERSION, report_step=report_step, time=time,
        suggested_dt=suggested_dt,
        pressure=np.asarray(state.pressure), sw=np.asarray(state.sw),
        x=np.asarray(state.x), hcstate=np.asarray(state.hcstate),
        bhp=np.asarray(state.bhp), qs=np.asarray(state.qs),
        control=np.asarray(state.control), target=np.asarray(state.target))
    if state.sgmax is not None:
        payload["sgmax"] = np.asarray(state.sgmax)
    if state.somax is not None:
        payload["somax"] = np.asarray(state.somax)
    if extra:
        for k, v in extra.items():
            payload["extra_" + k] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_restart(path: str):
    """Returns (state, meta dict)."""
    z = np.load(path)
    state = BlackoilState(
        pressure=jnp.asarray(z["pressure"]), sw=jnp.asarray(z["sw"]),
        x=jnp.asarray(z["x"]),
        hcstate=jnp.asarray(z["hcstate"], dtype=jnp.int32),
        bhp=jnp.asarray(z["bhp"]), qs=jnp.asarray(z["qs"]),
        control=jnp.asarray(z["control"], dtype=jnp.int32),
        target=jnp.asarray(z["target"]),
        sgmax=jnp.asarray(z["sgmax"]) if "sgmax" in z.files else None,
        somax=jnp.asarray(z["somax"]) if "somax" in z.files else None)
    meta = dict(report_step=int(z["report_step"]), time=float(z["time"]),
                suggested_dt=float(z["suggested_dt"]))
    meta["extra"] = {k[6:]: z[k] for k in z.files if k.startswith("extra_")}
    return state, meta


def load_restart_unrst(path: str, report_step: int, case, props, model):
    """Resume from an ECL unified-restart file (the reference's
    initFromRestartFile path, SimulatorFullyImplicitBlackoilOutput.hpp:
    229-288 + FlowMain.hpp:845-846 RESTART/SKIPREST): rebuild the switched
    primary-variable state from PRESSURE/SWAT/SGAS/RS/RV, re-derive the
    hydroCarbonState classification (initHydroCarbonState), and recover
    well state + suggested dt from the OPM_XWEL/OPM_EXTRA extra arrays
    written by this framework's writer.

    Returns (state, meta) like load_restart."""
    from opm_tpu.io.eclsum import read_unrst
    from opm_tpu.models.state import (HC_GASOIL, HC_OILONLY,
                                      init_hcstate)

    steps = read_unrst(path)
    match = [s for s in steps if s["seqnum"] == report_step]
    if not match:
        raise FileNotFoundError(
            f"report step {report_step} not in {path} "
            f"(has {[s['seqnum'] for s in steps]})")
    st = match[-1]
    p_unit = (1e-5 if case.runspec.unit_system == "METRIC"
              else 1.0 / 6894.757293168361)

    grid = model.grid
    if grid.active_mask is not None:
        # embedded grid: file arrays cover the real active cells; padding
        # cells read through the donor map (grid.global_cell), exactly as
        # at initialization
        rc = grid.real_cells

        def expand(a):
            tmp = np.zeros(grid.nc)
            tmp[rc] = np.asarray(a)
            return tmp[np.asarray(grid.global_cell)]
    else:
        def expand(a):
            return np.asarray(a)

    p = jnp.asarray(expand(st["PRESSURE"])) / p_unit
    sw = jnp.asarray(expand(st["SWAT"]))
    sg = jnp.asarray(expand(st["SGAS"]))
    rs = jnp.asarray(expand(st.get("RS", np.zeros_like(st["SWAT"]))))
    rv = jnp.asarray(expand(st.get("RV", np.zeros_like(st["SWAT"]))))
    hc = init_hcstate(sw, sg, disgas=case.runspec.disgas,
                      vapoil=case.runspec.vapoil)
    x = jnp.where(hc == HC_GASOIL, sg,
                  jnp.where(hc == HC_OILONLY, rs, rv))
    xwel = np.asarray(st.get("OPM_XWEL", np.zeros(0)))
    nw = xwel.shape[0] // 6 if xwel.size else 0
    xwel = xwel.reshape(nw, 6) if nw else np.zeros((0, 6))
    state = BlackoilState(
        pressure=p, sw=sw, x=x, hcstate=hc,
        bhp=jnp.asarray(xwel[:, 0]), qs=jnp.asarray(xwel[:, 1:4]),
        control=jnp.asarray(xwel[:, 4], dtype=jnp.int32),
        target=jnp.asarray(xwel[:, 5]))
    extra = np.asarray(st.get("OPM_EXTRA", [86400.0]))
    meta = dict(report_step=int(st["seqnum"]),
                time=float(st["time_days"]) * 86400.0,
                suggested_dt=float(extra[0]), extra={})
    return state, meta
