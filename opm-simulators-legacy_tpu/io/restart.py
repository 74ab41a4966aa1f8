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
        sgmax=jnp.asarray(z["sgmax"]) if "sgmax" in z.files else None)
    meta = dict(report_step=int(z["report_step"]), time=float(z["time"]),
                suggested_dt=float(z["suggested_dt"]))
    meta["extra"] = {k[6:]: z[k] for k in z.files if k.startswith("extra_")}
    return state, meta
