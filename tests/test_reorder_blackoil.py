"""flow_reorder analogue: black-oil sequential with wavefront reorder
transport matches the Newton-transport sequential result."""
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.models.reorder_blackoil import connection_multiphase_upwind


def test_multiphase_upwind_cocurrent():
    # phase-leading (3, nf): two faces, all phases aligned with the flow
    dh = jnp.asarray([[1.0, -1.0], [1.0, -1.0], [1.0, -1.0]])
    mob = jnp.ones((3, 2))
    up = connection_multiphase_upwind(dh, mob, mob, jnp.ones(2),
                                      jnp.asarray([3.0, -3.0]))
    assert np.all(np.asarray(up[:, 0]))
    assert not np.any(np.asarray(up[:, 1]))


def test_multiphase_upwind_countercurrent():
    """Zero total flux + opposing buoyancy: heavy phase down, light up."""
    dh = jnp.asarray([[-1.0], [1.0], [0.5]])
    mob = jnp.ones((3, 1))
    up = connection_multiphase_upwind(dh, mob, mob, jnp.asarray([1.0]),
                                      jnp.asarray([0.0]))
    u = np.asarray(up[:, 0])
    assert not u[0] and u[1]  # water from cell2, oil from cell1


@pytest.mark.slow
def test_reorder_sequential_spe1():
    """One fixed-dt sequential step: reorder transport == Newton transport
    (same splitting, same dt — only the transport solver differs)."""
    import os

    from opm_tpu.io.eclstate import load_case
    from opm_tpu.models.blackoil import make_well_device_arrays
    from opm_tpu.models.sequential import (BlackoilSequentialModel,
                                           SequentialParams)
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil
    from opm_tpu.sim.init import initial_state

    spe1 = os.path.join(os.path.dirname(__file__), "..", "data",
                        "SPE1CASE2.DATA")
    case = load_case(spe1)
    sim = SimulatorFullyImplicitBlackoil(case)
    state0 = initial_state(sim.grid, sim.props, case, len(sim.well_names))
    ws = sim._pad_well_set(sim._well_set_for(sim.schedule.report_steps[0]))
    wd = make_well_device_arrays(ws, sim.grid.gravity)
    state0 = sim._init_well_state(state0, ws, True)
    dt = 2 * 86400.0

    seq_n = BlackoilSequentialModel(sim.model, SequentialParams())
    st_n, _ = seq_n.step(state0, dt, wd)
    seq_r = BlackoilSequentialModel(sim.model,
                                    SequentialParams(transport="reorder"))
    st_r, _ = seq_r.step(state0, dt, wd)

    p_r = np.asarray(st_r.pressure)
    p_n = np.asarray(st_n.pressure)
    assert np.abs(p_r - p_n).max() / p_n.mean() < 1e-4
    assert np.abs(np.asarray(st_r.sw) - np.asarray(st_n.sw)).max() < 1e-4
