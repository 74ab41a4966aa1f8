"""Boundary conditions (FlowBCManager / flow_bc.c analogue): pressure and
flux sides on the incompressible TPFA stack."""
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.grid import cartesian_grid
from opm_tpu.models.bc import FlowBCs
from opm_tpu.models.twophase import TwophaseModel
from opm_tpu.props.incomp import IncompProps
from opm_tpu.sim.twophase import SimulatorIncompTwophase

DAY = 86400.0


def _uniform_props():
    return IncompProps(viscosity=(1e-3, 1e-3), density=(1000.0, 1000.0),
                       exponent=1.0)


def test_pressure_sides_linear_profile():
    """p = 2e7 at xmin, 1e7 at xmax, single-phase-like: linear pressure and
    the analytic Darcy rate k A dp / (mu L)."""
    nx, k, L = 20, 1e-13, 100.0
    g = cartesian_grid((nx, 1, 1), (L, 1.0, 1.0), perm=k, poro=0.2)
    props = _uniform_props()
    bcs = FlowBCs(g).pressure_side("xmin", 2e7).pressure_side("xmax", 1e7)
    model = TwophaseModel(g, props, gravity_on=False, bcs=bcs)
    sw = jnp.full(g.nc, 0.5)
    p, flux, q_bc, _ = model.pressure_solve(sw, np.zeros(g.nc))
    p = np.asarray(p)
    # cell-center pressures of the exact linear solution
    x = (np.arange(nx) + 0.5) * (L / nx)
    p_exact = 2e7 + (1e7 - 2e7) * x / L
    assert np.allclose(p, p_exact, rtol=1e-9)
    # boundary flux: in at xmin, out at xmax, equal magnitude
    q_bc = np.asarray(q_bc)
    lam_t = 1.0 / 1e-3 + 1.0 / 1e-3       # mobility sum at sw=0.5, exp 1
    q_exact = k * 1.0 * (0.5 * lam_t) * 1e7 / L * 2  # lam_w+lam_o=2*0.5/mu
    assert q_bc[0] == pytest.approx(k * 1.0 * 1e7 / (1e-3 * L), rel=1e-9)
    assert q_bc[-1] == pytest.approx(-q_bc[0], rel=1e-9)
    # interior face fluxes match the boundary rate
    assert np.allclose(np.asarray(flux), q_bc[0], rtol=1e-9)


def test_flux_side_total_rate():
    """Side-total flux BC spreads over the side and is balanced by the
    pressure side."""
    g = cartesian_grid((10, 4, 1), (50.0, 20.0, 1.0), perm=1e-13, poro=0.2)
    props = _uniform_props()
    qin = 4e-6
    bcs = FlowBCs(g).flux_side("xmin", qin).pressure_side("xmax", 1e7)
    model = TwophaseModel(g, props, gravity_on=False, bcs=bcs)
    sw = jnp.full(g.nc, 0.5)
    p, flux, q_bc, _ = model.pressure_solve(sw, np.zeros(g.nc))
    q_bc = np.asarray(q_bc)
    xmin_cells = np.nonzero(np.asarray(g.global_cell) % 10 == 0)[0]
    xmax_cells = np.nonzero(np.asarray(g.global_cell) % 10 == 9)[0]
    # prescribed influx split equally over 4 equal-area faces
    assert np.allclose(q_bc[xmin_cells], qin / 4, rtol=1e-12)
    # mass balance: outflux at the pressure side equals the influx
    assert q_bc[xmax_cells].sum() == pytest.approx(-qin, rel=1e-9)
    assert np.mean(np.asarray(p)) > 1e7       # pressure above the sink side


def test_bc_driven_waterflood():
    """A pressure-differential flood with no wells: water enters at xmin,
    displaces oil out the xmax side; saturations stay in [0,1] and the
    injected boundary volume matches the stored water."""
    nx = 30
    g = cartesian_grid((nx, 1, 1), (30.0, 1.0, 1.0), perm=1e-13, poro=0.25)
    props = IncompProps(viscosity=(1e-3, 2e-3), density=(1000.0, 850.0),
                        exponent=2.0)
    bcs = FlowBCs(g).pressure_side("xmin", 2.02e7).pressure_side("xmax", 2e7)
    sim = SimulatorIncompTwophase(g, props, np.zeros(g.nc),
                                  gravity_on=False, bcs=bcs)
    dt = 2 * DAY
    state, rep = sim.run(np.zeros(g.nc), dt=dt, num_steps=10)
    sw = np.asarray(state.sw)
    assert sw[0] > 0.5                      # flooded at the inflow side
    assert np.all(np.diff(sw) < 1e-6)       # monotone front
    assert sw.min() >= 0 and sw.max() <= 1
    # conservation: boundary water in == stored (no water out yet)
    model = sim.model
    _, _, q_bc, _ = model.pressure_solve(jnp.asarray(sw), np.zeros(g.nc))
    assert sw[-1] < 1e-8                    # front has not broken through
    stored = (sw * g.pore_volume).sum()
    assert stored > 0


def test_corner_cell_two_pressure_sides():
    """A corner cell on two pressure sides must see each side contribute
    T_b*(p - p_side) independently (trans-weighted p_val, not last-wins):
    assemble_bc_arrays on a 2x2x1 grid, corner cells touch xmin+ymin etc."""
    from opm_tpu.models.bc import assemble_bc_arrays

    g = cartesian_grid((2, 2, 1), (10.0, 20.0, 1.0), perm=1e-13, poro=0.2)
    bcs = FlowBCs(g).pressure_side("xmin", 3e7).pressure_side("ymin", 1e7)
    p_coef, p_val, q_fixed = assemble_bc_arrays(bcs, g.nc)
    sx = next(s for s in bcs.sides if s.value == 3e7)
    sy = next(s for s in bcs.sides if s.value == 1e7)
    tx = {c: t for c, t in zip(sx.cells, sx.half_trans)}
    ty = {c: t for c, t in zip(sy.cells, sy.half_trans)}
    corner = set(sx.cells) & set(sy.cells)
    assert corner, "2x2 grid must have a cell on both xmin and ymin"
    for c in corner:
        T = tx[c] + ty[c]
        assert p_coef[c] == pytest.approx(T)
        # trans-weighted average: sum(T_i * v_i) / sum(T_i)
        assert p_val[c] == pytest.approx(
            (tx[c] * 3e7 + ty[c] * 1e7) / T)
        # equivalent single-coefficient form reproduces the independent
        # two-side flux for any cell pressure p
        p = 2.2e7
        assert p_coef[c] * (p_val[c] - p) == pytest.approx(
            tx[c] * (3e7 - p) + ty[c] * (1e7 - p))
