"""Matlab-format per-step output (BlackoilMatlabWriter role,
/root/reference/opm/autodiff/SimulatorFullyImplicitBlackoilOutput.hpp:175-195
+ outputStateMatlab/outputWellStateMatlab)."""
import os

import numpy as np

from opm_tpu.io.matlab import (output_state_matlab, output_well_state_matlab,
                               read_matlab_file, write_matlab_step)

SPE1 = os.path.join(os.path.dirname(__file__), "..", "data", "SPE1CASE2.DATA")


def test_round_trip(tmp_path):
    out = str(tmp_path)
    vals = np.linspace(-1.5, 2.5, 7)
    write_matlab_step(out, 4, {"pressure": vals})
    # reference layout: <dir>/<name>/NNN.txt, one value per line
    path = os.path.join(out, "pressure", "004.txt")
    assert os.path.exists(path)
    back = read_matlab_file(out, "pressure", 4)
    assert np.allclose(back, vals, rtol=1e-14)
    # 15 significant digits survive the text round trip
    write_matlab_step(out, 5, {"x": np.asarray([1.0 / 3.0])})
    assert abs(read_matlab_file(out, "x", 5)[0] - 1.0 / 3.0) < 1e-15


def test_state_and_well_dumps(tmp_path):
    out = str(tmp_path)
    nc, nw = 5, 2
    sat = np.random.default_rng(0).uniform(size=(nc, 3))
    output_state_matlab(out, 0, pressure=np.full(nc, 2e7),
                        saturation=sat, rs=np.zeros(nc),
                        velocity=np.zeros((nc, 3)))
    output_well_state_matlab(out, 0, bhp=np.full(nw, 1e7),
                             wellrates=np.zeros((nw, 3)))
    # saturation is flattened per-cell interleaved (the reference's
    # state.saturation() layout)
    s = read_matlab_file(out, "saturation", 0)
    assert s.shape == (nc * 3,)
    assert np.allclose(s.reshape(nc, 3), sat, rtol=1e-12)
    assert read_matlab_file(out, "bhp", 0).shape == (nw,)
    assert read_matlab_file(out, "wellrates", 0).shape == (nw * 3,)


def test_simulator_write_matlab(tmp_path):
    """End-to-end: flow with write_matlab emits the per-variable dumps."""
    from opm_tpu.io.eclstate import load_case
    from opm_tpu.sim.blackoil import SimulatorFullyImplicitBlackoil

    out = str(tmp_path)
    case = load_case(SPE1)
    sim = SimulatorFullyImplicitBlackoil(case, output_dir=out)
    sim.run(report_step_limit=2, write_matlab=True)
    nc = sim.grid.nc
    for name, n in [("pressure", nc), ("saturation", 3 * nc),
                    ("rs", nc), ("rv", nc), ("velocity", 3 * nc),
                    ("bhp", 2), ("wellrates", 6)]:
        a = read_matlab_file(out, name, 1)
        assert a.shape == (n,), name
        assert np.all(np.isfinite(a)), name
    p = read_matlab_file(out, "pressure", 1)
    assert p.min() > 1e6 and p.max() < 1e9  # plausible Pa range
    s = read_matlab_file(out, "saturation", 1).reshape(nc, 3)
    assert np.allclose(s.sum(axis=1), 1.0, atol=1e-6)


def test_simple_sim_output(tmp_path):
    """Simple-sim family per-step dumps (SimulatorIncompTwophaseAd /
    SimulatorPolymer output pattern: loop-top + final)."""
    import jax.numpy as jnp

    from opm_tpu.grid import cartesian_grid
    from opm_tpu.props.incomp import IncompProps
    from opm_tpu.props.polymer import PolymerProperties
    from opm_tpu.sim.polymer import PolymerInflow, SimulatorPolymer

    out = str(tmp_path)
    g = cartesian_grid((6, 6, 1), (60.0, 60.0, 5.0), perm=1e-13, poro=0.2)
    props = IncompProps(viscosity=(0.5e-3, 2e-3), density=(1000.0, 850.0),
                        exponent=2.0)
    visc = jnp.asarray([[0.0, 1.0], [1.0, 4.0], [5.0, 20.0]])
    ads = jnp.asarray([[0.0, 0.0], [5.0, 2e-5]])
    poly = PolymerProperties(c_max=5.0, mix_param=1.0, rock_density=2000.0,
                             dead_pore_vol=0.05, res_factor=1.0,
                             visc_table=visc, ads_table=ads)
    src = np.zeros(g.nc)
    src[0], src[-1] = 1e-5, -1e-5
    sim = SimulatorPolymer(g, props, poly, src,
                           PolymerInflow(0.0, 1e30, 2.0))
    sim.run(np.zeros(g.nc), dt=86400.0, num_steps=2, output_dir=out,
            output_matlab=True, output_vtk=True)
    # loop-top dumps 000..001 + final 002
    for step in (0, 1, 2):
        for name in ("pressure", "saturation", "concentration", "cmax",
                     "velocity"):
            a = read_matlab_file(out, name, step)
            assert np.all(np.isfinite(a)), (name, step)
    assert read_matlab_file(out, "saturation", 2).shape == (2 * g.nc,)
    assert os.path.exists(os.path.join(out, "vtk_files", "output-002.vtr"))
    # injected polymer shows up in the final concentration field
    assert read_matlab_file(out, "concentration", 2).max() > 0.0
