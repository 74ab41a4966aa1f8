import numpy as np
import pytest

from opm_tpu.utils import units
from opm_tpu.utils.units import UnitSystem


def test_field_pressure():
    u = UnitSystem("FIELD")
    assert u.to_si("Pressure", 1.0) == pytest.approx(6894.757293168361)


def test_field_rates():
    u = UnitSystem("FIELD")
    # 20000 stb/day
    q = u.to_si("LiquidSurfaceVolume/Time", 20000.0)
    assert q == pytest.approx(20000 * 0.158987294928 / 86400.0)
    # 100000 Mscf/day
    qg = u.to_si("GasSurfaceVolume/Time", 100000.0)
    assert qg == pytest.approx(100000 * 28.316846592 / 86400.0)


def test_metric():
    u = UnitSystem("METRIC")
    assert u.to_si("Pressure", 1.0) == pytest.approx(1e5)
    assert u.to_si("Permeability", 1.0) == pytest.approx(9.869232667e-16)


def test_transmissibility_dim():
    u = UnitSystem("FIELD")
    # cP * rb / (day * psi)
    f = u.factor("Transmissibility")
    assert f == pytest.approx(1e-3 * 0.158987294928 / (86400 * 6894.757293168361))


def test_rs_dimension():
    u = UnitSystem("FIELD")
    f = u.factor("GasSurfaceVolume/LiquidSurfaceVolume")
    assert f == pytest.approx(28.316846592 / 0.158987294928)  # Mscf/stb


def test_roundtrip():
    u = UnitSystem("FIELD")
    assert u.from_si("Pressure", u.to_si("Pressure", 123.4)) == pytest.approx(123.4)


def test_regula_falsi_batched():
    """RootFinders capability (reference RootFinders.hpp RegulaFalsi) —
    batched pegasus false position finds per-lane roots of distinct cubics."""
    import jax.numpy as jnp
    import numpy as np
    from opm_tpu.utils.rootfinders import bisection, regula_falsi

    c = jnp.asarray(np.linspace(0.05, 0.95, 16))

    def f(x):
        return x ** 3 + 0.3 * x - (c ** 3 + 0.3 * c)

    a = jnp.zeros(16)
    b = jnp.ones(16)
    x_rf = regula_falsi(f, a, b, iterations=30)
    x_bi = bisection(f, a, b)
    assert np.allclose(np.asarray(x_rf), np.asarray(c), atol=1e-10)
    assert np.allclose(np.asarray(x_bi), np.asarray(c), atol=1e-10)
    # reversed bracket orientation also works
    x_rev = regula_falsi(f, b, a, iterations=30)
    assert np.allclose(np.asarray(x_rev), np.asarray(c), atol=1e-10)


def test_parameter_group():
    """ParameterGroup: typed getDefault, file loading, unused audit,
    dataclass mapping (FlowMain.hpp:327-352, :862-868)."""
    import os
    import tempfile

    from opm_tpu.models.blackoil import ModelParams
    from opm_tpu.utils.param import ParameterGroup

    with tempfile.TemporaryDirectory() as d:
        pf = os.path.join(d, "run.param")
        with open(pf, "w") as f:
            f.write("tolerance_cnv=1e-3   # tighter\nmax_iter=12\n")
        pg = ParameterGroup.from_args(
            [f"param_file={pf}", "ds_max=0.1", "mystery_knob=7"])
    assert pg.get_default("tolerance_cnv", 1e-2) == 1e-3
    assert pg.get_default("max_iter", 15) == 12
    assert isinstance(pg.get_default("max_iter", 15), int)
    assert pg.get_default("absent", 0.5) == 0.5
    mp = pg.apply_to_dataclass(ModelParams())
    assert mp.tolerance_cnv == 1e-3 and mp.max_iter == 12 \
        and mp.ds_max == 0.1
    assert pg.unused() == ["mystery_knob"]
    # bool parsing
    pg2 = ParameterGroup.from_args(["solve_welleq_initially=false"])
    assert pg2.get_default("solve_welleq_initially", True) is False
