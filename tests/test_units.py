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
