"""WellDensitySegmented parity: the reference's exact unit-test scenario
(/root/reference/tests/test_welldensitysegmented.cpp TestPressureDeltas)."""
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.wells import standard as stdwells

GRAVITY = 9.80665


def test_connection_pressure_deltas_reference_values():
    """Pure water injector, 5 perforations at depths 10..90, per-perf
    water b = 2.0..2.4 (so in-situ mixture densities 2000..2400 kg/m3):
    the hydrostatic offsets must be {20e3, 62e3, 106e3, 152e3, 200e3}*g —
    segment density is the deeper connection's (the reference's pinned
    answer)."""
    nperf = 5
    b_w = np.array([2.0, 2.1, 2.2, 2.3, 2.4])
    b_o = np.array([3.0, 3.3, 3.6, 4.0, 4.5])
    b_g = np.array([100.0, 110.0, 120.0, 130.0, 140.0])
    wd = dict(
        perf_cell=jnp.arange(nperf)[None, :],
        perf_mask=jnp.ones((1, nperf), dtype=bool),
        perf_depth=jnp.asarray([[10.0, 30.0, 50.0, 70.0, 90.0]]),
        ref_depth=jnp.asarray([0.0]),
        comp_frac=jnp.asarray([[1.0, 0.0, 0.0]]),      # water injector
        is_injector=jnp.asarray([True]),
        gravity=jnp.asarray(GRAVITY),
    )
    cellq = dict(
        b=jnp.stack([jnp.asarray(b_w), jnp.asarray(b_o),
                     jnp.asarray(b_g)]),
        rs=jnp.zeros(nperf),
        rv=jnp.zeros(nperf),
        rho_avg=jnp.full(nperf, 1234.5),
        surface_density=jnp.stack([jnp.full(nperf, 1000.0),
                                   jnp.full(nperf, 800.0),
                                   jnp.full(nperf, 10.0)]),
    )
    qs = jnp.asarray([[1.0, 0.0, 0.0]])
    cdp = np.asarray(stdwells.connection_pressure_offsets(wd, cellq, qs))
    answer = np.array([20e3, 62e3, 106e3, 152e3, 200e3]) * GRAVITY
    assert cdp.shape == (1, nperf)
    np.testing.assert_allclose(cdp[0], answer, rtol=1e-10)

    # per-perforation rates path (perfPhaseRates): identical mixture for
    # uniform pure-water rates
    pr = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (1, nperf, 1)
                  ).reshape(1, nperf, 3)
    cdp2 = np.asarray(stdwells.connection_pressure_offsets(
        wd, cellq, qs, perf_rates=pr))
    np.testing.assert_allclose(cdp2[0], answer, rtol=1e-10)
