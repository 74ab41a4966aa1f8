import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.utils.tables import interp, interp2


def test_interp_basic():
    xs = jnp.array([0.0, 1.0, 2.0])
    ys = jnp.array([0.0, 10.0, 40.0])
    assert float(interp(xs, ys, 0.5)) == pytest.approx(5.0)
    assert float(interp(xs, ys, 1.5)) == pytest.approx(25.0)
    # linear extrapolation
    assert float(interp(xs, ys, 3.0)) == pytest.approx(70.0)
    # clamped
    assert float(interp(xs, ys, 3.0, extrap="clamp")) == pytest.approx(40.0)


def test_interp_grad():
    xs = jnp.array([0.0, 1.0, 2.0])
    ys = jnp.array([0.0, 10.0, 40.0])
    g = jax.grad(lambda x: interp(xs, ys, x))(jnp.asarray(1.5))
    assert float(g) == pytest.approx(30.0)


def test_interp_batched_tables():
    xs = jnp.array([[0.0, 1.0], [0.0, 2.0]])
    ys = jnp.array([[0.0, 1.0], [0.0, 4.0]])
    x = jnp.array([0.5, 1.0])
    out = interp(xs, ys, x)
    assert np.allclose(out, [0.5, 2.0])


def test_interp2():
    xs = jnp.array([0.0, 1.0])
    ys = jnp.array([0.0, 1.0])
    z = jnp.array([[0.0, 1.0], [2.0, 3.0]])  # z = 2x + y
    assert float(interp2(xs, ys, z, 0.5, 0.5)) == pytest.approx(1.5)
    assert float(interp2(xs, ys, z, 0.25, 0.75)) == pytest.approx(1.25)


def test_interp2_batched():
    xs = jnp.array([[0.0, 1.0], [0.0, 1.0]])
    ys = jnp.array([[0.0, 1.0], [0.0, 1.0]])
    z = jnp.stack([jnp.array([[0.0, 1.0], [2.0, 3.0]]),
                   jnp.array([[0.0, 2.0], [4.0, 6.0]])])
    out = interp2(xs, ys, z, jnp.array([0.5, 0.5]), jnp.array([0.5, 0.5]))
    assert np.allclose(out, [1.5, 3.0])
