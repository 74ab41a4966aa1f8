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


# ---- gather-free vs bracket-formulation equivalence --------------------
# The TPU path evaluates small tables without gathers (segment-indicator
# sums, utils/tables.py _segments); these pin it against the classic
# searchsorted+gather formulation on random tables, extrapolation modes,
# duplicate (padded) knots, batched tables, and AD derivatives.

def _interp_bracket(xs, ys, x, extrap="linear"):
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    i = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0,
                 xs.shape[0] - 2)
    x0, x1 = xs[i], xs[i + 1]
    y0, y1 = ys[i], ys[i + 1]
    t = (x - x0) / jnp.where(x1 == x0, 1.0, x1 - x0)
    if extrap == "clamp":
        t = jnp.clip(t, 0.0, 1.0)
    return y0 * (1.0 - t) + y1 * t


@pytest.mark.parametrize("extrap", ["linear", "clamp"])
def test_gather_free_matches_bracket(extrap):
    rng = np.random.default_rng(0)
    xs = jnp.asarray(np.sort(rng.uniform(0, 10, 17)))
    ys = jnp.asarray(rng.normal(size=17))
    x = jnp.asarray(rng.uniform(-3, 13, 5000))
    # include exact knot hits and the table ends
    x = jnp.concatenate([x, xs, xs[:1] - 1e-12, xs[-1:] + 1e-12])
    out = interp(xs, ys, x, extrap=extrap)
    ref = _interp_bracket(xs, ys, x, extrap=extrap)
    assert np.allclose(out, ref, rtol=0, atol=0), "values must be bit-equal"


def test_gather_free_padded_duplicate_knots():
    # _pad_rows repeats the last row: degenerate end segments must clamp
    xs = jnp.array([0.0, 1.0, 2.0, 2.0, 2.0])
    ys = jnp.array([0.0, 10.0, 40.0, 40.0, 40.0])
    x = jnp.array([-1.0, 0.5, 1.999, 2.0, 5.0])
    out = interp(xs, ys, x)
    ref = _interp_bracket(xs, ys, x)
    assert np.allclose(out, ref, rtol=0, atol=0)
    # above-table queries land on the last REAL segment's (degenerate ->
    # clamped) value, exactly like the bracket path's clipped index
    assert float(out[-1]) == pytest.approx(40.0)


def test_gather_free_grad_matches_bracket():
    xs = jnp.asarray(np.sort(np.random.default_rng(1).uniform(0, 1, 9)))
    ys = jnp.asarray(np.random.default_rng(2).normal(size=9))
    xq = np.linspace(-0.2, 1.2, 101)
    g_new = jax.vmap(jax.grad(lambda x: interp(xs, ys, x)))(jnp.asarray(xq))
    g_ref = jax.vmap(jax.grad(
        lambda x: _interp_bracket(xs, ys, x)))(jnp.asarray(xq))
    assert np.allclose(g_new, g_ref)


def test_gather_free_interp2_matches():
    rng = np.random.default_rng(3)
    xs = jnp.asarray(np.sort(rng.uniform(0, 1, 7)))
    ys = jnp.asarray(np.sort(rng.uniform(0, 1, 5)))
    z = jnp.asarray(rng.normal(size=(7, 5)))
    xq = jnp.asarray(rng.uniform(-0.2, 1.2, 400))
    yq = jnp.asarray(rng.uniform(-0.2, 1.2, 400))
    out = interp2(xs, ys, z, xq, yq)
    # brute-force scalar reference
    import numpy as _np

    def ref1(xv, yv):
        i = min(max(int(_np.searchsorted(xs, xv, side="right")) - 1, 0), 5)
        j = min(max(int(_np.searchsorted(ys, yv, side="right")) - 1, 0), 3)
        tx = (xv - xs[i]) / (xs[i + 1] - xs[i])
        ty = (yv - ys[j]) / (ys[j + 1] - ys[j])
        return ((1 - tx) * ((1 - ty) * z[i, j] + ty * z[i, j + 1])
                + tx * ((1 - ty) * z[i + 1, j] + ty * z[i + 1, j + 1]))

    ref = _np.array([ref1(float(a), float(b)) for a, b in zip(xq, yq)])
    assert np.allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_gather_free_nan_propagates():
    xs = jnp.array([0.0, 1.0, 2.0])
    ys = jnp.array([0.0, 10.0, 40.0])
    assert bool(jnp.isnan(interp(xs, ys, jnp.asarray(float("nan")))))


def test_reg_pick_matches_gather():
    """reg_pick (broadcast / branchless where-chain / gather fallback)
    must equal plain vals[reg] for every region-count regime."""
    from opm_tpu.utils.tables import reg_pick

    rng = np.random.default_rng(11)
    for nreg in (1, 2, 3, 8, 9):
        vals = jnp.asarray(rng.normal(size=nreg))
        reg = jnp.asarray(rng.integers(0, nreg, size=200))
        out = reg_pick(vals, reg)
        ref = np.asarray(vals)[np.asarray(reg)]
        assert np.allclose(np.asarray(jnp.broadcast_to(out, ref.shape)),
                           ref), nreg
    # leading-axis picks of (nreg, k) stacks (e.g. per-region rows)
    vals2 = jnp.asarray(rng.normal(size=(3, 4)))
    reg = jnp.asarray(rng.integers(0, 3, size=50))
    out = reg_pick(vals2, reg)
    assert np.allclose(np.asarray(out), np.asarray(vals2)[np.asarray(reg)])


def test_interp_reg_branchless_matches_gather():
    """satfunc._interp_reg's small-region branchless path must equal the
    row-gather bracket path."""
    from opm_tpu.props.satfunc import _interp_reg

    rng = np.random.default_rng(12)
    n = 9
    xs = jnp.asarray(np.sort(rng.uniform(0, 1, size=(3, n)), axis=-1))
    ys = jnp.asarray(rng.normal(size=(3, n)))
    reg = jnp.asarray(rng.integers(0, 3, size=300))
    x = jnp.asarray(rng.uniform(-0.1, 1.1, size=300))
    out = _interp_reg(xs, ys, x, reg)
    # reference: per-element row gather + clamped bracket interpolation
    ref = np.empty(300)
    for q in range(300):
        r = int(reg[q])
        xr = np.asarray(xs[r])
        yr = np.asarray(ys[r])
        i = min(max(int(np.searchsorted(xr, float(x[q]), side="right"))
                    - 1, 0), n - 2)
        t = (float(x[q]) - xr[i]) / (xr[i + 1] - xr[i])
        t = min(max(t, 0.0), 1.0)
        ref[q] = yr[i] * (1 - t) + yr[i + 1] * t
    assert np.allclose(np.asarray(out), ref, rtol=1e-12, atol=1e-12)


def test_interp2_masksum_matches_bracket(monkeypatch):
    """The shared-table mask-sum fast path (no dot_general — the einsum
    serialized as an f64 while loop on TPU) matches the bracket
    formulation everywhere incl. out-of-range queries. The path is
    backend-gated OFF on CPU, so force it here to keep it covered."""
    monkeypatch.setenv("OPM_TPU_INTERP2_MASKSUM", "1")
    from opm_tpu.utils.tables import interp2_multi
    rng = np.random.RandomState(3)
    xs = jnp.asarray(np.sort(rng.rand(9)))
    ys = jnp.asarray(np.sort(rng.rand(8)))
    z1 = jnp.asarray(rng.rand(9, 8))
    z2 = jnp.asarray(rng.rand(9, 8))
    x = jnp.asarray(np.concatenate([rng.rand(500),
                                    [-0.5, 1.5, 0.0, 1.0]]))
    y = jnp.asarray(np.concatenate([rng.rand(500),
                                    [1.2, -0.1, 0.0, 1.0]]))
    a1, a2 = interp2_multi(xs, ys, [z1, z2], x, y)
    # reference: batched-table path (forced by expanding the tables)
    xs_b = jnp.broadcast_to(xs, (x.shape[0], 9))
    ys_b = jnp.broadcast_to(ys, (x.shape[0], 8))
    r1 = interp2(xs_b, ys_b, jnp.broadcast_to(z1, (x.shape[0], 9, 8)), x, y)
    r2 = interp2(xs_b, ys_b, jnp.broadcast_to(z2, (x.shape[0], 9, 8)), x, y)
    assert np.allclose(np.asarray(a1), np.asarray(r1), atol=1e-12)
    assert np.allclose(np.asarray(a2), np.asarray(r2), atol=1e-12)
