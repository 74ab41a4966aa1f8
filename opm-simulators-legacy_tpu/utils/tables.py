"""Differentiable piecewise-linear table interpolation.

The reference evaluates all PVT / saturation-function tables with hand-coded
linear interpolation plus hand-coded derivative columns (e.g.
/root/reference/opm/core/props/pvt/PvtDead.cpp, SaturationPropsFromDeck).
Here a single vectorized, `jax.grad`-compatible interpolation primitive serves
every table; derivatives come from AD.

All functions support *batched tables*: if ``xs`` has shape (..., n) with
leading dims broadcast against the query ``x``, each query point uses its own
table row — this is how per-cell PVT/SATNUM region selection works (gather
the region rows first, then call these). jit/vmap-safe: static table sizes,
no data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bracket_batched(xs, x):
    """Index i with xs[..., i] <= x < xs[..., i+1], clamped to [0, n-2].
    xs: (..., n) broadcastable against x: (...)."""
    n = xs.shape[-1]
    i = jnp.sum(xs <= x[..., None], axis=-1) - 1
    return jnp.clip(i, 0, n - 2)


def _take(ys, i):
    return jnp.take_along_axis(ys, i[..., None], axis=-1)[..., 0]


def interp(xs, ys, x, *, extrap: str = "linear"):
    """Piecewise-linear interpolation of ys(xs) at x.

    xs, ys: (..., n) tables (leading dims broadcast against x).
    extrap: 'linear' (continue end slopes — PVT tables) or
            'clamp' (constant beyond ends — saturation functions).
    """
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    x = jnp.asarray(x)
    if xs.ndim == 1:
        i = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0,
                     xs.shape[0] - 2)
        x0, x1 = xs[i], xs[i + 1]
        y0, y1 = ys[i], ys[i + 1]
    else:
        xs, ys = jnp.broadcast_arrays(xs, ys)
        i = _bracket_batched(xs, x)
        x0, x1 = _take(xs, i), _take(xs, i + 1)
        y0, y1 = _take(ys, i), _take(ys, i + 1)
    t = (x - x0) / jnp.where(x1 == x0, 1.0, x1 - x0)
    if extrap == "clamp":
        t = jnp.clip(t, 0.0, 1.0)
    return y0 * (1.0 - t) + y1 * t


def interp_multi(xs, ys_cols, x, *, extrap: str = "linear"):
    """Interpolate several columns sharing one abscissa; ys_cols: (n, ncol)."""
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys_cols)
    i = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0,
                 xs.shape[0] - 2)
    x0 = xs[i]
    x1 = xs[i + 1]
    t = (x - x0) / (x1 - x0)
    if extrap == "clamp":
        t = jnp.clip(t, 0.0, 1.0)
    t = t[..., None]
    return ys[i] * (1.0 - t) + ys[i + 1] * t


def interp2(xs, ys, zgrid, x, y, *, extrap_x="linear", extrap_y="linear"):
    """Bilinear interpolation on a rectangular grid.

    xs: (..., n), ys: (..., m), zgrid: (..., n, m); x, y: (...).
    """
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    z = jnp.asarray(zgrid)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if xs.ndim == 1 and ys.ndim == 1 and z.ndim == 2:
        i = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0,
                     xs.shape[0] - 2)
        j = jnp.clip(jnp.searchsorted(ys, y, side="right") - 1, 0,
                     ys.shape[0] - 2)
        tx = (x - xs[i]) / (xs[i + 1] - xs[i])
        ty = (y - ys[j]) / (ys[j + 1] - ys[j])
        z00, z01 = z[i, j], z[i, j + 1]
        z10, z11 = z[i + 1, j], z[i + 1, j + 1]
    else:
        i = _bracket_batched(xs, x)
        j = _bracket_batched(ys, y)
        xi0, xi1 = _take(xs, i), _take(xs, i + 1)
        yj0, yj1 = _take(ys, j), _take(ys, j + 1)
        tx = (x - xi0) / jnp.where(xi1 == xi0, 1.0, xi1 - xi0)
        ty = (y - yj0) / jnp.where(yj1 == yj0, 1.0, yj1 - yj0)

        def take2(ii, jj):
            zi = jnp.take_along_axis(
                z, ii[..., None, None], axis=-2)[..., 0, :]
            return jnp.take_along_axis(zi, jj[..., None], axis=-1)[..., 0]

        z00, z01 = take2(i, j), take2(i, j + 1)
        z10, z11 = take2(i + 1, j), take2(i + 1, j + 1)
    if extrap_x == "clamp":
        tx = jnp.clip(tx, 0.0, 1.0)
    if extrap_y == "clamp":
        ty = jnp.clip(ty, 0.0, 1.0)
    return (z00 * (1 - tx) * (1 - ty)
            + z01 * (1 - tx) * ty
            + z10 * tx * (1 - ty)
            + z11 * tx * ty)


def inverse_interp(xs, ys, y, *, extrap: str = "clamp"):
    """Solve piecewise-linear ys(x*) = y for monotonically increasing ys."""
    return interp(jnp.asarray(ys), jnp.asarray(xs), y, extrap=extrap)


def reg_row(tab, reg):
    """Per-element region-row selection for (nreg, ...) stacked tables.
    Single-region tables skip the per-cell gather: with a constant region
    array XLA constant-folds tab[reg] into an (n_query, n_table) literal,
    which TPU tiles pad 25-45x (a 2.6 GB constant at SPE10-2 scale)."""
    tab = jnp.asarray(tab)
    if tab.shape[0] == 1:
        return tab[0]
    return tab[reg]
