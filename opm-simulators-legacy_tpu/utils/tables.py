"""Differentiable piecewise-linear table interpolation.

The reference evaluates all PVT / saturation-function tables with hand-coded
linear interpolation plus hand-coded derivative columns (e.g.
/root/reference/opm/core/props/pvt/PvtDead.cpp, SaturationPropsFromDeck).
Here a single vectorized, `jax.grad`-compatible interpolation primitive serves
every table; derivatives come from AD.

TPU note: the classic bracket (searchsorted) + gather formulation makes every
table lookup a dynamic gather — the slowest primitive on the hardware, and
the dominant cost of residual assembly at SPE10 scale (measured 33 of 36 ms
at 132k cells). Deck tables are SMALL (PVT/satfunc: 2-64 rows), so lookups
are instead evaluated GATHER-FREE: per-segment membership indicators
(x in [xs[k], xs[k+1])) select the one active segment and the result is a
sum of masked per-segment contributions — O(n_rows) vector flops, zero
gathers, bit-identical values to the bracket formulation (the active segment
computes the same (1-t)*y0 + t*y1; inactive segments add exact zeros).
Tables larger than _GATHER_FREE_MAX_SEGMENTS keep the bracket path.

All functions support *batched tables*: if ``xs`` has shape (..., n) with
leading dims broadcast against the query ``x``, each query point uses its own
table row — this is how per-cell PVT/SATNUM region selection works (gather
the region rows first, then call these). jit/vmap-safe: static table sizes,
no data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

# tables with more segments than this use the searchsorted+gather path
# (deck PVT/satfunc tables are far below it; only synthetic mega-tables hit it)
_GATHER_FREE_MAX_SEGMENTS = 64


def _bracket_batched(xs, x):
    """Index i with xs[..., i] <= x < xs[..., i+1], clamped to [0, n-2].
    xs: (..., n) broadcastable against x: (...)."""
    n = xs.shape[-1]
    i = jnp.sum(xs <= x[..., None], axis=-1) - 1
    return jnp.clip(i, 0, n - 2)


def _take(ys, i):
    return jnp.take_along_axis(ys, i[..., None], axis=-1)[..., 0]


def _segments(xs, x, extrap):
    """Per-segment membership + local coordinate, gather-free.

    xs: (..., n) broadcastable against x (...). Returns (ind, t), both
    (..., n-1): ind boolean, exactly one True per query (the segment with
    xs[k] <= x < xs[k+1]; queries below/above the table activate the
    first/last segment — same clamping as the bracket path's index clip);
    t the unclamped local coordinate, clipped to [0,1] for extrap='clamp'.
    Degenerate (zero-width, padded-row) segments are never active."""
    lo = xs[..., :-1]
    hi = xs[..., 1:]
    xq = x[..., None]
    ind = (xq >= lo) & (xq < hi)
    below = jnp.all(xq < xs, axis=-1, keepdims=True)
    above = jnp.all(xq >= xs, axis=-1, keepdims=True)
    # below/above the table: activate segment 0 / segment n-2, exactly the
    # bracket path's index clip (for padded multi-region tables the last
    # segment is a zero-width duplicate row, so 'above' degenerates to the
    # clamped last value — matching the legacy behavior bit-for-bit)
    width = hi - lo
    first = jnp.zeros_like(ind).at[..., 0].set(True)
    last = jnp.zeros_like(ind).at[..., -1].set(True)
    ind = ind | (below & first) | (above & last)
    t = (xq - lo) / jnp.where(width == 0, 1.0, width)
    if extrap == "clamp":
        t = jnp.clip(t, 0.0, 1.0)
    return ind, t


def _node_basis(xs, x, extrap):
    """Hat-function node weights B: (..., n); exactly two non-zero
    (B[k] = 1-t, B[k+1] = t for the active segment). Linear extrapolation
    comes out naturally from the unclamped t of the end segments."""
    ind, t = _segments(xs, x, extrap)
    wl = jnp.where(ind, 1.0 - t, 0.0)
    wr = jnp.where(ind, t, 0.0)
    pad = [(0, 0)] * (wl.ndim - 1)
    return jnp.pad(wl, pad + [(0, 1)]) + jnp.pad(wr, pad + [(1, 0)])


def _interp_segsum(xs, ys, x, extrap):
    ind, t = _segments(xs, x, extrap)
    y0 = ys[..., :-1]
    y1 = ys[..., 1:]
    seg = jnp.where(ind, (1.0 - t) * y0 + t * y1, 0.0)
    # 0*x keeps NaN queries NaN (masked sums would silently yield 0)
    return jnp.sum(seg, axis=-1) + 0.0 * x


def interp(xs, ys, x, *, extrap: str = "linear"):
    """Piecewise-linear interpolation of ys(xs) at x.

    xs, ys: (..., n) tables (leading dims broadcast against x).
    extrap: 'linear' (continue end slopes — PVT tables) or
            'clamp' (constant beyond ends — saturation functions).
    """
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    x = jnp.asarray(x)
    if xs.shape[-1] - 1 <= _GATHER_FREE_MAX_SEGMENTS:
        xs, ys = jnp.broadcast_arrays(xs, ys)
        return _interp_segsum(xs, ys, x, extrap)
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
    if xs.ndim == 1 and xs.shape[0] - 1 <= _GATHER_FREE_MAX_SEGMENTS:
        B = _node_basis(xs, x, extrap)          # (..., n)
        out = jnp.einsum("...n,nc->...c", B, ys)
        return out + 0.0 * x[..., None]
    i = jnp.clip(jnp.searchsorted(xs, x, side="right") - 1, 0,
                 xs.shape[0] - 2)
    x0 = xs[i]
    x1 = xs[i + 1]
    t = (x - x0) / (x1 - x0)
    if extrap == "clamp":
        t = jnp.clip(t, 0.0, 1.0)
    t = t[..., None]
    return ys[i] * (1.0 - t) + ys[i + 1] * t


def _masksum_backend():
    """Trace-time backend gate for the unrolled mask-sum bilinear path:
    on TPU the einsum formulation serializes the f64 tiny-contraction
    dot_general into while loops (4.8 -> 1.46 ms per interp2 pair at
    132k); on CPU the einsum vectorizes fine and the unrolled masks are
    ~2.4x SLOWER (SPE1 CPU e2e 38.7 -> 91 s). Same numerics to ~5e-13
    either way. OPM_TPU_INTERP2_MASKSUM=0/1 overrides."""
    import os as _os

    v = _os.environ.get("OPM_TPU_INTERP2_MASKSUM", "auto")
    if v != "auto":
        return v == "1"
    try:
        import jax as _jax

        return _jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _seg_masks_1d(ax, q, extrap):
    """Per-segment (indicator, local coordinate) pairs for a SHARED 1-D
    axis, as python lists of query-shaped arrays (unrolled over the small
    segment count). Clamped ends reproduce the bracket path's index clip."""
    n = ax.shape[0]
    lo = ax[:-1]
    hi = ax[1:]
    below = q < ax[0]
    above = q >= ax[-1]
    out = []
    for k in range(n - 1):
        ind = (q >= lo[k]) & (q < hi[k])
        if k == 0:
            ind = ind | below
        if k == n - 2:
            ind = ind | above
        w = hi[k] - lo[k]
        t = (q - lo[k]) / jnp.where(w == 0, 1.0, w)
        if extrap == "clamp":
            t = jnp.clip(t, 0.0, 1.0)
        out.append((ind, t))
    return out


def _interp2_masksum(xs, ys, zgrids, x, y, extrap_x, extrap_y):
    """Shared-table bilinear via unrolled per-segment mask sums, table
    axis kept LEADING throughout. The einsum formulation lowers the tiny
    (..., m) x (n, m) contraction to a dot_general that XLA:TPU emulates
    for f64 as a SERIALIZED while loop over hi/lo bf16 passes — measured
    4.8 ms per interp2 pair at 132k queries vs 1.46 ms for this
    formulation (identical values to 5e-13). zgrids: list of (n, m)
    grids sharing the axes (the PVT inv_b/inv_bmu pair reuses the
    masks); returns a list."""
    qshape = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
    x = jnp.broadcast_to(x, qshape).reshape(-1)
    y = jnp.broadcast_to(y, qshape).reshape(-1)
    segy = _seg_masks_1d(ys, y, extrap_y)
    segx = _seg_masks_1d(xs, x, extrap_x)
    outs = []
    for z in zgrids:
        # y-contraction per x-node, (n, nq) with the table axis leading
        w = 0.0
        for j, (ind, t) in enumerate(segy):
            w = w + jnp.where(ind, (1.0 - t) * z[:, j, None]
                              + t * z[:, j + 1, None], 0.0)
        v = 0.0
        for i, (ind, t) in enumerate(segx):
            v = v + jnp.where(ind, (1.0 - t) * w[i] + t * w[i + 1], 0.0)
        outs.append((v + 0.0 * x + 0.0 * y).reshape(qshape))
    return outs


def interp2_multi(xs, ys, zgrids, x, y, *, extrap_x="linear",
                  extrap_y="linear"):
    """Bilinear interpolation of SEVERAL (n, m) grids sharing 1-D axes
    (segment masks computed once; the LiveOilPVT/WetGasPVT inv_b+inv_bmu
    pair). Falls back to per-grid interp2 off the shared-small fast
    path."""
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    zs = [jnp.asarray(z) for z in zgrids]
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    small = (xs.ndim == 1 and ys.ndim == 1 and all(z.ndim == 2 for z in zs)
             and xs.shape[-1] - 1 <= _GATHER_FREE_MAX_SEGMENTS
             and ys.shape[-1] - 1 <= _GATHER_FREE_MAX_SEGMENTS)
    if small and _masksum_backend():
        return _interp2_masksum(xs, ys, zs, x, y, extrap_x, extrap_y)
    return [interp2(xs, ys, z, x, y, extrap_x=extrap_x, extrap_y=extrap_y)
            for z in zs]


def interp2(xs, ys, zgrid, x, y, *, extrap_x="linear", extrap_y="linear"):
    """Bilinear interpolation on a rectangular grid.

    xs: (..., n), ys: (..., m), zgrid: (..., n, m); x, y: (...).
    """
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)
    z = jnp.asarray(zgrid)
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    small = (xs.shape[-1] - 1 <= _GATHER_FREE_MAX_SEGMENTS
             and ys.shape[-1] - 1 <= _GATHER_FREE_MAX_SEGMENTS)
    if (small and xs.ndim == 1 and ys.ndim == 1 and z.ndim == 2
            and _masksum_backend()):
        # shared tables: unrolled mask sums, no dot_general (see
        # _interp2_masksum — the einsum was a serialized f64 while loop
        # on TPU)
        return _interp2_masksum(xs, ys, [z], x, y, extrap_x, extrap_y)[0]
    if small:
        # batched per-query tables: node-basis contraction over the
        # trailing axis — zero gathers; ~1 ulp from the bracket
        # formulation (different product grouping)
        Bx = _node_basis(xs, x, extrap_x)        # (..., n)
        By = _node_basis(ys, y, extrap_y)        # (..., m)
        v = jnp.sum(By[..., None, :] * z, axis=-1)
        return jnp.sum(Bx * v, axis=-1) + 0.0 * x + 0.0 * y
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


# branchless region select above this many regions falls back to a gather
_REG_PICK_MAX = 8


def reg_pick(vals, reg):
    """Per-region SCALAR selection vals[reg] for (nreg,)-leading arrays
    (per-region constants: surface densities, water-PVT coefficients,
    endpoint scalars), gather-free for realistic region counts.

    A scalar-indexed gather of nc elements serializes on the TPU gather
    unit — six such pickups in the f64 residual measured ~6 ms per Newton
    iteration at SPE10-132k. Single-region decks broadcast; nreg <=
    _REG_PICK_MAX uses a branchless where-chain (O(nreg) elementwise,
    VPU-speed); larger region counts keep the gather."""
    vals = jnp.asarray(vals)
    n = vals.shape[0]
    if n == 1:
        return vals[0]
    if n <= _REG_PICK_MAX:
        extra = vals.ndim - 1
        r = reg.reshape(reg.shape + (1,) * extra) if extra else reg
        out = jnp.where(r == 0, vals[0], vals[1])
        for k in range(2, n):
            out = jnp.where(r == k, vals[k], out)
        return out
    return vals[reg]
