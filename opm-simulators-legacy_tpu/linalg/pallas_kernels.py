"""Pallas TPU kernels for the hot linear-algebra inner loops.

The CPR/AMG stack is bandwidth-bound: every BiCGStab iteration streams the
pressure matrix (ELL-packed: TPFA rows have <= 6 neighbors on cartesian
grids) and the solution vector several times. These kernels fuse the
multiply-reduce and the damped-Jacobi update into single VMEM passes so each
array is read once per sweep (the role the reference's hand-rolled
fastSparseOperations.hpp kernels play for Eigen). The neighbor gather
x[cols] stays outside in XLA (TPU gathers lower well from XLA; Pallas adds
value in the fusion, not the gather).

Data layout: vectors are viewed as (n/128, 128) tiles; the K neighbor slots
ride as a leading axis (K, n/128, 128) so one grid step streams an
(8, 128) row block with all its neighbors. Each kernel has a jnp reference
implementation used on CPU and as the correctness oracle in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas TPU backend
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_LANES = 128
_SUBS = 8
_BLOCK = _LANES * _SUBS


def _use_pallas():
    return _HAVE_PALLAS and jax.default_backend() != "cpu"


def _pad_to_block(*arrays_1d, k_arrays=()):
    n = arrays_1d[0].shape[0]
    npad = -(-n // _BLOCK) * _BLOCK
    out1 = [jnp.pad(a, (0, npad - n)) for a in arrays_1d]
    outk = [jnp.pad(a, ((0, 0), (0, npad - n))) for a in k_arrays]
    return n, npad, out1, outk


# ---------------------------------------------------------------------------
# fused ELL multiply-reduce:  y = diag * x + sum_k vals[k] * xg[k]
# ---------------------------------------------------------------------------
def _ell_kernel(K, diag_ref, x_ref, vals_ref, xg_ref, out_ref):
    acc = diag_ref[:] * x_ref[:]
    for k in range(K):  # K is static; 2-D slices keep Mosaic happy
        acc = acc + vals_ref[k] * xg_ref[k]
    out_ref[:] = acc


def ell_spmv_ref(diag, x, vals, xg):
    """diag, x: (n,); vals, xg: (K, n)."""
    return diag * x + jnp.sum(vals * xg, axis=0)


def ell_spmv(diag, x, vals, xg):
    if not _use_pallas():
        return ell_spmv_ref(diag, x, vals, xg)
    # these kernels run inside the CPR preconditioner only — f32 is ample,
    # and the axon TPU path cannot lower f64 pallas_call
    out_dtype = x.dtype
    diag, x, vals, xg = (a.astype(jnp.float32) for a in (diag, x, vals, xg))
    K = vals.shape[0]
    n, npad, (diag, x), (vals, xg) = _pad_to_block(diag, x,
                                                   k_arrays=(vals, xg))
    r = npad // _LANES
    grid = (r // _SUBS,)
    import functools

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_ell_kernel, K),
            grid=grid,
            in_specs=[
                pl.BlockSpec((_SUBS, _LANES), lambda i: (i, 0)),
                pl.BlockSpec((_SUBS, _LANES), lambda i: (i, 0)),
                pl.BlockSpec((K, _SUBS, _LANES), lambda i: (0, i, 0)),
                pl.BlockSpec((K, _SUBS, _LANES), lambda i: (0, i, 0)),
            ],
            out_specs=pl.BlockSpec((_SUBS, _LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((r, _LANES), x.dtype),
        )(diag.reshape(r, _LANES), x.reshape(r, _LANES),
          vals.reshape(K, r, _LANES), xg.reshape(K, r, _LANES))
    return out.reshape(-1)[:n].astype(out_dtype)


# ---------------------------------------------------------------------------
# fused damped-Jacobi sweep:  x' = x + omega * (b - A x) / diag
# ---------------------------------------------------------------------------
def _jacobi_kernel(K, diag_ref, x_ref, b_ref, vals_ref, xg_ref, omega_ref,
                   out_ref):
    y = diag_ref[:] * x_ref[:]
    for k in range(K):
        y = y + vals_ref[k] * xg_ref[k]
    d = diag_ref[:]
    safe = jnp.where(jnp.abs(d) > 1e-30, d, 1.0)
    out_ref[:] = x_ref[:] + omega_ref[0, 0] * (b_ref[:] - y) / safe


def jacobi_sweep_ref(omega, diag, x, b, vals, xg):
    y = ell_spmv_ref(diag, x, vals, xg)
    safe = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)
    return x + omega * (b - y) / safe


def jacobi_sweep(omega, diag, x, b, vals, xg):
    if not _use_pallas():
        return jacobi_sweep_ref(omega, diag, x, b, vals, xg)
    out_dtype = x.dtype
    diag, x, b, vals, xg = (a.astype(jnp.float32)
                            for a in (diag, x, b, vals, xg))
    K = vals.shape[0]
    n, npad, (diag, x, b), (vals, xg) = _pad_to_block(
        diag, x, b, k_arrays=(vals, xg))
    diag = jnp.where(diag == 0, 1.0, diag)
    r = npad // _LANES
    grid = (r // _SUBS,)
    omega_arr = jnp.full((1, 1), omega, dtype=x.dtype)
    import functools

    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_jacobi_kernel, K),
            grid=grid,
            in_specs=[
                pl.BlockSpec((_SUBS, _LANES), lambda i: (i, 0)),
                pl.BlockSpec((_SUBS, _LANES), lambda i: (i, 0)),
                pl.BlockSpec((_SUBS, _LANES), lambda i: (i, 0)),
                pl.BlockSpec((K, _SUBS, _LANES), lambda i: (0, i, 0)),
                pl.BlockSpec((K, _SUBS, _LANES), lambda i: (0, i, 0)),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((_SUBS, _LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((r, _LANES), x.dtype),
        )(diag.reshape(r, _LANES), x.reshape(r, _LANES),
          b.reshape(r, _LANES), vals.reshape(K, r, _LANES),
          xg.reshape(K, r, _LANES), omega_arr)
    return out.reshape(-1)[:n].astype(out_dtype)


# ---------------------------------------------------------------------------
# ELL packing of a directed-entry list (host-side, once per hierarchy level)
# ---------------------------------------------------------------------------
def pack_ell(n, rows, cols):
    """Static ELL structure for directed entries (rows -> cols): per-row
    column ids padded with self-loops (their value slots stay 0). Returns
    (cols_ell (K, n) int32, slot (nnz,) int64 flat index into (K, n))."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    nnz = len(rows)
    deg = np.bincount(rows, minlength=n) if nnz else np.zeros(n, int)
    K = max(int(deg.max()) if nnz else 0, 1)
    cols_ell = np.tile(np.arange(n, dtype=np.int64)[None, :], (K, 1))
    slot = np.empty(nnz, dtype=np.int64)
    if nnz:
        # vectorized per-row running count: sort by row, slot-in-row =
        # position - start of the row's group
        order = np.argsort(rows, kind="stable")
        sr = rows[order]
        starts = np.zeros(nnz, dtype=np.int64)
        newgrp = np.nonzero(np.diff(sr))[0] + 1
        starts[newgrp] = newgrp
        starts = np.maximum.accumulate(starts)
        k_in_row = np.arange(nnz, dtype=np.int64) - starts
        slot[order] = k_in_row * n + sr
        cols_ell[k_in_row, sr] = cols[order]
    return cols_ell.astype(np.int32), slot
