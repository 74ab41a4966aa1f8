"""Pallas kernel correctness (jnp oracle; the TPU path exercises the real
kernels — these tests pin the reference semantics + ELL packing)."""
import jax.numpy as jnp
import numpy as np
import pytest

from opm_tpu.linalg.pallas_kernels import (ell_spmv, ell_spmv_ref,
                                           jacobi_sweep, jacobi_sweep_ref,
                                           pack_ell)


def _random_system(n=200, nnz=600, seed=0):
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, n, nnz)
    cols = rng.randint(0, n, nnz)
    vals = rng.randn(nnz)
    diag = rng.rand(n) + 2.0
    x = rng.randn(n)
    return n, rows, cols, vals, diag, x


def test_pack_ell_reproduces_scatter_spmv():
    n, rows, cols, vals, diag, x = _random_system()
    y_ref = diag * x
    np.add.at(y_ref, rows, vals * x[cols])
    cols_ell, slot = pack_ell(n, rows, cols)
    K = cols_ell.shape[0]
    ell_vals = np.zeros(K * n)
    np.add.at(ell_vals, slot, vals)  # duplicates would need add; set ok too
    ell_vals = ell_vals.reshape(K, n)
    xg = x[cols_ell]
    y = np.asarray(ell_spmv_ref(jnp.asarray(diag), jnp.asarray(x),
                                jnp.asarray(ell_vals), jnp.asarray(xg)))
    assert np.allclose(y, y_ref, atol=1e-12)


def test_ell_spmv_dispatch_matches_ref():
    n, rows, cols, vals, diag, x = _random_system(n=300, nnz=900, seed=1)
    cols_ell, slot = pack_ell(n, rows, cols)
    K = cols_ell.shape[0]
    ell_vals = np.zeros(K * n)
    np.add.at(ell_vals, slot, vals)
    ell_vals = jnp.asarray(ell_vals.reshape(K, n))
    xg = jnp.asarray(x)[jnp.asarray(cols_ell)]
    a = ell_spmv(jnp.asarray(diag), jnp.asarray(x), ell_vals, xg)
    b = ell_spmv_ref(jnp.asarray(diag), jnp.asarray(x), ell_vals, xg)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_jacobi_sweep_matches_ref():
    n, rows, cols, vals, diag, x = _random_system(n=150, nnz=400, seed=2)
    b_rhs = np.random.RandomState(3).randn(n)
    cols_ell, slot = pack_ell(n, rows, cols)
    K = cols_ell.shape[0]
    ell_vals = np.zeros(K * n)
    np.add.at(ell_vals, slot, vals)
    ell_vals = jnp.asarray(ell_vals.reshape(K, n))
    xg = jnp.asarray(x)[jnp.asarray(cols_ell)]
    a = jacobi_sweep(0.7, jnp.asarray(diag), jnp.asarray(x),
                     jnp.asarray(b_rhs), ell_vals, xg)
    b = jacobi_sweep_ref(0.7, jnp.asarray(diag), jnp.asarray(x),
                         jnp.asarray(b_rhs), ell_vals, xg)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_pack_ell_duplicate_rows():
    """Rows with repeated (row, col) pairs keep distinct slots."""
    n = 4
    rows = np.array([0, 0, 0, 2])
    cols = np.array([1, 1, 3, 0])
    cols_ell, slot = pack_ell(n, rows, cols)
    assert cols_ell.shape[0] == 3  # max degree
    assert len(set(slot.tolist())) == 4
