"""Krylov solvers in pure JAX (lax.while_loop) over pytree vectors.

Replaces Dune-ISTL's BiCGSTABSolver / RestartedGMResSolver as used by the
reference's ISTLSolver (/root/reference/opm/autodiff/ISTLSolver.hpp:250-274,
defaults reduction 1e-2, maxiter 50 via NewtonIterationBlackoilCPR.cpp:61-66).
MPI dot products (ParallelISTLInformation) become jnp reductions, which XLA
turns into ICI collectives under sharding.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.flatten_util
import jax.numpy as jnp

_EPS = 1e-300


def _dot(a, b):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    return sum(jnp.vdot(x, y) for x, y in zip(leaves_a, leaves_b))


def _axpy(alpha, x, y):
    return jax.tree.map(lambda xi, yi: alpha * xi + yi, x, y)


def _scale(alpha, x):
    return jax.tree.map(lambda xi: alpha * xi, x)


def _add(*xs):
    return jax.tree.map(lambda *leaves: sum(leaves), *xs)


def _zeros_like(x):
    return jax.tree.map(jnp.zeros_like, x)


class KrylovResult(NamedTuple):
    x: object
    iterations: jnp.ndarray
    rel_residual: jnp.ndarray
    converged: jnp.ndarray


def bicgstab(matvec: Callable, b, precond: Callable = None, *,
             tol: float = 1e-2, maxiter: int = 50) -> KrylovResult:
    """Right-preconditioned BiCGStab: solves A x = b with x = M^-1 y updates.

    matvec/precond: pytree -> pytree. tol is a relative reduction on ||r||
    (the reference's linear_solver_reduction)."""
    if precond is None:
        precond = lambda v: v

    b_norm = jnp.sqrt(jnp.real(_dot(b, b)))
    x0 = _zeros_like(b)
    r0 = b
    rhat = r0

    def cond(carry):
        (x, r, p, v, rho, alpha, omega, it, rnorm) = carry
        return (rnorm > tol * b_norm) & (it < maxiter) & jnp.isfinite(rnorm)

    def body(carry):
        (x, r, p, v, rho, alpha, omega, it, rnorm) = carry
        rho1 = _dot(rhat, r)
        # breakdown-safe coefficients: on exact convergence mid-iteration
        # (s == 0 -> t == 0) or rho/omega collapse, zero the step instead of
        # dividing by ~0 (the residual check then terminates the loop)
        ok_beta = (jnp.abs(rho) > _EPS) & (jnp.abs(omega) > _EPS)
        beta = jnp.where(ok_beta, (rho1 / jnp.where(ok_beta, rho, 1.0)) *
                         (alpha / jnp.where(ok_beta, omega, 1.0)), 0.0)
        p = _add(r, _scale(beta, _add(p, _scale(-omega, v))))
        phat = precond(p)
        v = matvec(phat)
        denom = _dot(rhat, v)
        alpha = jnp.where(jnp.abs(denom) > _EPS,
                          rho1 / jnp.where(jnp.abs(denom) > _EPS, denom,
                                           1.0), 0.0)
        s = _axpy(-alpha, v, r)
        shat = precond(s)
        t = matvec(shat)
        tt = _dot(t, t)
        omega = jnp.where(tt > _EPS,
                          _dot(t, s) / jnp.where(tt > _EPS, tt, 1.0), 0.0)
        x = _add(x, _scale(alpha, phat), _scale(omega, shat))
        r = _axpy(-omega, t, s)
        rnorm = jnp.sqrt(jnp.real(_dot(r, r)))
        return (x, r, p, v, rho1, alpha, omega, it + 1, rnorm)

    init = (x0, r0, _zeros_like(b), _zeros_like(b),
            jnp.asarray(1.0, b_norm.dtype), jnp.asarray(1.0, b_norm.dtype),
            jnp.asarray(1.0, b_norm.dtype), jnp.asarray(0),
            b_norm)
    out = jax.lax.while_loop(cond, body, init)
    x, r, *_, it, rnorm = out
    rel = rnorm / jnp.where(b_norm == 0, 1.0, b_norm)
    return KrylovResult(x=x, iterations=it, rel_residual=rel,
                        converged=rel <= tol)


def gmres(matvec: Callable, b, precond: Callable = None, *,
          tol: float = 1e-2, maxiter: int = 50, restart: int = 20
          ) -> KrylovResult:
    """Restarted GMRES (right-preconditioned) — the reference's
    linear_solver_use_gmres option (ISTLSolver.hpp:263-268). Fixed-shape
    Arnoldi via lax.fori_loop; solves the small Hessenberg LSQ on device."""
    if precond is None:
        precond = lambda v: v

    flat, unravel = jax.flatten_util.ravel_pytree(b)
    n = flat.shape[0]
    m = min(restart, n)

    def mv_flat(v):
        out = matvec(unravel(v))
        return jax.flatten_util.ravel_pytree(out)[0]

    def pc_flat(v):
        out = precond(unravel(v))
        return jax.flatten_util.ravel_pytree(out)[0]

    b_norm = jnp.linalg.norm(flat)

    def arnoldi_cycle(x):
        r = flat - mv_flat(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), flat.dtype).at[0].set(
            r / jnp.where(beta == 0, 1.0, beta))
        H = jnp.zeros((m + 1, m), flat.dtype)

        def arn(j, carry):
            V, H = carry
            w = mv_flat(pc_flat(V[j]))
            # modified Gram-Schmidt
            def mgs(i, wh):
                w, H = wh
                hij = jnp.vdot(V[i], w) * (i <= j)
                H = H.at[i, j].add(hij)
                return (w - hij * V[i], H)
            w, H = jax.lax.fori_loop(0, m + 1, mgs, (w, H))
            hjp = jnp.linalg.norm(w)
            H = H.at[j + 1, j].set(hjp)
            V = V.at[j + 1].set(w / jnp.where(hjp == 0, 1.0, hjp))
            return (V, H)

        V, H = jax.lax.fori_loop(0, m, arn, (V, H))
        e1 = jnp.zeros(m + 1, flat.dtype).at[0].set(beta)
        # least squares via normal equations on the small system (f64-safe)
        y = jnp.linalg.lstsq(H.astype(jnp.float32),
                             e1.astype(jnp.float32))[0].astype(flat.dtype)
        dx = pc_flat(V[:m].T @ y)
        return x + dx

    ncycles = max(1, -(-maxiter // m))
    x = jnp.zeros_like(flat)
    for _ in range(ncycles):
        x = arnoldi_cycle(x)
    r = flat - mv_flat(x)
    rel = jnp.linalg.norm(r) / jnp.where(b_norm == 0, 1.0, b_norm)
    return KrylovResult(x=unravel(x), iterations=jnp.asarray(ncycles * m),
                        rel_residual=rel, converged=rel <= tol)
