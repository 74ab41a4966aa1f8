"""Krylov solvers in pure JAX (lax.while_loop) over pytree vectors.

Replaces Dune-ISTL's BiCGSTABSolver / RestartedGMResSolver as used by the
reference's ISTLSolver (/root/reference/opm/autodiff/ISTLSolver.hpp:250-274,
defaults reduction 1e-2, maxiter 50 via NewtonIterationBlackoilCPR.cpp:61-66).
MPI dot products (ParallelISTLInformation) become jnp reductions, which XLA
turns into ICI collectives under sharding.
"""

from __future__ import annotations

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


def bicgstab_mp(matvec, b, precond: Callable = None, *,
                matvec_check: Callable = None, tol: float = 1e-2,
                maxiter: int = 50, cycles: int = 2) -> KrylovResult:
    """Mixed-precision BiCGStab: f32 inner loop, f64 outer verification.

    On TPU f64 arithmetic is software-emulated; the measured per-iteration
    cost of the f64 BiCGStab recurrence (axpys + dots) is ~3x the combined
    f32 matvec + CPR apply. Here each inner solve runs ENTIRELY in f32 —
    vectors, dot products, coefficients — on the residual normalized to
    unit norm (so f32 range is never stressed), then the TRUE f64 residual
    b - A x is recomputed with `matvec_check` and, if the reduction target
    is not met, another f32 cycle runs on the remaining residual
    (iterative-refinement restarting). Convergence is decided ONLY by the
    f64 true residual, so robustness semantics match the all-f64 solver:
    the 1e-2 reduction target (ISTLSolver.hpp linear_solver_reduction)
    sits ~5 orders above f32 resolution.

    matvec/precond must preserve the dtype of their input (f32 in -> f32
    out); matvec_check (default: matvec) is called on f64 vectors for the
    outer residual. A cycle whose start residual already meets the target
    gets inner tol >= 1 and exits at zero iterations, so extra cycles cost
    one f64 matvec + norms.
    """
    if precond is None:
        precond = lambda v: v
    if matvec_check is None:
        matvec_check = matvec
    f32 = jnp.float32

    def cast(tree, dtype):
        return jax.tree.map(lambda a: a.astype(dtype), tree)

    b_norm = jnp.sqrt(jnp.real(_dot(b, b)))
    target = tol * b_norm
    x = _zeros_like(b)
    r = b
    rnorm = b_norm
    total_it = jnp.asarray(0)

    def cycle(carry):
        x, r, rnorm, total_it = carry
        scale = jnp.where(rnorm > 0, 1.0 / jnp.maximum(rnorm, _EPS), 1.0)
        # inner reduction needed on the normalized residual; >= 1 means
        # already converged -> the inner while_loop runs zero iterations
        inner_tol = target / jnp.maximum(rnorm, _EPS)
        b32 = cast(_scale(scale, r), f32)
        inner = bicgstab(matvec, b32, precond=precond,
                         tol=inner_tol.astype(f32), maxiter=maxiter)
        x = _add(x, _scale(1.0 / scale, cast(inner.x, b_norm.dtype)))
        total_it = total_it + inner.iterations
        r = jax.tree.map(lambda bi, ai: bi - ai, b, matvec_check(x))
        rnorm = jnp.sqrt(jnp.real(_dot(r, r)))
        return x, r, rnorm, total_it

    carry = cycle((x, r, rnorm, total_it))
    for _ in range(cycles - 1):
        # later cycles only run when the f64 true residual still misses
        # the target: the skip branch saves the cycle's f64 verification
        # matvec (the single most expensive op in a converged solve —
        # the usual case, since cycle 1's inner tol already targets `tol`)
        carry = jax.lax.cond(carry[2] > target, cycle, lambda c: c, carry)
    x, r, rnorm, total_it = carry
    rel = rnorm / jnp.where(b_norm == 0, 1.0, b_norm)
    return KrylovResult(x=x, iterations=total_it, rel_residual=rel,
                        converged=rel <= tol)


def gmres(matvec: Callable, b, precond: Callable = None, *,
          tol: float = 1e-2, maxiter: int = 50, restart: int = 20
          ) -> KrylovResult:
    """Restarted GMRES(m), right-preconditioned — the Dune
    RestartedGMResSolver role (the reference's linear_solver_use_gmres,
    ISTLSolver.hpp:263-268). Fixed-shape Arnoldi (modified Gram-Schmidt)
    with on-the-fly GIVENS rotations tracking the residual, an explicit
    back-substitution of the rotated Hessenberg (no LU/lstsq — those paths
    are fragile on the TPU platform compiler), full f64, and restart
    cycles in a lax.while_loop with honest per-column iteration counts."""
    if precond is None:
        precond = lambda v: v

    flat, unravel = jax.flatten_util.ravel_pytree(b)
    n = flat.shape[0]
    m = max(1, min(restart, maxiter, n))
    tiny = 1e-300

    def mv_flat(v):
        out = matvec(unravel(v))
        return jax.flatten_util.ravel_pytree(out)[0]

    def pc_flat(v):
        out = precond(unravel(v))
        return jax.flatten_util.ravel_pytree(out)[0]

    b_norm = jnp.linalg.norm(flat)
    target = tol * b_norm
    dt = flat.dtype

    def one_cycle(x):
        r = flat - mv_flat(x)
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dt).at[0].set(
            r / jnp.maximum(beta, tiny))
        R = jnp.zeros((m, m), dt)
        g = jnp.zeros(m + 1, dt).at[0].set(beta)
        cs = jnp.zeros(m, dt)
        sn = jnp.zeros(m, dt)
        hit = jnp.zeros(m, bool)     # per-column convergence flags

        def arn(j, carry):
            V, R, g, cs, sn, hit = carry
            w = mv_flat(pc_flat(V[j]))
            # modified Gram-Schmidt against v_0..v_j (rows > j are zero)
            h = jnp.zeros(m + 1, dt)

            def mgs(i, wh):
                w, h = wh
                hij = jnp.vdot(V[i], w) * (i <= j)
                return (w - hij * V[i], h.at[i].set(hij))

            w, h = jax.lax.fori_loop(0, m + 1, mgs, (w, h))
            hj1 = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, tiny))
            h = h.at[j + 1].set(hj1)

            # apply the previous rotations to the new column
            def rot(i, h):
                ap = i < j
                hi, hi1 = h[i], h[i + 1]
                return (h.at[i].set(jnp.where(ap, cs[i] * hi + sn[i] * hi1,
                                              hi))
                        .at[i + 1].set(jnp.where(
                            ap, -sn[i] * hi + cs[i] * hi1, hi1)))

            h = jax.lax.fori_loop(0, m, rot, h)
            # new rotation annihilating h[j+1]
            den = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            c = jnp.where(den > tiny, h[j] / jnp.maximum(den, tiny), 1.0)
            s = jnp.where(den > tiny, h[j + 1] / jnp.maximum(den, tiny),
                          0.0)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            h = h.at[j].set(c * h[j] + s * h[j + 1]).at[j + 1].set(0.0)
            R = R.at[:, j].set(h[:m])
            g = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
            hit = hit.at[j].set(jnp.abs(g[j + 1]) <= target)
            return (V, R, g, cs, sn, hit)

        V, R, g, cs, sn, hit = jax.lax.fori_loop(
            0, m, arn, (V, R, g, cs, sn, hit))

        # back-substitution of the upper-triangular R y = g[:m]
        def back(i, y):
            j = m - 1 - i
            s = g[j] - R[j] @ y
            rjj = R[j, j]
            return y.at[j].set(
                s / jnp.where(jnp.abs(rjj) > tiny, rjj, 1.0))

        y = jax.lax.fori_loop(0, m, back, jnp.zeros(m, dt))
        x = x + pc_flat(V[:m].T @ y)
        used = jnp.where(hit.any(), jnp.argmax(hit) + 1, m)
        return x, used

    ncycles = max(1, -(-maxiter // m))

    def cond(carry):
        x, its, rnorm, cyc = carry
        return (rnorm > target) & (cyc < ncycles) & jnp.isfinite(rnorm)

    def body(carry):
        x, its, rnorm, cyc = carry
        x, used = one_cycle(x)
        rnorm = jnp.linalg.norm(flat - mv_flat(x))
        return (x, its + used, rnorm, cyc + 1)

    x0 = jnp.zeros_like(flat)
    x, its, rnorm, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(0), b_norm, jnp.asarray(0)))
    rel = rnorm / jnp.where(b_norm == 0, 1.0, b_norm)
    return KrylovResult(x=unravel(x), iterations=its,
                        rel_residual=rel, converged=rel <= tol)
