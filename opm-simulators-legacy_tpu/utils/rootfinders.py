"""Bracketed scalar root finders, batched over cells.

The reference ships RegulaFalsi (with the profiled-at-OPM "pegasus"
modification) as the scalar solver underneath every reordering transport
kernel (/root/reference/opm/core/utility/RootFinders.hpp:37-270:
RegulaFalsi::solve, bracketing + modified false position). Here the same
capability is a pure jax function over *arrays* of independent problems —
fixed iteration count, no data-dependent host control flow — so one call
solves every cell of a wavefront level at once on the VPU.

All finders assume the root is bracketed: f(a) <= 0 <= f(b) (either order
of signs works; inputs are re-oriented internally).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def regula_falsi(f, a, b, *, iterations=40, tol=0.0):
    """Batched modified false position ("Pegasus" scaling, as the reference's
    RegulaFalsi uses to guarantee superlinear convergence on one-sided
    functions). `f` maps an array of abscissae to an array of residuals;
    `a`, `b` are bracket arrays. Returns the root estimate array.

    Jit/vmap/grad-safe: fixed `iterations` trip count; `tol` (on |f|) only
    freezes converged lanes, it does not shorten the loop.
    """
    fa = f(a)
    fb = f(b)
    # orient so fa <= 0 <= fb
    swap = fa > 0.0
    a, b = jnp.where(swap, b, a), jnp.where(swap, a, b)
    fa, fb = jnp.where(swap, fb, fa), jnp.where(swap, fa, fb)

    def body(_, carry):
        a, fa, b, fb = carry
        denom = fb - fa
        safe = jnp.where(jnp.abs(denom) > 1e-300, denom, 1.0)
        x = jnp.where(jnp.abs(denom) > 1e-300, b - fb * (b - a) / safe,
                      0.5 * (a + b))
        fx = f(x)
        done = jnp.abs(fx) <= tol
        went_up = fx > 0.0
        # pegasus: when the new point replaces the same side twice, scale the
        # retained ordinate so the secant cannot stagnate on convex f
        fa_scaled = fa * fb / (fb + fx)
        new_a = jnp.where(went_up, a, x)
        new_fa = jnp.where(went_up, fa_scaled, fx)
        new_b = jnp.where(went_up, x, b)
        new_fb = jnp.where(went_up, fx, fb * fa / (fa + fx))
        # frozen lanes keep their bracket
        new_a = jnp.where(done, x, new_a)
        new_b = jnp.where(done, x, new_b)
        new_fa = jnp.where(done, fx, new_fa)
        new_fb = jnp.where(done, fx, new_fb)
        return (new_a, new_fa, new_b, new_fb)

    a, fa, b, fb = jax.lax.fori_loop(0, iterations, body, (a, fa, b, fb))
    # return the endpoint with the smaller residual
    return jnp.where(jnp.abs(fa) <= jnp.abs(fb), a, b)


def bisection(f, a, b, *, iterations=60):
    """Batched bisection — the unconditionally-robust fallback (2^-60 of the
    bracket width at the default budget)."""
    fa = f(a)
    swap = fa > 0.0
    lo = jnp.where(swap, b, a)
    hi = jnp.where(swap, a, b)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        neg = f(mid) < 0.0
        return (jnp.where(neg, mid, lo), jnp.where(neg, hi, mid))

    lo, hi = jax.lax.fori_loop(0, iterations, body, (lo, hi))
    return 0.5 * (lo + hi)
