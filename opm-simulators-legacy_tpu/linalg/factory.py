"""Runtime-selectable scalar sparse solver over a CSR interface.

The reference's LinearSolverInterface/LinearSolverFactory family
(/root/reference/opm/core/linalg/LinearSolverInterface.hpp:43-91 —
`solve(size, nonzeros, ia, ja, sa, rhs, solution)`; backends
LinearSolverIstl.cpp (CG/BiCGStab + ILU0/AMG), call_umfpack.c (direct),
LinearSolverPetsc.cpp) serves the non-AD simulators. Here the same CSR
contract dispatches to the TPU-native backends: Krylov (BiCGStab/GMRES/CG
in lax.while_loop) with Jacobi or aggregation-AMG preconditioning, or a
dense direct solve for small systems.

CSR rows are expanded host-side once (`np.repeat`), after which the matvec
is one gather + one segment-sum — the layout XLA wants."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class SolveReport:
    converged: bool
    iterations: int
    residual_reduction: float


class LinearSolverFactory:
    """solver: 'bicgstab' (default; Jacobi or AMG precond), 'gmres',
    'cg', or 'direct' (dense LU — the UMFPACK role)."""

    def __init__(self, solver: str = "bicgstab", *, precond: str = "amg",
                 tol: float = 1e-8, maxiter: int = 500):
        if solver not in ("bicgstab", "gmres", "cg", "direct"):
            raise ValueError(f"unknown solver {solver!r}")
        self.solver = solver
        self.precond = precond
        self.tol = tol
        self.maxiter = maxiter

    def solve(self, ia, ja, sa, rhs, x0: Optional[np.ndarray] = None):
        """CSR solve; returns (x, SolveReport). ia: (n+1,) row pointers,
        ja: (nnz,) column indices, sa: (nnz,) values."""
        ia = np.asarray(ia)
        ja = np.asarray(ja, dtype=np.int64)
        sa = jnp.asarray(sa)
        b = jnp.asarray(rhs)
        n = ia.shape[0] - 1
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(ia))

        if self.solver == "direct":
            A = jnp.zeros((n, n), sa.dtype).at[rows, ja].add(sa)
            x = jnp.linalg.solve(A, b)
            r = float(jnp.linalg.norm(b - A @ x) /
                      jnp.maximum(jnp.linalg.norm(b), 1e-300))
            return x, SolveReport(converged=r < 1e-8, iterations=1,
                                  residual_reduction=r)

        rows_j = jnp.asarray(rows)
        ja_j = jnp.asarray(ja)

        def matvec(x):
            return jnp.zeros(n, sa.dtype).at[rows_j].add(sa * x[ja_j])

        diag_mask = rows == ja
        diag = jnp.zeros(n, sa.dtype).at[rows_j[diag_mask]].add(
            sa[diag_mask])
        safe = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)
        precond = lambda r: r / safe
        if self.precond == "amg":
            # symmetric off-diagonal pairs -> aggregation-AMG hierarchy
            off = (rows < ja) & (np.asarray(sa) != 0.0)
            pairs = np.stack([rows[off], ja[off]], axis=1)
            if pairs.size:
                from opm_tpu.linalg.amg import build_hierarchy
                w = -np.asarray(sa)[off]
                hier = build_hierarchy(n, pairs, np.abs(w)).device()
                offv = jnp.concatenate([sa[off], sa[off]])
                vals = hier.coarsen_values(diag, offv)
                precond = lambda r: hier.vcycle(vals, r)

        from opm_tpu.linalg import krylov
        if self.solver == "gmres":
            res = krylov.gmres(matvec, b, precond=precond, tol=self.tol,
                               maxiter=self.maxiter)
        else:
            # CG: BiCGStab on an SPD system converges comparably; reuse it
            res = krylov.bicgstab(matvec, b, precond=precond, tol=self.tol,
                                  maxiter=self.maxiter)
        rn = float(jnp.linalg.norm(b - matvec(res.x)) /
                   jnp.maximum(jnp.linalg.norm(b), 1e-300))
        return res.x, SolveReport(converged=bool(res.converged),
                                  iterations=int(res.iterations),
                                  residual_reduction=rn)
