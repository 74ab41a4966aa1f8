"""Structured geometric multigrid for the CPR pressure system.

The reference's CPR preconditioner hands its pressure block to Dune AMG
(/root/reference/opm/autodiff/CPRPreconditioner.hpp:183-257). On TPU the
generic aggregation AMG (linalg/amg.py) pays for every smoother/matvec with
dynamic gathers (x[cols]) and for every setup with large scatters — the
slowest primitives on the hardware. But ECL-style grids are logically
cartesian: when every cell is active, the TPFA pressure stencil is exactly
a 7-point stencil, and the whole multigrid becomes static-slice arithmetic:

  * matvec/smooth:  shifted-slice multiply-adds (full HBM bandwidth, zero
    gathers — XLA fuses the 7 streams into one pass);
  * restriction:    pair sums along one axis (reshape + sum);
  * prolongation:   broadcast-replicate along that axis (reshape);
  * Galerkin RAP:   piecewise-constant pair aggregation collapses to strided
    slice sums — even-index faces along the coarsened axis fold into the
    coarse diagonal, odd-index faces become the coarse connections, and the
    7-point structure is preserved exactly on every level.

Coarsening is SEMICOARSENING: factor 2 along one axis per level (largest
dim first), the same factor-2 rate as the pairwise aggregation AMG — so the
convergence behavior matches pairwise AMG while every kernel stays a static
slice. Same outer interface as linalg.amg.DeviceAmg (coarsen_values /
vcycle); values re-coarsen per Newton, structure is static Python.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class _Level:
    dims: Tuple[int, int, int]     # logical (nz, ny, nx) at level entry
    axis: int                      # array axis coarsened (0=z, 1=y, 2=x)
    pad: bool                      # logical dim along axis is odd


def _pairsum(a, axis):
    """Sum adjacent pairs along `axis` (size must be even)."""
    sh = a.shape
    n = sh[axis]
    new = sh[:axis] + (n // 2, 2) + sh[axis + 1:]
    return a.reshape(new).sum(axis=axis + 1)


def _repeat2(a, axis):
    """Replicate each slab twice along `axis`."""
    sh = a.shape
    exp = sh[:axis + 1] + (2,) + sh[axis + 1:]
    out = jnp.broadcast_to(jnp.expand_dims(a, axis + 1), exp)
    return out.reshape(sh[:axis] + (2 * sh[axis],) + sh[axis + 1:])


def _pad_axis(a, axis, extra):
    if extra == 0:
        return a
    pads = [(0, 0)] * a.ndim
    pads[axis] = (0, extra)
    return jnp.pad(a, pads)


def _take(a, axis, sl):
    idx = [slice(None)] * a.ndim
    idx[axis] = sl
    return a[tuple(idx)]


class StructuredGmg:
    """Semicoarsened geometric multigrid on a fully-active cartesian grid.

    dims: (nx, ny, nz) grid dims (ECL order); level-0 face values follow the
    cartesian build order of grid.build_grid: x-faces (nz, ny, nx-1)
    C-ordered, then y-faces (nz, ny-1, nx), then z-faces (nz-1, ny, nx).
    Embedded grids pass the CANONICAL faces only (extra faces are dropped
    from the pressure hierarchy, precond._pressure_off_for).
    """

    wants_canonical_faces = True

    def __init__(self, dims, trans=None, *, coarsest=None, max_levels=40,
                 strength=None):
        """trans: optional (nf,) static transmissibilities in grid face
        order — used on the host, once, to pick each level's coarsening
        axis by coupling strength (aggregating along STRONG connections,
        the structured analogue of heavy-edge pairwise aggregation;
        essential on channelized/anisotropic perm fields). `strength`
        overrides with precomputed per-axis arrays [z, y, x] (used by the
        Schwarz wrapper to share one level structure across shards).

        coarsest: stop coarsening once the level has <= this many cells
        and solve it with a precomputed dense inverse (one MXU matmul per
        apply). Default from OPM_TPU_GMG_COARSEST (else 512): a LARGER
        coarsest trades a cheap n^2 matmul for several latency-bound tiny
        V-cycle levels AND makes the coarse solve exact over more of the
        spectrum."""
        if coarsest is None:
            import os as _os

            coarsest = int(_os.environ.get("OPM_TPU_GMG_COARSEST", "512"))
        nx, ny, nz = dims
        self.dims = (nz, ny, nx)               # internal (z, y, x) order
        self.nc = nx * ny * nz
        self.levels: List[_Level] = []
        d = list(self.dims)
        st = strength if strength is not None \
            else self._host_strength(dims, trans)
        while int(np.prod(d)) > coarsest and len(self.levels) < max_levels \
                and max(d) > 1:
            if st is not None:
                # strongest direction that can still be coarsened
                order = np.argsort([-s.mean() if s.size else -0.0
                                    for s in st])
                a = next(int(ax) for ax in order if d[ax] > 1)
            else:
                a = int(np.argmax(d))
            self.levels.append(_Level(dims=tuple(d), axis=a,
                                      pad=bool(d[a] & 1)))
            d[a] = (d[a] + 1) // 2
            if st is not None:
                st = self._host_coarsen_strength(st, a)
        self.coarse_dims = tuple(d)
        self.coarsest_n = int(np.prod(d))

    @staticmethod
    def _host_strength(dims, trans):
        if trans is None:
            return None
        nx, ny, nz = dims
        nfx = (nx - 1) * ny * nz
        nfy = nx * (ny - 1) * nz
        t = np.abs(np.asarray(trans))
        return [t[nfx + nfy:].reshape(max(nz - 1, 0), ny, nx),
                t[nfx:nfx + nfy].reshape(nz, max(ny - 1, 0), nx),
                t[:nfx].reshape(nz, ny, max(nx - 1, 0))]

    @staticmethod
    def _host_coarsen_strength(st, a):
        """Mirror _coarsen_level on the host strength arrays (numpy):
        pad the coarsened axis to even cells, keep odd-slot faces along it,
        pair-sum the other directions."""
        def pad_to(x, n):
            pads = [(0, 0)] * 3
            pads[a] = (0, n - x.shape[a])
            return np.pad(x, pads)

        # cells along a at this level = along-a face count + 1
        m = st[a].shape[a] + 1
        m_even = m + (m & 1)
        out = []
        sl_odd = [slice(None)] * 3
        sl_odd[a] = slice(1, None, 2)
        for ax in range(3):
            s = st[ax]
            if ax == a:
                s = pad_to(s, m_even - 1)
                out.append(s[tuple(sl_odd)])
            else:
                s = pad_to(s, m_even)
                sh = list(s.shape)
                new = sh[:a] + [m_even // 2, 2] + sh[a + 1:]
                out.append(s.reshape(new).sum(axis=a + 1))
        return out

    # -- stencil primitives (all static slices) ---------------------------
    @staticmethod
    def _matvec(diag3, offs, x3):
        """7-point stencil apply; offs[(axis)] = (aL, aR) with the face
        array one shorter than x3 along that axis. Face terms land via
        zero-pad + add (a `.at[slice].add` lowers on TPU to an unfused
        dynamic-update-slice plus a full-array copy per call — this
        stencil runs several times per CPR apply per Krylov iteration)."""
        y = diag3 * x3
        for ax in range(3):
            aL, aR = offs[ax]
            if aL.shape[ax] == 0:
                continue
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[ax] = slice(None, -1)
            hi[ax] = slice(1, None)
            lo, hi = tuple(lo), tuple(hi)
            from opm_tpu.models.linearize import _pad_add_backend
            if _pad_add_backend():
                pad_lo = [(0, 0)] * 3
                pad_lo[ax] = (0, 1)
                pad_hi = [(0, 0)] * 3
                pad_hi[ax] = (1, 0)
                y = y + jnp.pad(aL * x3[hi], pad_lo)
                y = y + jnp.pad(aR * x3[lo], pad_hi)
            else:
                y = y.at[lo].add(aL * x3[hi])
                y = y.at[hi].add(aR * x3[lo])
        return y

    def _smooth(self, diag3, offs, x3, b3, *, omega=0.8, iters=1):
        safe = jnp.where(jnp.abs(diag3) > 1e-300, diag3, 1.0)
        for _ in range(iters):
            y = self._matvec(diag3, offs, x3)
            x3 = x3 + omega * (b3 - y) / safe
        return x3

    # -- Galerkin value semicoarsening -------------------------------------
    @staticmethod
    def _coarsen_level(diag3, offs, a):
        """Pair-aggregate along array axis `a` (dims already even there)."""
        diag_c = _pairsum(diag3, a)
        aL, aR = offs[a]
        # along-axis faces: even index = internal to a pair -> diagonal;
        # odd index = between pairs -> coarse connection
        if aL.shape[a] > 0:
            diag_c = diag_c + _take(aL, a, slice(0, None, 2)) \
                + _take(aR, a, slice(0, None, 2))
            aL_c = _take(aL, a, slice(1, None, 2))
            aR_c = _take(aR, a, slice(1, None, 2))
        else:
            aL_c, aR_c = aL, aR
        out = []
        for ax in range(3):
            if ax == a:
                out.append((aL_c, aR_c))
            else:
                bL, bR = offs[ax]
                out.append((_pairsum(bL, a), _pairsum(bR, a)))
        return diag_c, tuple(out)

    @staticmethod
    def _pad_level(diag3, offs, a):
        """Ghost-pad one slab along `a`: ghost diag 0 (smoother guards it,
        Galerkin sums ignore it), ghost connections 0."""
        diag3 = _pad_axis(diag3, a, 1)
        out = []
        for ax in range(3):
            bL, bR = offs[ax]
            extra = 1
            out.append((_pad_axis(bL, a, extra), _pad_axis(bR, a, extra)))
        return diag3, tuple(out)

    # -- public interface (mirrors DeviceAmg) ------------------------------
    def coarsen_values(self, diag0, off0):
        """diag0 (nc,), off0 (2*nf,) = [a_LR | a_RL] in grid face order.
        Returns per-level (diag3, offs) + the dense coarsest matrix."""
        nz, ny, nx = self.dims
        nfx = (nx - 1) * ny * nz
        nfy = nx * (ny - 1) * nz
        nf = nfx + nfy + nx * ny * (nz - 1)
        aLf, aRf = off0[:nf], off0[nf:]

        def split(v):
            return ((v[nfx + nfy:].reshape(max(nz - 1, 0), ny, nx)),
                    (v[nfx:nfx + nfy].reshape(nz, max(ny - 1, 0), nx)),
                    (v[:nfx].reshape(nz, ny, max(nx - 1, 0))))

        aLz, aLy, aLx = split(aLf)
        aRz, aRy, aRx = split(aRf)
        diag3 = diag0.reshape(nz, ny, nx)
        offs = ((aLz, aRz), (aLy, aRy), (aLx, aRx))

        vals = []
        for lv in self.levels:
            if lv.pad:
                diag3, offs = self._pad_level(diag3, offs, lv.axis)
            vals.append((diag3, offs))
            diag3, offs = self._coarsen_level(diag3, offs, lv.axis)
        # coarsest: invert ONCE per value-coarsening (once per Newton) so
        # every V-cycle apply is a single f32 matmul on the MXU instead of
        # an LU solve per apply (the V-cycle runs 2x per Krylov iteration)
        A = self._dense_coarsest(diag3, offs)
        vals.append(jnp.linalg.inv(A.astype(jnp.float32)))
        return vals

    def _dense_coarsest(self, diag3, offs):
        cz, cy, cx = diag3.shape
        n = cz * cy * cx
        idx = jnp.arange(n).reshape(cz, cy, cx)
        A = jnp.zeros((n, n), diag3.dtype)
        A = A.at[jnp.arange(n), jnp.arange(n)].set(diag3.reshape(-1))
        for ax in range(3):
            aL, aR = offs[ax]
            if aL.shape[ax] == 0:
                continue
            lo = _take(idx, ax, slice(None, -1)).ravel()
            hi = _take(idx, ax, slice(1, None)).ravel()
            A = A.at[lo, hi].add(aL.ravel())
            A = A.at[hi, lo].add(aR.ravel())
        # regularize all-ghost rows (from odd-dim padding)
        d = jnp.abs(jnp.diagonal(A))
        A = A + jnp.diag(jnp.where(d > 1e-300, 0.0, 1.0))
        return A

    def _vcycle3(self, vals, b3, level, pre, post):
        if level == len(self.levels):
            Ainv = vals[-1]           # precomputed f32 inverse (MXU matmul)
            x = Ainv @ b3.reshape(-1).astype(jnp.float32)
            return x.astype(b3.dtype).reshape(b3.shape)
        lv = self.levels[level]
        if lv.pad:
            b3 = _pad_axis(b3, lv.axis, 1)
        diag3, offs = vals[level]
        x3 = self._smooth(diag3, offs, jnp.zeros_like(b3), b3, iters=pre)
        r3 = b3 - self._matvec(diag3, offs, x3)
        e_c = self._vcycle3(vals, _pairsum(r3, lv.axis), level + 1, pre,
                            post)
        x3 = x3 + _repeat2(e_c, lv.axis)
        x3 = self._smooth(diag3, offs, x3, b3, iters=post)
        if lv.pad:
            x3 = _take(x3, lv.axis, slice(None, -1))
        return x3

    def vcycle(self, vals, b, *, pre=1, post=1, cycles=1):
        nz, ny, nx = self.dims
        b3 = b.reshape(nz, ny, nx)
        x3 = self._vcycle3(vals, b3, 0, pre, post)
        # multiplicative re-cycling (OPM_TPU_GMG_CYCLES>1): each extra
        # cycle corrects the true level-0 residual — a stronger pressure
        # stage per CPR apply at the cost of one pressure matvec + V-cycle
        for _ in range(cycles - 1):
            if not self.levels:
                break   # dense-coarsest-only hierarchy: already exact
            lv0 = self.levels[0]
            diag3, offs = vals[0]   # stored for the (possibly padded) top
            xp, bp = x3, b3
            if lv0.pad:
                xp = _pad_axis(x3, lv0.axis, 1)
                bp = _pad_axis(b3, lv0.axis, 1)
            r3 = bp - self._matvec(diag3, offs, xp)
            if lv0.pad:
                r3 = _take(r3, lv0.axis, slice(None, -1))
            x3 = x3 + self._vcycle3(vals, r3, 0, pre, post)
        return x3.reshape(-1)
