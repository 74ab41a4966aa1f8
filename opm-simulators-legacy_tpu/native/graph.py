"""ctypes bindings for the native graph kernels (tarjan.cpp), with a pure
NumPy fallback when the shared library can't be built.

API: upwind_levels(nc, face_cells, flux) -> LevelSchedule — the wavefront
schedule that turns the reference's serial reorder sweep
(/root/reference/opm/core/transport/reorder/ReorderSolverInterface.cpp:30-64)
into batched per-level solves.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_HERE, "libopmgraph.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) <
            os.path.getmtime(os.path.join(_HERE, "tarjan.cpp"))):
        try:
            subprocess.run(["make", "-C", _HERE], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.tarjan_levels.restype = ctypes.c_int64
    lib.tarjan_levels.argtypes = [ctypes.c_int64] + [i64p] * 6
    lib.upwind_graph.restype = ctypes.c_int64
    lib.upwind_graph.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, i64p,
                                 f64p, ctypes.c_double] + [i64p] * 2
    _lib = lib
    return lib


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(
        ctypes.c_int64 if a.dtype == np.int64 else ctypes.c_double))


@dataclass
class LevelSchedule:
    ncomp: int
    nlevels: int
    comp: np.ndarray      # (nc,) SCC id (topological numbering)
    level: np.ndarray     # (nc,) wavefront level
    order: np.ndarray     # (nc,) cells sorted by (level, comp)
    level_sizes: np.ndarray  # (nlevels,)
    max_scc: int          # largest SCC (1 = acyclic flux field)


def upwind_levels(nc: int, face_cells: np.ndarray, flux: np.ndarray,
                  tol: float = 0.0) -> LevelSchedule:
    """Build the upwind DAG from signed face fluxes, find SCCs, and assign
    wavefront levels."""
    lib = _load()
    c1 = np.ascontiguousarray(face_cells[:, 0], dtype=np.int64)
    c2 = np.ascontiguousarray(face_cells[:, 1], dtype=np.int64)
    flux = np.ascontiguousarray(flux, dtype=np.float64)
    nf = len(flux)
    ia = np.zeros(nc + 1, dtype=np.int64)
    ja = np.zeros(max(nf, 1), dtype=np.int64)
    if lib is not None:
        lib.upwind_graph(nc, nf, _ptr(c1), _ptr(c2), _ptr(flux),
                         ctypes.c_double(tol), _ptr(ia), _ptr(ja))
        comp = np.zeros(nc, dtype=np.int64)
        order = np.zeros(nc, dtype=np.int64)
        level = np.zeros(nc, dtype=np.int64)
        csize = np.zeros(nc, dtype=np.int64)
        ncomp = int(lib.tarjan_levels(nc, _ptr(ia), _ptr(ja), _ptr(comp),
                                      _ptr(order), _ptr(level), _ptr(csize)))
    else:
        comp, order, level, ncomp, csize = _python_tarjan_levels(
            nc, c1, c2, flux, tol)
    nlev = int(level.max()) + 1 if nc else 0
    level_sizes = np.bincount(level, minlength=nlev)
    max_scc = int(csize[:ncomp].max()) if ncomp else 0
    return LevelSchedule(ncomp=ncomp, nlevels=nlev, comp=comp, level=level,
                         order=order, level_sizes=level_sizes,
                         max_scc=max_scc)


def _python_tarjan_levels(nc, c1, c2, flux, tol):
    """NumPy/Python fallback (iterative Tarjan)."""
    adj = [[] for _ in range(nc)]
    for f in range(len(flux)):
        if flux[f] > tol:
            adj[c1[f]].append(c2[f])
        elif flux[f] < -tol:
            adj[c2[f]].append(c1[f])
    disc = [-1] * nc
    low = [0] * nc
    on_stack = [False] * nc
    stack = []
    comp = np.full(nc, -1, dtype=np.int64)
    ncomp = 0
    timer = [0]
    for s in range(nc):
        if disc[s] != -1:
            continue
        call = [(s, iter(adj[s]))]
        disc[s] = low[s] = timer[0]
        timer[0] += 1
        stack.append(s)
        on_stack[s] = True
        while call:
            u, it = call[-1]
            advanced = False
            for v in it:
                if disc[v] == -1:
                    disc[v] = low[v] = timer[0]
                    timer[0] += 1
                    stack.append(v)
                    on_stack[v] = True
                    call.append((v, iter(adj[v])))
                    advanced = True
                    break
                elif on_stack[v]:
                    low[u] = min(low[u], disc[v])
            if advanced:
                continue
            if low[u] == disc[u]:
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp[w] = ncomp
                    if w == u:
                        break
                ncomp += 1
            call.pop()
            if call:
                p = call[-1][0]
                low[p] = min(low[p], low[u])
    comp = ncomp - 1 - comp
    csize = np.bincount(comp, minlength=nc).astype(np.int64)
    # levels
    clevel = np.zeros(ncomp, dtype=np.int64)
    by_comp = np.argsort(comp, kind="stable")
    for u in by_comp:
        for v in adj[u]:
            if comp[v] != comp[u]:
                clevel[comp[v]] = max(clevel[comp[v]], clevel[comp[u]] + 1)
    level = clevel[comp]
    order = np.lexsort((comp, level)).astype(np.int64)
    return comp, order, level, ncomp, csize


def cp_connections(dims, corners):
    """Native corner-point connection builder (cornerpoint.cpp): the
    opm-grid processEclipseGrid face-construction role. corners:
    (nz, ny, nx, 2, 2, 2, 3) float64. Returns list of
    (g1, g2, area_vec, fc, fc, dir) matching grid/cornerpoint.py's Python
    reference, or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "_cp_bound"):
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.cp_connections.restype = ctypes.c_int64
        lib.cp_connections.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, f64p,
            ctypes.c_int64, i64p, i64p, f64p, f64p, i64p]
        lib._cp_bound = True
    nx, ny, nz = dims
    c = np.ascontiguousarray(corners, dtype=np.float64)
    assert c.shape == (nz, ny, nx, 2, 2, 2, 3), c.shape
    # conforming bound: one face per neighbor pair; stair-step faults pair
    # each cell with at most (overlapping) neighbors -> 2*nz per column is
    # a safe monotone-column bound
    cap = ((nz - 1) * ny * nx + (nx - 1) * ny * 2 * nz
           + nx * (ny - 1) * 2 * nz + 16)
    g1 = np.empty(cap, dtype=np.int64)
    g2 = np.empty(cap, dtype=np.int64)
    area = np.empty((cap, 3), dtype=np.float64)
    fc = np.empty((cap, 3), dtype=np.float64)
    dr = np.empty(cap, dtype=np.int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    i64p = ctypes.POINTER(ctypes.c_int64)
    n = lib.cp_connections(
        nx, ny, nz, c.ctypes.data_as(f64p), cap,
        g1.ctypes.data_as(i64p), g2.ctypes.data_as(i64p),
        area.ctypes.data_as(f64p), fc.ctypes.data_as(f64p),
        dr.ctypes.data_as(i64p))
    if n < 0:
        return None        # cap exceeded (pathological grid): fallback
    return (g1[:n].copy(), g2[:n].copy(), area[:n].copy(), fc[:n].copy(),
            dr[:n].copy())
