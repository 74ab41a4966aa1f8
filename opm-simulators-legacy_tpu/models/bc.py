"""Boundary conditions for the TPFA pressure solvers (FlowBCManager role).

The reference manages per-boundary-face conditions — no-flow (default),
fixed pressure, or side-total volumetric flux — through FlowBCManager /
flow_bc.c (/root/reference/opm/core/pressure/FlowBCManager.hpp:34-104,
flow_bc.h:29-87), consumed by the C TPFA kernels (ifs_tpfa.c assembles
Dirichlet rows / flux right-hand sides).

TPU design: our grids carry interior faces only, so boundary conditions are
expressed per *boundary cell* of a logical-cartesian side (Xmin..Zmax, the
FlowBCManager::Side enum): a host-built `SideBC` bundle holds the boundary
cells, their half-face transmissibilities (2 k A / d — the TPFA half-trans
of the boundary face) and face areas. The pressure solve folds

  * pressure BCs into diagonal + rhs terms  T_b lam_t (p_i - p_bc)
  * flux BCs (side-total, area-apportioned as in flow_bc.c
    flux_side_conditions) into the rhs,

and reports the resulting boundary fluxes so transport can treat them as
source terms (inflow is water, outflow splits by fractional flow — the
same convention the examples use for `src`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

SIDES = ("xmin", "xmax", "ymin", "ymax", "zmin", "zmax")


@dataclass
class SideBC:
    kind: str                  # "pressure" | "flux"
    value: float               # pressure [Pa] or side-total flux [m3/s]
    cells: np.ndarray          # boundary cells on the side
    half_trans: np.ndarray     # TPFA half-face transmissibility
    area: np.ndarray           # boundary face areas
    depth: np.ndarray          # boundary face depths (= cell depth)


def _side_cells(grid, side: str):
    nx, ny, nz = grid.dims
    g = np.asarray(grid.global_cell)
    i = g % nx
    j = (g // nx) % ny
    k = g // (nx * ny)
    axis, at_min = {"xmin": (0, True), "xmax": (0, False),
                    "ymin": (1, True), "ymax": (1, False),
                    "zmin": (2, True), "zmax": (2, False)}[side]
    coord = (i, j, k)[axis]
    n = (nx, ny, nz)[axis]
    sel = coord == 0 if at_min else coord == n - 1
    return np.nonzero(sel)[0], axis


def side_bc(grid, side: str, kind: str, value: float) -> SideBC:
    """FlowBCManager::pressureSide / fluxSide for one cartesian side."""
    side = side.lower()
    if side not in SIDES:
        raise ValueError(f"unknown side {side!r}")
    cells, axis = _side_cells(grid, side)
    dx = np.asarray(grid.dx)[cells]
    dy = np.asarray(grid.dy)[cells]
    dz = np.asarray(grid.dz)[cells]
    perm = (np.asarray(grid.permx), np.asarray(grid.permy),
            np.asarray(grid.permz))[axis][cells]
    d = (dx, dy, dz)[axis]
    area = (dy * dz, dx * dz, dx * dy)[axis]
    if axis != 2:
        area = area * np.asarray(grid.ntg)[cells]
    half_trans = 2.0 * perm * area / d
    return SideBC(kind=kind, value=float(value), cells=cells,
                  half_trans=half_trans, area=area,
                  depth=np.asarray(grid.depth)[cells])


class FlowBCs:
    """Collection of side conditions (the FlowBCManager capability).
    Unlisted sides are no-flow."""

    def __init__(self, grid):
        self.grid = grid
        self.sides: List[SideBC] = []

    def pressure_side(self, side: str, pressure: float) -> "FlowBCs":
        self.sides.append(side_bc(self.grid, side, "pressure", pressure))
        return self

    def flux_side(self, side: str, total_flux: float) -> "FlowBCs":
        """Side-total volumetric flux INTO the domain (positive), spread
        over the side's faces in proportion to area (flow_bc.c:
        flux_side_conditions semantics)."""
        self.sides.append(side_bc(self.grid, side, "flux", total_flux))
        return self


def assemble_bc_arrays(bcs: Optional[FlowBCs], nc: int):
    """Flatten to per-cell arrays consumable inside jit:
    (p_coef, p_val, q_fixed) where the pressure-BC term is
    p_coef * lam_t * (p_cell - p_val) added to the cell's equation and
    q_fixed is the prescribed boundary influx [m3/s]."""
    p_coef = np.zeros(nc)
    p_tv = np.zeros(nc)       # sum of half_trans * value over pressure sides
    q_fixed = np.zeros(nc)
    if bcs is not None:
        for s in bcs.sides:
            if s.kind == "pressure":
                p_coef[s.cells] += s.half_trans
                p_tv[s.cells] += s.half_trans * s.value
            else:
                q_fixed[s.cells] += s.value * s.area / s.area.sum()
    # multiple pressure sides on one cell (corner): trans-weighted average
    # value so each side contributes T_b*(p - p_side) independently
    with np.errstate(invalid="ignore", divide="ignore"):
        p_val = np.where(p_coef > 0.0, p_tv / np.maximum(p_coef, 1e-300), 0.0)
    return p_coef, p_val, q_fixed
