"""Tutorial 1: build a grid and inspect its geometry/geology.

Counterpart of /root/reference/tutorials/sim_tutorial1.cpp (grid
construction and inspection).

    python examples/tutorial1_grid.py
"""
import numpy as np

from opm_tpu.grid import cartesian_grid
from opm_tpu.io.eclstate import load_case_string

# --- a synthetic uniform grid -------------------------------------------
g = cartesian_grid((20, 20, 5), (400.0, 400.0, 50.0), poro=0.25,
                   perm=100e-15)
print(f"cartesian: {g.nc} cells, {g.nf} faces")
print(f"pore volume: {g.pore_volume.sum():.1f} m3")
print(f"x-face trans: {g.trans[g.face_dir == 0][0]:.3e}")

# --- the same grid through a deck ---------------------------------------
deck = """
RUNSPEC
DIMENS
 20 20 5 /
METRIC
GRID
DX
 2000*20 /
DY
 2000*20 /
DZ
 2000*10 /
TOPS
 400*1000 /
PORO
 2000*0.25 /
PERMX
 2000*101.325 /
"""
case = load_case_string(deck)
from opm_tpu.grid import build_grid

g2 = build_grid(case)
print(f"deck grid: {g2.nc} cells, depth range "
      f"{g2.depth.min():.1f}..{g2.depth.max():.1f} m")
