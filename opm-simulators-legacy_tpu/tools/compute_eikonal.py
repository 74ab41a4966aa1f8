"""compute_eikonal: anisotropic eikonal distance CLI.

Counterpart of examples/compute_eikonal_from_files.cpp (/root/reference/
examples/compute_eikonal_from_files.cpp:1-131): reads a 2-D cartesian grid
spec plus a per-cell anisotropy metric, solves the anisotropic eikonal
equation from given start cells (fast-sweeping redesign of the reference's
fibonacci-heap fast-marching AnisotropicEikonal2d), and writes the
distance field.

    python -m opm_tpu.tools.compute_eikonal --nx 60 --ny 60 \
        [--metric metric.txt] [--start 0 ...] [--out eikonal.txt]

The metric file holds nc rows "g11 g12 g22" (the reference's per-cell
2x2 SPD tensor); default is the isotropic identity.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="compute_eikonal", description=__doc__)
    ap.add_argument("--nx", type=int, required=True)
    ap.add_argument("--ny", type=int, required=True)
    ap.add_argument("--dx", type=float, default=1.0)
    ap.add_argument("--dy", type=float, default=1.0)
    ap.add_argument("--metric", default=None,
                    help="text file with nc rows: g11 g12 g22")
    ap.add_argument("--start", type=int, nargs="+", default=[0],
                    help="start cell indices (distance 0)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from opm_tpu.diagnostics.eikonal import anisotropic_eikonal_2d

    nc = args.nx * args.ny
    if args.metric:
        metric = np.loadtxt(args.metric).reshape(nc, 3)
    else:
        metric = np.tile([1.0, 0.0, 1.0], (nc, 1))
    dist = np.asarray(anisotropic_eikonal_2d(
        (args.nx, args.ny), (args.nx * args.dx, args.ny * args.dy),
        metric, list(args.start)))
    if args.out:
        np.savetxt(args.out, dist)
        print(f"wrote {args.out}")
    else:
        np.savetxt(sys.stdout, dist[: min(nc, 20)])
    print(f"cells {nc}  min {dist.min():.4g}  max {dist.max():.4g}")
    return dist


if __name__ == "__main__":
    main()
