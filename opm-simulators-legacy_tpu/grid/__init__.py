from opm_tpu.grid.grid import Grid, build_grid, cartesian_grid  # noqa: F401
