"""Array ops: occupancy grids, rays, path geometry, corridors, QP solvers."""
