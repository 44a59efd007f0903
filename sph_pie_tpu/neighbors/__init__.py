from sph_pie_tpu.neighbors.grid import CellList, GridSpec, build, grid_from_bounds, neighbor_fold
