from . import grid, kernels, neighbors
