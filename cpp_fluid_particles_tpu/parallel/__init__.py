from . import distributed
from .mesh import (
    AXIS,
    AXES_2D,
    constrain_axis,
    constrain_cells,
    current_mesh,
    make_mesh,
    make_mesh2d,
    mesh_is_2d,
    replicate,
    shard_particles,
    spatial_sharding,
)
