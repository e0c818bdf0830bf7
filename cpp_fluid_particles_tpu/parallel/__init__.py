from . import distributed
from .mesh import (
    AXIS,
    constrain_axis,
    constrain_cells,
    current_mesh,
    make_mesh,
    replicate,
    shard_particles,
    spatial_sharding,
)
