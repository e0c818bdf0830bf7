from .mesh import (
    AXIS,
    constrain_cells,
    current_mesh,
    make_mesh,
    replicate,
    spatial_sharding,
)
