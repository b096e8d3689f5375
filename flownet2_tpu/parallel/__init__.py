"""Device-mesh parallelism: mesh construction + sharding plans."""

from .mesh import (  # noqa: F401
    DATA_AXIS,
    SPATIAL_AXIS,
    MeshPlan,
    init_distributed,
    make_mesh,
    scoped_mesh,
)
