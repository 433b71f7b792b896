from .mesh import make_mesh, mesh_axis_sizes  # noqa: F401
from .sharding import (  # noqa: F401
    LOGICAL_RULES,
    batch_sharding,
    replicated,
    shard_params,
)
