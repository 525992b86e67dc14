"""Device-mesh parallelism: mesh construction and sharding rules."""

from .mesh import (  # noqa: F401
    make_mesh,
    param_shardings,
    batch_sharding,
    replicated,
    DEFAULT_RULES,
)
