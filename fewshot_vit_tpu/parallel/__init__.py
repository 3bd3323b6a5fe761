from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    episode_shardings,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "episode_shardings",
]
