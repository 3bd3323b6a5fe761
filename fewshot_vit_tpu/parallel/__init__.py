from .mesh import (
    init_distributed,
    make_mesh,
    batch_sharding,
    replicated,
    param_shardings,
    episode_shardings,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "episode_shardings",
]
