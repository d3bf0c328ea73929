from .mesh import make_mesh
from .sharding import (
    latent_shardings,
    param_shardings,
    shard_train_on_batch,
)

__all__ = [
    "make_mesh",
    "latent_shardings",
    "param_shardings",
    "shard_train_on_batch",
]
