from .mesh import make_mesh
from .sharding import (
    latent_shardings,
    param_shardings,
    shard_train_on_batch,
)
from .sweep import make_seed_states, stack_pytrees, vmap_train_on_batch

__all__ = [
    "make_mesh",
    "latent_shardings",
    "param_shardings",
    "shard_train_on_batch",
    "make_seed_states",
    "stack_pytrees",
    "vmap_train_on_batch",
]
