"""Device meshes and sharding (SURVEY.md §2.14 TPU-native plan)."""

from .mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    node_sharding,
    replicated_sharding,
    shard_batch,
    training_mesh,
)
