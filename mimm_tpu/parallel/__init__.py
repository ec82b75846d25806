from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, critic_tp_shardings,
                   make_mesh, replicate, replicated, shard_batch)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "critic_tp_shardings",
    "make_mesh", "replicate", "replicated", "shard_batch",
]
