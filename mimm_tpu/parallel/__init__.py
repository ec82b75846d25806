from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, bert_tp_shardings,
                   critic_tp_shardings, initialize_distributed, make_mesh,
                   put_global, replicate, replicated, shard_batch,
                   shard_mi_state, stacked_batch_sharding)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "bert_tp_shardings",
    "critic_tp_shardings", "initialize_distributed", "make_mesh",
    "put_global", "replicate", "replicated", "shard_batch",
    "shard_mi_state", "stacked_batch_sharding",
]
