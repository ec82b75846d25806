from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, bert_tp_shardings,
                   critic_tp_shardings, initialize_distributed, make_mesh,
                   put_global, replicate, replicated, shard_batch,
                   shard_mi_state, stacked_batch_sharding)
from .pipeline import (PIPE_AXIS, pipeline_stage_count,
                       pipelined_textbert_apply)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "PIPE_AXIS", "batch_sharding",
    "bert_tp_shardings", "critic_tp_shardings", "initialize_distributed",
    "make_mesh", "pipeline_stage_count", "pipelined_textbert_apply",
    "put_global", "replicate", "replicated", "shard_batch",
    "shard_mi_state", "stacked_batch_sharding",
]
