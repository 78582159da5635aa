from .contrastive import global_clip_loss, global_mmgclip_loss
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "global_clip_loss",
    "global_mmgclip_loss",
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "create_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
