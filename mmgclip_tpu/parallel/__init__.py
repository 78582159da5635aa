from .collectives import (
    all_gather,
    pmean,
    ppermute,
    psum,
    reduce_scatter,
    ring_all_gather,
)
from .contrastive import global_clip_loss, global_mmgclip_loss
from .tensor_parallel import shard_text_tower, text_tower_specs
from .mesh import (
    DATA_AXIS,
    SLICE_AXIS,
    create_multislice_mesh,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "all_gather",
    "pmean",
    "ppermute",
    "psum",
    "reduce_scatter",
    "ring_all_gather",
    "global_clip_loss",
    "shard_text_tower",
    "text_tower_specs",
    "global_mmgclip_loss",
    "DATA_AXIS",
    "SLICE_AXIS",
    "create_multislice_mesh",
    "MODEL_AXIS",
    "batch_sharding",
    "create_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
