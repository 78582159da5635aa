from .collectives import (
    all_gather,
    pmean,
    ppermute,
    psum,
    reduce_scatter,
    ring_all_gather,
)
from .contrastive import global_clip_loss, global_mmgclip_loss
from .expert import moe_param_specs, shard_moe_params
from .pipeline import pipeline_forward, pipelined_bert_forward
from .tensor_parallel import shard_text_tower, text_tower_specs
from .zero import shard_opt_state, zero1_shardings
from .mesh import (
    DATA_AXIS,
    EXPERT_AXIS,
    PIPE_AXIS,
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
    "moe_param_specs",
    "shard_moe_params",
    "pipeline_forward",
    "pipelined_bert_forward",
    "shard_text_tower",
    "text_tower_specs",
    "shard_opt_state",
    "zero1_shardings",
    "global_mmgclip_loss",
    "DATA_AXIS",
    "EXPERT_AXIS",
    "PIPE_AXIS",
    "SLICE_AXIS",
    "create_multislice_mesh",
    "MODEL_AXIS",
    "batch_sharding",
    "create_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
