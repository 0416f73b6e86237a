"""Mesh-parallel execution: device meshes, sharding rules, collectives."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    fsdp_param_shardings,
    fsdp_shard_params,
    param_shardings,
    preserve_state_shardings,
    replicated,
    shard_params,
)
from .sampling import shard_sample_fn
from .training import shard_train_step
from .pipeline import (
    STAGE_AXIS,
    create_pipeline_mesh,
    make_pipeline_backbone_factory,
    pipeline_forward,
    pipeline_spec,
    stack_block_params,
)
