from .mesh import (
    make_mesh,
    make_mesh_2d,
    data_sharding,
    replicated_sharding,
    shard_batch,
    constrain_batch,
    loco_param_specs,
    shard_by_specs,
    constrain_by_specs,
    DATA_AXIS,
    MODEL_AXIS,
)
