from mvlpt_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    create_mesh,
    backbone_partition_specs,
    replicated_specs,
    batch_specs,
    shard_tree,
    named_shardings,
)
