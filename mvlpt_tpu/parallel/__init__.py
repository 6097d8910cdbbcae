from mvlpt_tpu.parallel.multihost import (
    maybe_initialize_distributed,
    local_batch_slice,
    global_batch_arrays,
    put_tree_on_mesh,
    allgather_tree,
)
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
