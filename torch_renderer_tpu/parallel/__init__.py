from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_spec,
    make_mesh,
    pad_axis_to_multiple,
    pad_batch_to,
    replicate,
    shard_batch,
)
from .sharded import (
    data_parallel_fit,
    make_sharded_pose_step,
    sharded_silhouette_loss,
    soft_silhouette_sharded,
)
