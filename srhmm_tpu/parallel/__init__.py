from . import distributed
from .sequence import (
    TIME_AXIS,
    log_backward_time_sharded,
    log_forward_time_sharded,
    make_time_mesh,
    pad_time,
)
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    em_step_sharded,
    make_mesh,
    replicate,
    shard_batch,
    shard_model,
)

__all__ = [
    "distributed",
    "DATA_AXIS",
    "MODEL_AXIS",
    "TIME_AXIS",
    "log_backward_time_sharded",
    "log_forward_time_sharded",
    "make_time_mesh",
    "pad_time",
    "em_step_sharded",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_model",
]
