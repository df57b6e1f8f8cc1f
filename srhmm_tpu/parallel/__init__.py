from . import distributed
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
    "em_step_sharded",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_model",
]
