from .mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    cast_for_transfer,
)
from .step import build_train_step, build_eval_step, TrainState  # noqa: F401
