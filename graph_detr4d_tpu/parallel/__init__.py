from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
from .step import build_train_step, build_eval_step, TrainState  # noqa: F401
