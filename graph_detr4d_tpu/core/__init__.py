from .coder import nms_free_decode  # noqa: F401
from .matching import hungarian_match_cost, match_targets  # noqa: F401
from .losses import detr3d_loss  # noqa: F401
