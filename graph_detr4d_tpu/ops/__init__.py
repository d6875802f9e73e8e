from .msda import multi_scale_deformable_attention  # noqa: F401
from .focal_loss import sigmoid_focal_loss  # noqa: F401
from .hungarian import hungarian_assignment  # noqa: F401
