from .boxes import normalize_bbox, denormalize_bbox  # noqa: F401
from .transforms import (  # noqa: F401
    quaternion_to_rotation_matrix,
    lidar2img_from_calib,
    sweep_cam_to_current_lidar,
)
from .projection import project_points_to_cameras  # noqa: F401
