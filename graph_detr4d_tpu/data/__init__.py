from .synthetic import synthetic_batch, synthetic_camera_rig  # noqa: F401
