from .nuscenes_metrics import DetectionEvaluator, DetectionConfig  # noqa: F401
