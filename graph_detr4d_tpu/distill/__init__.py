from .distiller import Distiller, DistillConfig, distill_loss  # noqa: F401
