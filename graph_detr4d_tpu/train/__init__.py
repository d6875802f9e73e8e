from .optim import build_optimizer, build_lr_schedule  # noqa: F401
