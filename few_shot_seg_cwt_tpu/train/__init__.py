from .optim import build_optimizer, build_lr_schedule

__all__ = ["build_optimizer", "build_lr_schedule"]
