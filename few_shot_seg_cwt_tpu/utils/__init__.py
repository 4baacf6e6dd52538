from .meters import AverageMeter, CompareMeter
from .logging import get_logger, log_to
from .dirs import get_model_dir, get_model_dir_trans
from . import ckpt

__all__ = [
    "AverageMeter",
    "CompareMeter",
    "get_logger",
    "log_to",
    "get_model_dir",
    "get_model_dir_trans",
    "ckpt",
]
