from .config import (
    Cfg,
    load_cfg,
    load_cfg_from_cfg_file,
    merge_cfg_from_list,
    default_cfg,
    parse_args,
)

__all__ = [
    "Cfg",
    "load_cfg",
    "load_cfg_from_cfg_file",
    "merge_cfg_from_list",
    "default_cfg",
    "parse_args",
]
