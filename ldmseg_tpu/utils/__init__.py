from .meters import AverageMeter, ProgressMeter
from .logging import Logger
from .config import (
    load_config, prepare_config, DEFAULT_CONFIG, merge_dicts)

__all__ = [
    "AverageMeter",
    "ProgressMeter",
    "Logger",
    "load_config",
    "prepare_config",
    "DEFAULT_CONFIG",
    "merge_dicts",
]
