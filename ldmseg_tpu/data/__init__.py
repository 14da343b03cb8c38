from .base import get_dataset, DATASETS
from .synthetic import SyntheticDVPS
from .kitti import KittiDVPS
from .cityscapes import CityscapesDVPS
from .collate import collate
from .loader import Loader, make_loader
from .mask_generator import MaskingGenerator

__all__ = [
    "get_dataset",
    "DATASETS",
    "SyntheticDVPS",
    "KittiDVPS",
    "CityscapesDVPS",
    "collate",
    "Loader",
    "MaskingGenerator",
]
