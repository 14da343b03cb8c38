"""Dataset registry / factory.

Mirrors ldmseg/data/dataset_base.py:52-104 (``get_dataset`` with the
coco / kitti / cityscapes names incl. '-dvps' aliases; split lists become
concatenated datasets).
"""

from __future__ import annotations

from typing import Optional

from .kitti import KittiDVPS
from .cityscapes import CityscapesDVPS
from .synthetic import SyntheticDVPS

DATASETS = {
    "kitti": KittiDVPS,
    "kitti-dvps": KittiDVPS,
    "cityscapes": CityscapesDVPS,
    "cityscapes-dvps": CityscapesDVPS,
    "synthetic": SyntheticDVPS,
}


class ConcatDataset:
    """torch.utils.data.ConcatDataset equivalent (dataset_base.py:84-104)."""

    def __init__(self, datasets: list):
        self.datasets = datasets
        self._offsets = []
        total = 0
        for d in datasets:
            self._offsets.append(total)
            total += len(d)
        self._total = total

    def __len__(self):
        return self._total

    def __getitem__(self, idx: int, epoch: int = 0):
        for d, off in zip(reversed(self.datasets), reversed(self._offsets)):
            if idx >= off:
                return d.__getitem__(idx - off, epoch=epoch)
        raise IndexError(idx)


def get_dataset(name: str, prefix: Optional[str] = None, split="train",
                **kwargs):
    if name == "synthetic":
        return SyntheticDVPS(**kwargs)
    cls = DATASETS[name]
    if isinstance(split, (list, tuple)):
        return ConcatDataset(
            [cls(prefix=prefix, split=s, **kwargs) for s in split])
    return cls(prefix=prefix, split=split, **kwargs)
