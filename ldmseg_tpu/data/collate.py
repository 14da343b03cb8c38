"""Batch collation to fixed-shape numpy arrays.

Mirrors ldmseg/utils/utils.py:261-298 (``collate_fn``): array keys are
stacked; ``meta`` / ``text`` stay as lists.
"""

from __future__ import annotations

import numpy as np

STACK_KEYS = ("image", "semseg", "instance", "depth", "mask",
              "image_semseg", "inpainting_mask", "color_target")
LIST_KEYS = ("meta", "text")


def collate(samples: list[dict]) -> dict:
    out: dict = {}
    for k in STACK_KEYS:
        if k in samples[0]:
            out[k] = np.stack([s[k] for s in samples])
    for k in LIST_KEYS:
        if k in samples[0]:
            out[k] = [s[k] for s in samples]
    return out
