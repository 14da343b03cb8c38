"""Visualization panels (host-side).

Reference: ``save_train_images`` / ``log_images_*`` write stacked
RGB / GT / prediction panels every ``vis_every`` steps
(trainers_ae.py:884, trainers_ldm_cond.py:1378-1512); panoptic maps are
colorized with the bit-pattern / seeded colormaps.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from ..ops.color import color_map, colorize_panoptic_np
from ..data.transforms import denormalize_imagenet


def panoptic_to_rgb(seg: np.ndarray, cmap: np.ndarray | None = None
                    ) -> np.ndarray:
    cmap = cmap if cmap is not None else color_map()
    return colorize_panoptic_np(seg.astype(np.int64), cmap)


def stack_panels(rows: list[np.ndarray]) -> np.ndarray:
    """Vertically stack equally-sized HxWx3 uint8 panels."""
    return np.concatenate(rows, axis=0)


def save_train_panel(
    path: str,
    rgb: np.ndarray,
    gt_seg: np.ndarray,
    pred_seg: np.ndarray,
    extra: np.ndarray | None = None,
) -> str:
    """Write an rgb/gt/pred(/extra) panel like the reference's
    ``rgb_gt_pred_ae_*.jpg`` artifacts."""
    rgb8 = (np.clip(denormalize_imagenet(rgb), 0, 1) * 255).astype(np.uint8)
    rows = [rgb8, panoptic_to_rgb(gt_seg), panoptic_to_rgb(pred_seg)]
    if extra is not None:
        rows.append(extra.astype(np.uint8))
    panel = stack_panels(rows)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(panel).save(path)
    return path


def save_val_overview(
    path: str,
    rgbs: np.ndarray,
    gt_segs: np.ndarray | None,
    pred_segs: np.ndarray,
    inpainting: np.ndarray | None = None,
) -> str:
    """Eval-time overview strip (reference ``log_images_val``,
    trainers_ldm_cond.py:1411-1438): columns = the batch's images with a
    2%% gap, stacked rows = RGB / GT / generated (+ inpainting mask when
    given). GT may be None (RGB-only prediction)."""
    n, h, w = pred_segs.shape[:3]
    off = max(1, int(0.02 * h))

    def row(panels):
        canvas = np.zeros((h, n * (w + off), 3), np.uint8)
        ptr = 0
        for p in panels:
            canvas[:, ptr:ptr + w] = p
            ptr += w + off
        return canvas

    rows = [row([(np.clip(denormalize_imagenet(np.asarray(r)), 0, 1)
                  * 255).astype(np.uint8) for r in rgbs[:n]])]
    if gt_segs is not None:
        rows.append(row([panoptic_to_rgb(np.asarray(g))
                         for g in gt_segs[:n]]))
    rows.append(row([panoptic_to_rgb(p) for p in pred_segs[:n]]))
    if inpainting is not None:
        masks = []
        for m in inpainting[:n]:
            m8 = (np.asarray(m, np.float32) * 255).astype(np.uint8)
            m8 = np.asarray(Image.fromarray(m8).resize((w, h),
                                                       Image.NEAREST))
            masks.append(np.repeat(m8[..., None], 3, axis=-1))
        rows.append(row(masks))
    panel = stack_panels(rows)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(panel).save(path)
    return path


def noise_schedule_panel(
    path: str,
    sched,
    bits_image: np.ndarray,
    timesteps=(0, 100, 250, 500, 750, 999),
    seed: int = 0,
) -> str:
    """Visualize the noise schedule on one analog-bits map (reference
    ``visualize_noise_schedule``, trainers_ldm_cond.py:1625-1660): decode
    the noisy bits at several timesteps and stack the colorized maps."""
    import jax
    import jax.numpy as jnp
    from ..diffusion import add_noise
    from ..ops.bits import decode_bits_np

    x = jnp.asarray(2.0 * bits_image[None] - 1.0)
    key = jax.random.key(seed)
    rows = []
    for t in timesteps:
        noise = jax.random.normal(key, x.shape)
        noisy = add_noise(sched, x, noise, jnp.asarray([t]))
        dec = decode_bits_np(np.asarray(noisy[0]))
        rows.append(panoptic_to_rgb(dec))
    panel = stack_panels(rows)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(panel).save(path)
    return path
