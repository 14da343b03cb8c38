"""PointRend point losses — fixed-shape TPU reformulation.

Reference: ldmseg/trainers/losses.py (``SegmentationLosses``):
  * ``loss_ce``   (:303-362): CE on uncertainty-sampled points with ignore
  * ``loss_masks`` (:117-185): per-present-class BCE + Dice on
    uncertainty-sampled points, normalized by the world-wide mask count
  * ``prepare_targets`` (:397-442): in the default (matcher-free) path the
    per-image "instance ids" are simply the class values present in the
    target, so output channel ``c`` is paired with the binary mask
    ``target == c`` — which is what we exploit to make everything dense.

TPU reformulation (no per-image variable-length python structures):
  * present classes come from a per-image histogram (``bincount``); the
    top-``max_masks`` classes by pixel count are selected with static
    shapes and masked by validity. With ``max_masks >= num_classes`` this
    is exact parity; smaller values trade a tail of tiny masks for speed.
  * binary target masks are never materialized at full resolution: the
    reference bilinearly point-samples the 0/1 masks
    (losses.py:168-172), and bilinear interpolation of an indicator equals
    the corner-weighted sum of indicator values — so we gather the 4
    nearest integer ids per point once and compare against the selected
    class ids.
  * the distributed ``all_reduce`` of the mask count (losses.py:143-146)
    becomes a ``psum`` when ``axis_name`` is given; in SPMD-global-batch
    mode the caller simply computes over the global batch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.grid_sample import point_sample
from ..ops.uncertainty import (
    get_uncertain_point_coords,
    uncertainty_sigmoid,
    uncertainty_top2,
)


@dataclasses.dataclass(frozen=True)
class PointLossConfig:
    """Mirrors loss_kwargs in tools/configs/base/base.yaml:107-113."""

    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    ignore_label: int = 0
    temperature: float = 1.0
    max_masks: int = 32  # static cap on per-image masks (TPU-only knob)


def select_topk_masks(
    targets: jnp.ndarray,
    num_classes: int,
    ignore_label: int,
    max_masks: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pick the ``max_masks`` largest present classes per image.

    Args:
      targets: ``[B, H, W]`` int class map.
      num_classes: total class/channel count ``C``.

    Returns: (class_ids ``[B, K]`` int32, valid ``[B, K]`` bool).
    """
    b = targets.shape[0]
    hist = jax.vmap(
        lambda t: jnp.bincount(t.reshape(-1), length=num_classes)
    )(targets)  # [B, C]
    hist = hist.at[:, ignore_label].set(0)
    counts, ids = jax.lax.top_k(hist, max_masks)
    return ids.astype(jnp.int32), counts > 0


def _bilinear_corner_ids(targets: jnp.ndarray, coords: jnp.ndarray):
    """For [0,1]-normalized points, return the 4 neighbouring integer ids
    and their bilinear weights (align_corners=False, zero padding).

    targets: ``[B, H, W]`` int; coords: ``[B, P, 2]`` (x, y).
    Returns: ids ``[B, P, 4]`` int32, weights ``[B, P, 4]`` float32.
    """
    bsz, h, w = targets.shape
    ix = coords[..., 0] * w - 0.5
    iy = coords[..., 1] * h - 0.5
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = ix - x0
    wy1 = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = targets.reshape(bsz, h * w)

    def corner(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jax.vmap(lambda f, i: jnp.take(f, i, axis=0))(flat, idx)
        return vals, wgt * valid.astype(jnp.float32)

    i00, w00 = corner(x0i, y0i, (1 - wx1) * (1 - wy1))
    i10, w10 = corner(x0i + 1, y0i, wx1 * (1 - wy1))
    i01, w01 = corner(x0i, y0i + 1, (1 - wx1) * wy1)
    i11, w11 = corner(x0i + 1, y0i + 1, wx1 * wy1)
    ids = jnp.stack([i00, i10, i01, i11], axis=-1)
    wgts = jnp.stack([w00, w10, w01, w11], axis=-1)
    return ids, wgts


def _ce_loss(
    key: jax.Array,
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: PointLossConfig,
) -> jnp.ndarray:
    """Uncertainty-sampled cross-entropy with ignore (losses.py:303-362)."""
    coords = get_uncertain_point_coords(
        key, logits, uncertainty_top2, cfg.num_points,
        cfg.oversample_ratio, cfg.importance_sample_ratio)
    # nearest-sampled integer labels (losses.py:342-347, mode='nearest')
    labels = point_sample(
        targets[..., None].astype(jnp.float32), coords, mode="nearest"
    )[..., 0].astype(jnp.int32)
    point_logits = point_sample(logits, coords) / cfg.temperature
    logp = jax.nn.log_softmax(point_logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    valid = (labels != cfg.ignore_label).astype(jnp.float32)
    return -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def _mask_losses(
    key: jax.Array,
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: PointLossConfig,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Per-present-class BCE + Dice on sampled points (losses.py:117-207)."""
    b, h, w, c = logits.shape
    ids, valid = select_topk_masks(targets, c, cfg.ignore_label,
                                   cfg.max_masks)  # [B, K]
    k = cfg.max_masks

    # normalization: global mask count (losses.py:140-146)
    num_masks = jnp.sum(valid.astype(jnp.float32))
    if axis_name is not None:
        num_masks = jax.lax.psum(num_masks, axis_name) / jax.lax.psum(
            1.0, axis_name)
    num_masks = jnp.maximum(num_masks, 1.0)

    # gather per-mask logit channels: [B, K, H, W]
    src = jnp.take_along_axis(
        logits.reshape(b, h * w, c),
        ids[:, None, :].repeat(h * w, axis=1),
        axis=-1,
    ).reshape(b, h, w, k).transpose(0, 3, 1, 2)
    src_flat = src.reshape(b * k, h, w, 1)

    # per-mask uncertainty point coords (losses.py:154-166)
    coords = get_uncertain_point_coords(
        key, src_flat, uncertainty_sigmoid, cfg.num_points,
        cfg.oversample_ratio, cfg.importance_sample_ratio)  # [B*K, P, 2]
    point_logits = point_sample(src_flat, coords)[..., 0]  # [B*K, P]

    # bilinear point labels for the binary masks, via the 4-corner identity
    coords_bk = coords.reshape(b, k, cfg.num_points, 2)
    coords_b = coords_bk.reshape(b, k * cfg.num_points, 2)
    corner_ids, corner_w = _bilinear_corner_ids(targets, coords_b)
    corner_ids = corner_ids.reshape(b, k, cfg.num_points, 4)
    corner_w = corner_w.reshape(b, k, cfg.num_points, 4)
    match = (corner_ids == ids[:, :, None, None]).astype(jnp.float32)
    point_labels = jnp.sum(match * corner_w, axis=-1)  # [B, K, P]
    point_labels = point_labels.reshape(b * k, cfg.num_points)

    vmask = valid.reshape(b * k).astype(jnp.float32)

    # sigmoid BCE (losses.py:230-247): mean over points, sum / num_masks
    bce = jnp.maximum(point_logits, 0) - point_logits * point_labels + \
        jnp.log1p(jnp.exp(-jnp.abs(point_logits)))
    loss_bce = jnp.sum(jnp.mean(bce, axis=-1) * vmask) / num_masks

    # dice (losses.py:187-207)
    p = jax.nn.sigmoid(point_logits)
    numerator = 2.0 * jnp.sum(p * point_labels, axis=-1)
    denominator = jnp.sum(p, axis=-1) + jnp.sum(point_labels, axis=-1)
    dice = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    loss_dice = jnp.sum(dice * vmask) / num_masks

    return loss_bce + loss_dice


def point_losses(
    key: jax.Array,
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: PointLossConfig,
    corrupt_mask: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> dict:
    """Combined CE + (BCE+Dice) point loss (losses.py:364-395).

    Args:
      logits: ``[B, h, w, C]`` decoder logits (any resolution; points are
        normalized coords).
      targets: ``[B, H, W]`` int class map at label resolution.
      corrupt_mask: optional ``[B, H, W]``; where 0, targets are set to
        ignore (losses.py:325-326, the inpainting corruption path).
      axis_name: mesh axis for the distributed mask-count reduction.

    Returns: ``{'ce': scalar, 'mask': scalar}``.
    """
    if corrupt_mask is not None:
        targets = jnp.where(corrupt_mask.astype(bool), targets,
                            cfg.ignore_label)
    key_ce, key_mask = jax.random.split(key)
    return {
        "ce": _ce_loss(key_ce, logits, targets, cfg),
        "mask": _mask_losses(key_mask, logits, targets, cfg,
                             axis_name=axis_name),
    }
