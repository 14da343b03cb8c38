"""Panoptic post-processing — fixed-shape, on-device.

The reference post-processes sampled logits with host-side per-segment
python loops (reference: ldmseg/trainers/trainers_ldm_cond.py:1287-1325):

  1. ``pred = argmax_c logits``; pixels whose max softmax prob < ``mask_th``
     are set to the ignore label,
  2. every segment (argmax label) with pixel count < ``count_th`` is removed,
  3. every segment whose argmax area over its thresholded-sigmoid-mask area
     (``sigmoid(logits[c]) >= mask_th``) is < ``overlap_th`` is removed.

Because each pixel carries exactly one argmax label, the per-label loop has
no cross-label interaction, so it vectorizes into per-class histograms —
one pass, static shapes, no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def panoptic_post_process(
    logits: jnp.ndarray,
    mask_th: float = 0.5,
    count_th: int = 512,
    overlap_th: float = 0.5,
    ignore_label: int = 0,
    valid_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convert per-class logits into a cleaned panoptic id map.

    Args:
      logits: ``[..., H, W, C]`` per-instance/per-class logits.
      mask_th: min softmax prob to keep a pixel + sigmoid threshold for the
        overlap test (reference ``mask_th``, train_diffusion.sh:35).
      count_th: min pixels for a segment (train_diffusion.sh:37).
      overlap_th: min argmax-area / sigmoid-mask-area ratio
        (train_diffusion.sh:36).
      ignore_label: the dataset ignore id.
      valid_mask: optional ``[..., H, W]`` bool; False pixels (padding) are
        excluded from counts and forced to -1 in the output.

    Returns:
      (cleaned ``[..., H, W]`` int32 with removed segments = -1,
       keep ``[..., C]`` bool per-class keep decisions)
    """
    c = logits.shape[-1]
    pred = jnp.argmax(logits, axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    maxprob = jnp.max(probs, axis=-1)
    pred = jnp.where(maxprob < mask_th, ignore_label, pred)

    if valid_mask is None:
        valid = jnp.ones(pred.shape, dtype=bool)
    else:
        valid = valid_mask.astype(bool)

    onehot = (
        jax.nn.one_hot(pred, c, dtype=jnp.float32)
        * valid[..., None]
    )
    area_argmax = jnp.sum(onehot, axis=(-3, -2))  # [..., C]

    sig_mask = (jax.nn.sigmoid(logits) >= mask_th) & valid[..., None]
    area_sig = jnp.sum(sig_mask.astype(jnp.float32), axis=(-3, -2))

    class_ids = jnp.arange(c)
    keep = (
        (area_argmax >= count_th)
        & (class_ids != ignore_label)
        & (area_argmax / jnp.maximum(area_sig, 1.0) >= overlap_th)
    )

    # Gather the per-class keep decision back onto pixels.
    keep_pixel = jnp.take_along_axis(
        jnp.broadcast_to(keep[..., None, None, :], pred.shape + (c,)),
        pred[..., None],
        axis=-1,
    )[..., 0]
    cleaned = jnp.where(keep_pixel & valid, pred, -1).astype(jnp.int32)
    return cleaned, keep
