"""Pose-consistency (SfMLearner-style) losses — finishing the fork's
"pose-VAE" integration.

The reference ships PoseExpNet (posenet/posenet.py) and exercises it only
in a notebook (Pose.ipynb cells 13-19, SURVEY §0); the intended use —
cross-frame consistency for video panoptic segmentation — was never wired
into a trainer ("first understand the VAE and implement a pose-VAE",
README.md:1-6). This module completes that design the TPU way:

  * 6-DoF pose (tx ty tz rx ry rz, PoseExpNet output convention) ->
    SE(3) matrices,
  * depth + intrinsics inverse-warp of a reference frame onto the target
    frame (differentiable bilinear sampling via ops.grid_sample),
  * photometric L1 weighted by the explainability mask + the mask's
    binary-cross-entropy regularizer (SfMLearner, arXiv:1704.07813),
  * the same warp applied to analog-bits segmentation targets gives a
    temporal-consistency loss for the seg latents.

Everything is fixed-shape and jit-friendly; intrinsics come from the
KITTI focal length parsed by the dataset (meta['focal']).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.grid_sample import grid_sample


def euler_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] (rx, ry, rz) -> [..., 3, 3] rotation (XYZ convention)."""
    rx, ry, rz = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    one = jnp.ones_like(rx)
    zero = jnp.zeros_like(rx)
    Rx = jnp.stack([one, zero, zero,
                    zero, cx, -sx,
                    zero, sx, cx], axis=-1).reshape(rx.shape + (3, 3))
    Ry = jnp.stack([cy, zero, sy,
                    zero, one, zero,
                    -sy, zero, cy], axis=-1).reshape(rx.shape + (3, 3))
    Rz = jnp.stack([cz, -sz, zero,
                    sz, cz, zero,
                    zero, zero, one], axis=-1).reshape(rx.shape + (3, 3))
    return Rz @ Ry @ Rx


def pose_vec_to_mat(pose: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] (t, euler) -> [..., 3, 4] transform (SfMLearner layout)."""
    t = pose[..., :3]
    R = euler_to_matrix(pose[..., 3:])
    return jnp.concatenate([R, t[..., None]], axis=-1)


def invert_pose_mat(T: jnp.ndarray) -> jnp.ndarray:
    """Invert a ``[..., 3, 4]`` SE(3) transform: ``(R, t) -> (Rᵀ, -Rᵀt)``.
    Used to warp the anchor frame's latent into each reference frame —
    PoseExpNet predicts target->ref poses, the latent paste needs
    ref->target (sample_panoptic_clip)."""
    R = T[..., :3]
    t = T[..., 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate(
        [Rt, -(Rt @ t[..., None])], axis=-1)


def inverse_warp(
    ref: jnp.ndarray,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    focal: jnp.ndarray,
    cx: Optional[jnp.ndarray] = None,
    cy: Optional[jnp.ndarray] = None,
    mode: str = "bilinear",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``ref`` at the projection of the target frame's pixels.

    Args:
      ref: ``[B, H, W, C]`` reference frame.
      depth: ``[B, H, W]`` target-frame depth.
      pose: ``[B, 6]`` target->reference relative pose, or a ``[B, 3, 4]``
        SE(3) matrix (e.g. from :func:`invert_pose_mat`).
      focal: ``[B]`` focal length in pixels (KITTI meta['focal']).
      cx/cy: principal point (default: image center).

    Returns: (warped ``[B, H, W, C]``, valid ``[B, H, W]`` in-bounds mask).
    """
    b, h, w = depth.shape
    focal = focal.reshape(b, 1, 1)
    cx = (jnp.full((b, 1, 1), (w - 1) / 2.0) if cx is None
          else cx.reshape(b, 1, 1))
    cy = (jnp.full((b, 1, 1), (h - 1) / 2.0) if cy is None
          else cy.reshape(b, 1, 1))

    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x_cam = (xs - cx) / focal * depth
    y_cam = (ys - cy) / focal * depth
    pts = jnp.stack([x_cam, y_cam, depth], axis=-1)  # [B, H, W, 3]

    T = pose_vec_to_mat(pose) if pose.ndim == 2 else pose  # [B, 3, 4]
    R, t = T[..., :3], T[..., 3]
    # highest precision: the TPU default would run this 3x3 rotation in
    # bf16, shifting projected pixel coords by ~0.7 px (tiny matmul, no
    # measurable cost)
    pts_ref = jnp.einsum("bij,bhwj->bhwi", R, pts,
                         precision="highest") + t[:, None, None, :]

    z = jnp.maximum(pts_ref[..., 2], 1e-3)
    u = pts_ref[..., 0] / z * focal + cx
    v = pts_ref[..., 1] / z * focal + cy

    # normalized [0, 1] coords for point_sample-style bilinear gather
    coords = jnp.stack([(u + 0.5) / w, (v + 0.5) / h], axis=-1)
    warped = grid_sample(ref, 2.0 * coords.reshape(b, h * w, 2) - 1.0,
                         mode=mode)
    warped = warped.reshape(b, h, w, ref.shape[-1])
    valid = ((u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1) &
             (pts_ref[..., 2] > 1e-3))
    return warped, valid


def photometric_consistency_loss(
    target: jnp.ndarray,
    refs: jnp.ndarray,
    depth: jnp.ndarray,
    poses: jnp.ndarray,
    focal: jnp.ndarray,
    exp_masks: Optional[jnp.ndarray] = None,
    mask_reg_weight: float = 0.2,
) -> dict:
    """SfMLearner view-synthesis objective over ``R`` reference frames.

    Args:
      target: ``[B, H, W, C]``.
      refs: ``[B, R, H, W, C]``.
      depth: ``[B, H, W]`` target depth (GT from the DVPS datasets or
        predicted).
      poses: ``[B, R, 6]`` PoseExpNet output.
      exp_masks: optional ``[B, H, W, R]`` explainability (sigmoid).

    Returns: {'photo': scalar, 'mask_reg': scalar, plus 'warped' for vis}.
    """
    b, r = poses.shape[:2]
    photo = 0.0
    warped_all = []
    for i in range(r):
        warped, valid = inverse_warp(refs[:, i], depth, poses[:, i], focal)
        diff = jnp.abs(warped - target) * valid[..., None]
        if exp_masks is not None:
            diff = diff * exp_masks[..., i:i + 1]
        photo = photo + jnp.mean(diff)
        warped_all.append(warped)

    out = {"photo": photo / r, "warped": jnp.stack(warped_all, axis=1)}
    if exp_masks is not None:
        # encourage masks toward 1 (SfMLearner cross-entropy w/ ones)
        eps = 1e-6
        out["mask_reg"] = mask_reg_weight * jnp.mean(
            -jnp.log(exp_masks + eps))
    else:
        out["mask_reg"] = jnp.asarray(0.0)
    return out


def segmentation_consistency_loss(
    target_bits: jnp.ndarray,
    ref_bits: jnp.ndarray,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    focal: jnp.ndarray,
) -> jnp.ndarray:
    """Temporal consistency on analog-bits maps: warp the reference
    frame's bit planes onto the target (nearest — ids must not blend) and
    penalize disagreement on valid pixels."""
    warped, valid = inverse_warp(ref_bits, depth, pose, focal,
                                 mode="nearest")
    per_pixel = jnp.mean(jnp.abs(warped - target_bits), axis=-1)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    return jnp.sum(per_pixel * valid) / denom
