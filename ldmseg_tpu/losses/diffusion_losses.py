"""Diffusion training loss: masked L1/L2/smooth-L1 with per-timestep SNR
weights and optional OHEM top-k.

Reference: ldmseg/trainers/trainers_ldm_cond.py:497-528 (``loss_fn``) and
:596-604 (weighting + OHEM inside ``compute_loss``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import jax


def diffusion_loss(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    timesteps: Optional[jnp.ndarray] = None,
    schedule_weights: Optional[jnp.ndarray] = None,
    loss_mask: Optional[jnp.ndarray] = None,
    loss_type: str = "l2",
    ohem_ratio: float = 1.0,
) -> jnp.ndarray:
    """Per-element loss -> mask -> SNR weight -> OHEM top-k -> mean.

    Args:
      prediction/target: ``[B, h, w, C]``.
      timesteps: ``[B]`` int; indexes ``schedule_weights``.
      schedule_weights: ``[T]`` per-timestep weights
        (DDIMSchedule.weights; reference :598-599).
      loss_mask: ``[B, h, w]`` float; broadcast over channels (the
        reference multiplies ``losses * mask[:, None]`` channel-first,
        :526-527).
      loss_type: 'l1' | 'l2' | 'smooth_l1' (reference :517-524).
      ohem_ratio: keep this fraction of highest losses (reference
        :602-603); 1.0 disables.
    """
    diff = prediction.astype(jnp.float32) - target.astype(jnp.float32)
    if loss_type == "l1":
        losses = jnp.abs(diff)
    elif loss_type == "l2":
        losses = diff**2
    elif loss_type == "smooth_l1":
        a = jnp.abs(diff)
        losses = jnp.where(a < 1.0, 0.5 * a**2, a - 0.5)
    else:
        raise ValueError(f"unknown loss type {loss_type!r}")

    if loss_mask is not None:
        losses = losses * loss_mask[..., None]

    if schedule_weights is not None and timesteps is not None:
        w = schedule_weights[timesteps].reshape(
            (-1,) + (1,) * (losses.ndim - 1))
        losses = losses * w

    flat = losses.reshape(-1)
    if ohem_ratio < 1.0:
        kk = int(ohem_ratio * flat.shape[0])
        flat = jax.lax.top_k(flat, kk)[0]
    return jnp.mean(flat)
