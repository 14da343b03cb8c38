"""Gather-free 2x bilinear upsampling.

``jax.image.resize(..., "linear")`` lowers to gathers on TPU, which show
up as layout-heavy copy ops in the decode trace. For the exact-2x case
(half-pixel centers, the torch ``align_corners=False`` convention used by
the reference's ``F.interpolate`` in decode_latents,
trainers_ldm_cond.py:1264-1284) the output is a fixed 2-tap blend:

  out[2j]   = 0.25 * x[j-1] + 0.75 * x[j]      (edge-clamped)
  out[2j+1] = 0.75 * x[j]   + 0.25 * x[j+1]

applied separably per axis — shifts, multiplies and an interleave, all of
which XLA fuses without any gather.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _up_axis_h(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    nxt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    even = 0.75 * x + 0.25 * prev
    odd = 0.75 * x + 0.25 * nxt
    return jnp.stack([even, odd], axis=2).reshape(b, 2 * h, w, c)


def _up_axis_w(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    prev = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
    nxt = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    even = 0.75 * x + 0.25 * prev
    odd = 0.75 * x + 0.25 * nxt
    return jnp.stack([even, odd], axis=3).reshape(b, h, 2 * w, c)


def bilinear_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear upsample of ``[B, H, W, C]`` (half-pixel
    centers), matching ``jax.image.resize(..., method="linear")``."""
    return _up_axis_w(_up_axis_h(x))


def resize_weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Host-side ``[in_size, out_size]`` weight matrix W such that
    ``x @ W == jax.image.resize(x, out_size, "linear")`` along that axis
    (triangle kernel, antialias, half-pixel centers — the same math as
    jax's ``compute_weight_mat``; building it in numpy lets heterogeneous
    eval sizes share ONE compiled einsum keyed on a padded bucket instead
    of recompiling ``jax.image.resize`` per image size)."""
    scale = out_size / in_size
    inv_scale = 1.0 / scale
    kernel_scale = max(inv_scale, 1.0)  # antialias widening on downsample
    sample_f = (np.arange(out_size) + 0.5) * inv_scale - 0.5
    x = np.abs(sample_f[None, :] - np.arange(in_size)[:, None]) / \
        kernel_scale
    w = np.maximum(0.0, 1.0 - np.abs(x))
    total = w.sum(axis=0, keepdims=True)
    w = np.where(np.abs(total) > 1000.0 * np.finfo(np.float32).eps,
                 w / np.where(total != 0, total, 1), 0.0)
    inside = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
    return np.where(inside[None, :], w, 0.0).astype(np.float32)
