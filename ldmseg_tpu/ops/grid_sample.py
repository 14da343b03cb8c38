"""Bilinear / nearest point sampling — torch ``grid_sample`` equivalent.

JAX has no ``grid_sample`` builtin; the reference relies on it through
detectron2's ``point_sample`` (reference: ldmseg/utils/detectron2_utils.py:73-96,
``F.grid_sample(input, 2 * coords - 1, align_corners=False,
padding_mode='zeros')``). This module implements those exact semantics as
vectorized gathers — no python loops, fixed shapes, TPU-friendly.

Layout is channels-LAST: features ``[N, H, W, C]``, points ``[N, P, 2]``
with the torch convention ``points[..., 0] = x`` (width coordinate) and
``points[..., 1] = y`` (height coordinate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_nhwc(feat_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of ``[H*W, C]`` per batch element. idx: ``[P]`` int32."""
    return jnp.take(feat_flat, idx, axis=0)


def grid_sample(
    feat: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch.nn.functional.grid_sample for point grids, channels-last.

    Args:
      feat: ``[N, H, W, C]`` features.
      grid: ``[N, P, 2]`` normalized coordinates in [-1, 1], ``(x, y)`` order.
      mode: 'bilinear' or 'nearest'.
      align_corners: matches the torch flag (reference always uses False).

    Returns: ``[N, P, C]`` sampled features; out-of-bounds reads contribute
      zeros (torch ``padding_mode='zeros'``).
    """
    n, h, w, c = feat.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    feat_flat = feat.reshape(n, h * w, c)

    if mode == "nearest":
        # torch rounds with nearbyint (round-half-to-even), like jnp.round.
        x0 = jnp.round(ix).astype(jnp.int32)
        y0 = jnp.round(iy).astype(jnp.int32)
        valid = (x0 >= 0) & (x0 < w) & (y0 >= 0) & (y0 < h)
        idx = jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1)
        out = jax.vmap(_gather_nhwc)(feat_flat, idx)
        return out * valid[..., None].astype(feat.dtype)

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx1 = ix - x0
    wy1 = iy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def corner(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jax.vmap(_gather_nhwc)(feat_flat, idx)
        return vals * (wgt * valid.astype(feat.dtype))[..., None]

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )
    return out


def point_sample(
    feat: jnp.ndarray,
    point_coords: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """detectron2 ``point_sample``: coords in [0, 1]^2 instead of [-1, 1]^2.

    Parity: ldmseg/utils/detectron2_utils.py:73-96.

    Args:
      feat: ``[N, H, W, C]``.
      point_coords: ``[N, P, 2]`` in [0, 1], ``(x, y)`` order.

    Returns: ``[N, P, C]``.
    """
    return grid_sample(feat, 2.0 * point_coords - 1.0, mode=mode,
                       align_corners=align_corners)
