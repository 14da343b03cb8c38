"""Analog-bits codecs for panoptic maps.

The reference encodes integer id maps into binary "analog bits" channels
(reference: ldmseg/data/kitti.py:292-306, cityscapes.py:218-220,
coco.py:460-463): each pixel's integer id is split into ``n`` binary
channels in {0, 1}; pixels equal to the ignore label are filled with
``fill_value`` (0.5 by default) in every bit plane. Decoding thresholds
each bit plane at 0 (the model emits values in roughly [-1, 1] after the
`2x - 1` normalization) and re-assembles the integer.

TPU-first design notes:
  * device arrays are channels-LAST (``[..., H, W, n]``) — the native TPU
    conv layout — whereas the torch reference is channels-first.
  * everything is vectorized; no per-unique-id python loops.
  * the reference's ``decode_bitmap`` hardcodes ``x[x == 31] = 0``
    (kitti.py:305) — a 5-bit-specific hack that maps the all-ones code
    (produced by ignore regions filled with 0.5 > 0) back to 0. We
    generalize this as ``invalid_to_zero`` mapping the code ``2**n - 1``,
    and document it instead of replicating the magic constant.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def encode_bits(
    x: jnp.ndarray,
    num_bits: int,
    ignore_label: int | None = 0,
    fill_value: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Encode an integer map into analog-bit planes (channels-last).

    Args:
      x: integer array ``[..., H, W]``.
      num_bits: number of bit planes ``n``.
      ignore_label: pixels equal to this id are filled with ``fill_value``
        in every plane. ``None`` disables ignore handling.
      fill_value: value written into ignore pixels (reference default 0.5).

    Returns:
      (bits ``[..., H, W, n]`` float32 in {0, 1} (or fill_value),
       ignore_mask ``[..., H, W]`` bool)

    Parity: ldmseg/data/kitti.py:292-297 (channel-first there).
    """
    x = jnp.asarray(x)
    shifts = jnp.arange(num_bits, dtype=x.dtype)
    bits = ((x[..., None] >> shifts) & 1).astype(jnp.float32)
    if ignore_label is None:
        ignore = jnp.zeros(x.shape, dtype=bool)
    else:
        ignore = x == ignore_label
        bits = jnp.where(ignore[..., None], jnp.float32(fill_value), bits)
    return bits, ignore


def decode_bits(
    x: jnp.ndarray,
    axis: int = -1,
    invalid_to_zero: bool = True,
) -> jnp.ndarray:
    """Decode analog-bit planes back to an integer map.

    Args:
      x: float array with bit planes along ``axis``; a plane is counted as a
        set bit when ``> 0`` (model outputs live in ~[-1, 1]).
      axis: the bit-plane axis (default: channels-last).
      invalid_to_zero: map the all-ones code ``2**n - 1`` to 0. Ignore
        regions were filled with 0.5 at encode time, so after the
        ``2x - 1`` shift they decode to all-ones; the reference hardcodes
        this for n=5 as ``x[x == 31] = 0`` (kitti.py:305).

    Returns: int32 array with the bit axis removed.
    """
    x = jnp.asarray(x)
    axis = axis % x.ndim
    n = x.shape[axis]
    bits = (x > 0).astype(jnp.int32)
    shape = [1] * x.ndim
    shape[axis] = n
    weights = (2 ** jnp.arange(n, dtype=jnp.int32)).reshape(shape)
    out = jnp.sum(bits * weights, axis=axis)
    if invalid_to_zero:
        out = jnp.where(out == (2**n - 1), 0, out)
    return out


# ---------------------------------------------------------------------------
# Host (numpy) versions for the data pipeline — identical semantics.
# ---------------------------------------------------------------------------

def encode_bits_np(
    x: np.ndarray,
    num_bits: int,
    ignore_label: int | None = 0,
    fill_value: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Numpy twin of :func:`encode_bits` for host data pipelines."""
    x = np.asarray(x)
    shifts = np.arange(num_bits, dtype=x.dtype)
    bits = ((x[..., None] >> shifts) & 1).astype(np.float32)
    if ignore_label is None:
        ignore = np.zeros(x.shape, dtype=bool)
    else:
        ignore = x == ignore_label
        bits[ignore] = np.float32(fill_value)
    return bits, ignore


def decode_bits_np(
    x: np.ndarray,
    axis: int = -1,
    invalid_to_zero: bool = True,
) -> np.ndarray:
    """Numpy twin of :func:`decode_bits`."""
    x = np.asarray(x)
    axis = axis % x.ndim
    n = x.shape[axis]
    bits = (x > 0).astype(np.int64)
    shape = [1] * x.ndim
    shape[axis] = n
    weights = (2 ** np.arange(n, dtype=np.int64)).reshape(shape)
    out = np.sum(bits * weights, axis=axis)
    if invalid_to_zero:
        out[out == (2**n - 1)] = 0
    return out
