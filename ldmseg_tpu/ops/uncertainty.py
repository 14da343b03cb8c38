"""PointRend uncertainty-based point sampling.

Reference: ldmseg/utils/detectron2_utils.py:17-70
(``get_uncertain_point_coords_with_randomness``) and the two uncertainty
functions in ldmseg/trainers/losses.py:279-301.

All shapes are static; randomness comes from explicit ``jax.random`` keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import point_sample


def uncertainty_sigmoid(logits: jnp.ndarray) -> jnp.ndarray:
    """Uncertainty for binary-mask logits: ``-|logit|``.

    Parity: losses.py:279-294 (``calculate_uncertainty``). Expects
    ``[N, P, 1]`` (single channel) and returns ``[N, P]``.
    """
    return -jnp.abs(logits[..., 0])


def uncertainty_top2(logits: jnp.ndarray) -> jnp.ndarray:
    """Uncertainty for multi-class logits: ``top2 - top1`` (<= 0).

    Parity: losses.py:296-301 (``calculate_uncertainty_seg``). Expects
    ``[N, P, C]`` and returns ``[N, P]``.
    """
    top2 = jax.lax.top_k(logits, 2)[0]
    return top2[..., 1] - top2[..., 0]


def get_uncertain_point_coords(
    key: jax.Array,
    coarse_logits: jnp.ndarray,
    uncertainty_fn,
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """Sample ``num_points`` coords in [0,1]^2 biased toward uncertain regions.

    Args:
      key: PRNG key.
      coarse_logits: ``[N, H, W, C]`` (channels-last).
      uncertainty_fn: maps sampled logits ``[N, P, C] -> [N, P]``; higher =
        more uncertain.
      num_points / oversample_ratio / importance_sample_ratio: PointRend
        parameters (reference defaults 12544 / 3 / 0.75,
        tools/configs/base/base.yaml:107-110).

    Returns: ``[N, num_points, 2]`` coords, ``(x, y)`` in [0, 1].
    """
    assert oversample_ratio >= 1
    assert 0.0 <= importance_sample_ratio <= 1.0
    n = coarse_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    k_unc = int(importance_sample_ratio * num_points)
    k_rand = num_points - k_unc

    key_over, key_rand = jax.random.split(key)
    coords = jax.random.uniform(key_over, (n, num_sampled, 2),
                                dtype=coarse_logits.dtype)
    logits = point_sample(coarse_logits, coords)
    unc = uncertainty_fn(logits)  # [N, num_sampled]
    idx = jax.lax.top_k(unc, k_unc)[1]  # [N, k_unc]
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if k_rand > 0:
        extra = jax.random.uniform(key_rand, (n, k_rand, 2),
                                   dtype=coarse_logits.dtype)
        picked = jnp.concatenate([picked, extra], axis=1)
    return picked
