"""Mask2Former-style Hungarian matcher (optional path).

Reference: ldmseg/trainers/losses.py:44-101 (``matcher``) — per image,
point-sampled BCE + Dice costs between prediction channels and GT masks,
assigned with ``scipy.optimize.linear_sum_assignment``. Disabled by
default there (``do_matching=False``, :369) and here.

TPU design: the cost matrix is computed fully on device with one shared
point set (as the reference does, :72); only the O(n^3) assignment runs on
host through ``jax.pure_callback`` with fixed-size padded inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import point_sample
from .point_losses import select_topk_masks


def _hungarian_host(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Solve assignment per batch element; invalid columns get cost inf.
    Returns col index per row (query -> target), -1 for unassigned."""
    from scipy.optimize import linear_sum_assignment
    b, nq, nt = cost.shape
    out = np.full((b, nq), -1, dtype=np.int32)
    for i in range(b):
        nv = int(valid[i].sum())
        if nv == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :nv])
        out[i, rows] = cols
    return out


def sigmoid_ce_cost(point_logits: jnp.ndarray,
                    point_labels: jnp.ndarray) -> jnp.ndarray:
    """Pairwise BCE cost (losses.py:249-277): [Q, P] x [T, P] -> [Q, T]."""
    p = point_logits
    pos = jnp.maximum(p, 0) - p + jnp.log1p(jnp.exp(-jnp.abs(p)))
    neg = jnp.maximum(p, 0) + jnp.log1p(jnp.exp(-jnp.abs(p)))
    cost = jnp.einsum("qp,tp->qt", pos, point_labels) + \
        jnp.einsum("qp,tp->qt", neg, 1.0 - point_labels)
    return cost / p.shape[-1]


def dice_cost(point_logits: jnp.ndarray,
              point_labels: jnp.ndarray) -> jnp.ndarray:
    """Pairwise dice cost (losses.py:209-228)."""
    p = jax.nn.sigmoid(point_logits)
    numerator = 2.0 * jnp.einsum("qp,tp->qt", p, point_labels)
    denominator = p.sum(-1)[:, None] + point_labels.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def hungarian_match(
    key: jax.Array,
    outputs: jnp.ndarray,
    targets: jnp.ndarray,
    num_points: int = 12544,
    max_targets: int = 32,
    ignore_label: int = 0,
    cost_mask: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Match prediction channels to GT masks.

    Args:
      outputs: ``[B, H, W, Q]`` mask logits.
      targets: ``[B, Ht, Wt]`` int id map.

    Returns: (assignment ``[B, Q]`` int32 target-slot per query or -1,
              target_ids ``[B, max_targets]`` the class ids per slot).
    """
    b, h, w, q = outputs.shape
    ids, valid = select_topk_masks(targets, q, ignore_label, max_targets)

    # one shared point set for all masks (losses.py:72)
    coords = jax.random.uniform(key, (b, num_points, 2))
    out_pts = point_sample(outputs, coords)              # [B, P, Q]
    tgt_raw = point_sample(targets[..., None].astype(jnp.float32), coords,
                           mode="nearest")[..., 0]       # [B, P]
    tgt_pts = (tgt_raw[:, None, :] ==
               ids[:, :, None].astype(jnp.float32))      # [B, T, P]
    tgt_pts = tgt_pts.astype(jnp.float32)

    def per_image(o, t):
        return cost_mask * (sigmoid_ce_cost(o.T, t) + dice_cost(o.T, t))

    cost = jax.vmap(per_image)(out_pts, tgt_pts)         # [B, Q, T]
    cost = jnp.where(valid[:, None, :], cost, jnp.inf)

    assignment = jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct((b, q), jnp.int32),
        jnp.where(jnp.isinf(cost), 1e9, cost), valid,
    )
    return assignment, ids
