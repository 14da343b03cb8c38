"""mIoU meter.

Reference: ldmseg/evaluations/semseg_evaluation.py:14-70 (``SemsegMeter``
with cross-rank all_reduce sync). Per-batch statistics are computed on
device (one jit); accumulation happens on host; ``synchronize`` maps to a
psum when running multi-process.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_classes", "ignore_label",
                                   "has_bg"))
def _batch_stats(pred: jnp.ndarray, gt: jnp.ndarray, num_classes: int,
                 ignore_label: int, has_bg: bool):
    """Per-class intersection / union counts for one batch."""
    n_eval = num_classes + int(has_bg)
    valid = gt != ignore_label
    onehot_p = jax.nn.one_hot(pred, n_eval, dtype=jnp.float32)
    onehot_g = jax.nn.one_hot(gt, n_eval, dtype=jnp.float32)
    v = valid[..., None].astype(jnp.float32)
    inter = jnp.sum(onehot_p * onehot_g * v, axis=tuple(range(gt.ndim)))
    union = jnp.sum(jnp.clip(onehot_p + onehot_g, 0, 1) * v,
                    axis=tuple(range(gt.ndim)))
    return inter, union


class SemsegMeter:
    def __init__(self, num_classes: int, class_names=None,
                 has_bg: bool = False, ignore_index: int = 255):
        self.num_classes = num_classes
        self.has_bg = has_bg
        self.ignore_index = ignore_index
        n = num_classes + int(has_bg)
        self.class_names = class_names or [f"cls_{i}" for i in range(n)]
        self.reset()

    def reset(self):
        n = self.num_classes + int(self.has_bg)
        self.inter = np.zeros(n, dtype=np.float64)
        self.union = np.zeros(n, dtype=np.float64)

    def update(self, pred, gt):
        """pred/gt: int arrays ``[B, H, W]`` (device or host)."""
        inter, union = _batch_stats(jnp.asarray(pred), jnp.asarray(gt),
                                    self.num_classes, self.ignore_index,
                                    self.has_bg)
        self.inter += np.asarray(inter)
        self.union += np.asarray(union)

    def synchronize(self, axis_name=None):
        """Cross-host reduction (reference :59-70). For jax multi-process,
        sum via multihost_utils; single-host is a no-op."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            stacked = multihost_utils.process_allgather(
                np.stack([self.inter, self.union]))
            self.inter = stacked[:, 0].sum(0)
            self.union = stacked[:, 1].sum(0)

    def return_score(self, verbose: bool = False) -> dict:
        jac = self.inter / np.maximum(self.union, 1e-8)
        if verbose:
            for name, j in zip(self.class_names, jac):
                print(f"IoU {name}: {100*j:.2f}")
        return {"mIoU": float(100 * jac.mean()),
                "per_class": (100 * jac).tolist()}
