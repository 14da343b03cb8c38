"""PoseExpNet — Flax redesign of the SfMLearner pose/explainability net
(reference posenet/posenet.py:21-96, the fork's "pose-VAE" for cross-frame
consistency; exercised in Pose.ipynb cells 13-19).

7 stride-2 conv stages -> 6-DoF pose per reference frame (scaled by 0.01),
plus an optional upconv decoder emitting multi-scale explainability masks.
Channels-last; the frame stack is concatenated along channels like the
reference (forward :61-63).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PoseExpNet(nn.Module):
    nb_ref_imgs: int = 2
    output_exp: bool = False

    @nn.compact
    def __call__(self, target_image: jnp.ndarray,
                 ref_imgs: Sequence[jnp.ndarray],
                 train: bool = True):
        assert len(ref_imgs) == self.nb_ref_imgs
        x = jnp.concatenate([target_image, *ref_imgs], axis=-1)

        planes = (16, 32, 64, 128, 256, 256, 256)
        ksizes = (7, 5, 3, 3, 3, 3, 3)
        feats = []
        h = x
        for i, (c, k) in enumerate(zip(planes, ksizes)):
            h = nn.Conv(c, (k, k), strides=(2, 2), padding=(k - 1) // 2,
                        name=f"conv{i + 1}")(h)
            h = nn.relu(h)
            feats.append(h)

        pose = nn.Conv(6 * self.nb_ref_imgs, (1, 1), name="pose_pred")(h)
        pose = jnp.mean(pose, axis=(1, 2))  # (:72-73)
        pose = 0.01 * pose.reshape(pose.shape[0], self.nb_ref_imgs, 6)

        if not self.output_exp:
            return (None, pose) if not train else ([None] * 4, pose)

        up_planes = (256, 128, 64, 32, 16)
        # crops mirror the reference's size-matching slices (:77-81)
        targets = [feats[3], feats[2], feats[1], feats[0], x]
        h = feats[4]
        ups = []
        for i, c in enumerate(up_planes):
            # torch ConvTranspose2d(k=4, s=2, p=1) doubles the size; flax's
            # integer padding differs — 'SAME' reproduces out = 2 * in
            h = nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME",
                                 name=f"upconv{5 - i}")(h)
            h = nn.relu(h)
            t = targets[i]
            h = h[:, : t.shape[1], : t.shape[2], :]
            ups.append(h)

        masks = []
        for i, u in enumerate(ups[1:]):  # masks from upconv4..1 (:83-86)
            m = nn.Conv(self.nb_ref_imgs, (3, 3), padding=1,
                        name=f"predict_mask{4 - i}")(u)
            masks.append(jax.nn.sigmoid(m))
        exp1, exp2, exp3, exp4 = masks[3], masks[2], masks[1], masks[0]
        if train:
            return [exp1, exp2, exp3, exp4], pose
        return exp1, pose
