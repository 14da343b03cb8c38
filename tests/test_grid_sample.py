"""Parity tests of ops.grid_sample / point_sample against torch's
F.grid_sample — the exact op the reference uses via detectron2's
point_sample (ldmseg/utils/detectron2_utils.py:73-96).
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ldmseg_tpu.ops import grid_sample, point_sample


def _torch_point_sample(feat_nchw, coords, mode="bilinear"):
    # reference point_sample: grid_sample(input, 2*coords-1, align_corners=False)
    t_feat = torch.from_numpy(feat_nchw)
    t_coords = torch.from_numpy(coords).unsqueeze(2)  # [N, P, 1, 2]
    out = F.grid_sample(t_feat, 2.0 * t_coords - 1.0, mode=mode,
                        align_corners=False)
    return out.squeeze(3).numpy()  # [N, C, P]


def test_bilinear_parity_random_points():
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 9, 13, 5).astype(np.float32)  # NHWC
    coords = rng.rand(2, 100, 2).astype(np.float32)
    ours = point_sample(jnp.asarray(feat), jnp.asarray(coords))
    ref = _torch_point_sample(feat.transpose(0, 3, 1, 2), coords)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), ref,
                               rtol=1e-5, atol=1e-5)


def test_bilinear_out_of_bounds_zero_padding():
    rng = np.random.RandomState(1)
    feat = rng.randn(1, 4, 4, 2).astype(np.float32)
    # points outside [0,1] -> partially/ fully out of bounds
    coords = np.array([[[-0.2, 0.5], [1.2, 0.5], [0.5, -0.3], [0.5, 1.4],
                        [-1.0, -1.0]]], dtype=np.float32)
    ours = point_sample(jnp.asarray(feat), jnp.asarray(coords))
    ref = _torch_point_sample(feat.transpose(0, 3, 1, 2), coords)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), ref,
                               rtol=1e-5, atol=1e-6)


def test_nearest_parity():
    rng = np.random.RandomState(2)
    feat = rng.randn(2, 7, 11, 3).astype(np.float32)
    coords = rng.rand(2, 64, 2).astype(np.float32)
    # keep away from exact .5 rounding boundaries (torch uses banker's
    # rounding; random floats never hit them exactly anyway)
    ours = point_sample(jnp.asarray(feat), jnp.asarray(coords), mode="nearest")
    ref = _torch_point_sample(feat.transpose(0, 3, 1, 2), coords, mode="nearest")
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), ref,
                               rtol=1e-5, atol=1e-6)


def test_grid_sample_align_corners_true():
    rng = np.random.RandomState(3)
    feat = rng.randn(1, 5, 6, 2).astype(np.float32)
    grid = (rng.rand(1, 40, 2).astype(np.float32) * 2.0) - 1.0
    ours = grid_sample(jnp.asarray(feat), jnp.asarray(grid),
                       align_corners=True)
    t_out = F.grid_sample(
        torch.from_numpy(feat.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid).unsqueeze(2),
        align_corners=True,
    ).squeeze(3).numpy()
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), t_out,
                               rtol=1e-5, atol=1e-5)
