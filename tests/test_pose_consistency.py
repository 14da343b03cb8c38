"""Pose-consistency losses + TrainerPose: geometric sanity (identity pose
warps to identity), gradient flow, and an end-to-end clip training step.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ldmseg_tpu.losses.pose_consistency import (
    euler_to_matrix, pose_vec_to_mat, inverse_warp,
    photometric_consistency_loss, segmentation_consistency_loss)


def test_euler_identity_and_orthonormal():
    R = euler_to_matrix(jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    R = euler_to_matrix(jnp.asarray([0.3, -0.2, 0.5]))
    RtR = np.asarray(R.T @ R)
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-5)


def test_identity_pose_warp_is_identity():
    rng = np.random.RandomState(0)
    ref = jnp.asarray(rng.rand(1, 32, 48, 3).astype(np.float32))
    depth = jnp.full((1, 32, 48), 10.0)
    pose = jnp.zeros((1, 6))
    focal = jnp.asarray([100.0])
    warped, valid = inverse_warp(ref, depth, pose, focal)
    assert bool(valid.all())
    np.testing.assert_allclose(np.asarray(warped), np.asarray(ref),
                               atol=1e-3)


def test_translation_shifts_image():
    """Camera translated along +x: the reprojection samples the reference
    at shifted pixels -> warped equals a horizontal shift of ref."""
    ref = np.zeros((1, 16, 32, 1), np.float32)
    ref[0, :, 16, 0] = 1.0  # vertical line at x=16
    depth = jnp.full((1, 16, 32), 10.0)
    focal = jnp.asarray([10.0])
    # t_x = +1 at depth 10 with f=10 -> shift of +1 px in sampling coord
    pose = jnp.asarray([[1.0, 0, 0, 0, 0, 0]])
    warped, _ = inverse_warp(jnp.asarray(ref), depth, pose, focal)
    col = np.asarray(warped)[0, 8, :, 0]
    assert col.argmax() == 15  # line appears shifted left by one pixel


def test_photometric_loss_zero_for_static_scene():
    rng = np.random.RandomState(1)
    img = rng.rand(2, 16, 24, 3).astype(np.float32)
    refs = np.stack([img, img], axis=1)
    depth = np.full((2, 16, 24), 5.0, np.float32)
    poses = np.zeros((2, 2, 6), np.float32)
    out = photometric_consistency_loss(
        jnp.asarray(img), jnp.asarray(refs), jnp.asarray(depth),
        jnp.asarray(poses), jnp.asarray([50.0, 50.0]))
    assert float(out["photo"]) < 1e-3
    # gradient flows to poses
    g = jax.grad(lambda p: photometric_consistency_loss(
        jnp.asarray(img), jnp.asarray(refs), jnp.asarray(depth), p,
        jnp.asarray([50.0, 50.0]))["photo"])(jnp.asarray(poses) + 0.01)
    assert np.all(np.isfinite(np.asarray(g)))


def test_segmentation_consistency():
    bits = np.random.RandomState(2).rand(1, 16, 24, 10).astype(np.float32)
    depth = jnp.full((1, 16, 24), 5.0)
    loss = segmentation_consistency_loss(
        jnp.asarray(bits), jnp.asarray(bits), depth, jnp.zeros((1, 6)),
        jnp.asarray([50.0]))
    assert float(loss) < 1e-6


def test_trainer_pose_end_to_end(tmp_path):
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.data.video import ClipDataset
    from ldmseg_tpu.train.trainer_pose import TrainerPose
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

    cfg = merge_dicts(DEFAULT_CONFIG, {
        "train_kwargs": {"batch_size": 8, "train_num_steps": 2,
                         "clip_grad": 1.0}})
    base = SyntheticDVPS(length=32, size=(64, 128), frames_per_scene=8)
    clips = ClipDataset(base, clip_len=3)
    tr = TrainerPose(cfg, dataset=clips, results_folder=str(tmp_path))
    tr.train_loop(max_steps=2, log_every=1)
    assert int(tr.state.step) == 2

    batch = next(iter(Loader(clips, 8, shuffle=False)))
    poses = tr.predict_poses({"image": batch["image"],
                              "depth": batch["depth"]})
    assert poses.shape == (8, 2, 6)
    assert np.all(np.isfinite(np.asarray(poses)))
