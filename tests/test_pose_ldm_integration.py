"""Pose -> LDM integration (the fork's stated goal, reference
README.md:3-5): clip training with the temporal-consistency loss,
pose-warped clip sampling, DVPQ improvement over per-frame sampling, and
the stage-3 checkpoint handoff (main_pose -> attach_pose).
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from ldmseg_tpu.data import SyntheticDVPS, Loader
from ldmseg_tpu.data.video import ClipDataset
from ldmseg_tpu.models import UNetConfig, PoseExpNet
from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

pytestmark = pytest.mark.slow

CLIP_T = 3

SMALL = merge_dicts(DEFAULT_CONFIG, {
    "vae_model_kwargs": {
        "in_channels": 10, "int_channels": 32, "out_channels": 32,
        "block_out_channels": [8, 16, 16, 32], "num_upscalers": 2,
        "upscale_channels": 32, "norm_num_groups": 8,
    },
    "train_kwargs": {"batch_size": 2, "train_num_steps": 2,
                     "clip_grad": 1.0,
                     "temporal_consistency_weight": 0.1},
    "sampling_kwargs": {"num_inference_steps": 4},
    "eval_kwargs": {"count_th": 16},
    "ignore_label": 0,
})

TINY_UNET = UNetConfig(
    in_channels=8, out_channels=4, block_out_channels=(8, 16, 16, 32),
    layers_per_block=1, cross_attention_dim=16, attention_head_dim=2,
    norm_num_groups=4, use_cross_attention=False)


def _clip_trainer(tmp_path, with_pose=True, static_scene=False):
    from ldmseg_tpu.parallel import make_mesh
    base = SyntheticDVPS(length=12, size=(64, 128), num_classes=20,
                         frames_per_scene=CLIP_T)
    clips = ClipDataset(base, clip_len=CLIP_T)
    tr = TrainerDiffusion(SMALL, unet_config=TINY_UNET, dataset=clips,
                          val_dataset=base, mesh=make_mesh(num_data=2),
                          results_folder=str(tmp_path))
    if with_pose:
        pose = PoseExpNet(nb_ref_imgs=CLIP_T - 1, output_exp=False)
        h, w = 64, 128
        pparams = jax.jit(pose.init)(
            jax.random.key(0), jnp.zeros((1, h, w, 3)),
            [jnp.zeros((1, h, w, 3)) for _ in range(CLIP_T - 1)])
        tr.attach_pose(pose, pparams)
    batch = next(iter(Loader(clips, 2, shuffle=False)))
    tr.init_state(batch)
    return tr, batch


def test_clip_train_step_with_consistency_loss(tmp_path):
    """Clip batches [B, T, ...] train end-to-end; the pose-warped
    temporal-consistency term is finite, positive, and differentiates."""
    tr, batch = _clip_trainer(tmp_path)
    assert batch["image"].ndim == 5  # [B, T, H, W, 3]
    from ldmseg_tpu.parallel import shard_batch
    db = shard_batch(tr.mesh, tr._device_batch(batch))
    assert "depth" in db and "focal" in db
    # fetch before the step: the jitted step donates the old state
    l0 = np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0])
    state, metrics, pred_x0 = tr._train_step(
        tr.state, tr.frozen_params, db, jax.random.key(0))
    loss = float(jax.device_get(metrics["loss"]))
    cons = float(jax.device_get(metrics["consistency"]))
    assert np.isfinite(loss)
    assert np.isfinite(cons) and cons > 0.0
    # params actually moved (the combined loss has gradients)
    l1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.allclose(l0, l1)


def test_clip_train_loop_runs(tmp_path):
    tr, _ = _clip_trainer(tmp_path)
    tr.train_loop(max_steps=2, log_every=1, save_every=100)
    assert int(tr.state.step) == 2


def test_pose_warped_sampling_improves_consistency(tmp_path):
    """On a static scene (identical frames), pose-warped clip sampling
    must produce MORE consistent frame latents and a better DVPQ
    (eval_frames=2) than independent per-frame sampling."""
    from ldmseg_tpu.evals import evaluate_dvpq
    from ldmseg_tpu.ops import panoptic_post_process

    tr, batch = _clip_trainer(tmp_path, static_scene=True)

    # make the clip truly static: repeat frame 0 so cross-frame
    # disagreement is purely sampling noise
    for k in ("image", "image_semseg", "semseg", "mask", "depth"):
        v = np.asarray(batch[k])
        batch[k] = np.repeat(v[:, :1], CLIP_T, axis=1)

    def run(pose_warp, repeat_noise=False):
        logits, x0 = tr.sample_panoptic_clip(
            batch, jax.random.key(3), num_inference_steps=4,
            repeat_noise=repeat_noise, pose_warp=pose_warp,
            refine_strength=0.5, warp_blend=0.5)
        return np.asarray(logits), np.asarray(x0)

    _, x0_plain = run(False)
    _, x0_warp = run(True)

    b = batch["image"].shape[0]
    x0_plain = x0_plain.reshape(b, CLIP_T, *x0_plain.shape[1:])
    x0_warp = x0_warp.reshape(b, CLIP_T, *x0_warp.shape[1:])

    def frame_disagreement(x0):
        d = 0.0
        for t in range(CLIP_T - 1):
            d += float(np.mean(np.abs(x0[:, t + 1] - x0[:, t])))
        return d / (CLIP_T - 1)

    # warped+refined latents agree across frames better than independent
    assert frame_disagreement(x0_warp) < frame_disagreement(x0_plain)

    # DVPQ over 2-frame windows: score both predictions against the (per
    # clip, static) GT; the consistent sampler must not be worse, and the
    # disagreement reduction must show up in the association metric
    def dvpq_of(logits_flat):
        h, w = np.asarray(batch["semseg"]).shape[2:4]
        logits = jax.image.resize(
            jnp.asarray(logits_flat),
            (logits_flat.shape[0], h, w, logits_flat.shape[-1]), "linear")
        cleaned, _ = panoptic_post_process(
            logits, mask_th=0.0, count_th=0, overlap_th=0.0,
            ignore_label=0)
        cleaned = np.asarray(cleaned).reshape(b, CLIP_T, h, w)
        scores = []
        for bi in range(b):
            pred = [np.maximum(cleaned[bi, t], 0) for t in range(CLIP_T)]
            zeros = [np.zeros_like(p) for p in pred]
            gt_c = [np.asarray(batch["semseg"])[bi, t]
                    for t in range(CLIP_T)]
            scores.append(evaluate_dvpq(
                pred, zeros, gt_c, zeros, eval_frames=2,
                num_cat=33, num_eval_cat=32, things_split=8)["pq"])
        return float(np.mean(scores))

    l_plain, _ = run(False)
    l_warp, _ = run(True)
    assert dvpq_of(l_warp) >= dvpq_of(l_plain)


def test_pose_checkpoint_handoff(tmp_path):
    """main_pose-style save -> TrainerDiffusion.attach_pose restores and
    the clip path runs with the restored params (stage-3 handoff)."""
    from ldmseg_tpu.train.trainer_pose import TrainerPose
    import orbax.checkpoint as ocp

    base = SyntheticDVPS(length=6, size=(64, 128), num_classes=20,
                         frames_per_scene=CLIP_T)
    clips = ClipDataset(base, clip_len=CLIP_T)
    cfg = merge_dicts(DEFAULT_CONFIG, {
        "train_kwargs": {"batch_size": 2, "train_num_steps": 1}})
    from ldmseg_tpu.parallel import make_mesh
    tp = TrainerPose(cfg, dataset=clips,
                     results_folder=str(tmp_path / "pose"),
                     mesh=make_mesh(num_data=2),
                     nb_ref_imgs=CLIP_T - 1, output_exp=False)
    tp.train_loop(max_steps=1)
    path = tp.save(step=1)

    restored = ocp.StandardCheckpointer().restore(path)
    assert int(restored["nb_ref"]) == CLIP_T - 1

    tr, batch = _clip_trainer(tmp_path / "ldm", with_pose=False)
    tr.attach_pose(PoseExpNet(nb_ref_imgs=CLIP_T - 1, output_exp=False),
                   restored["params"])
    # attach after init_state must refresh frozen_params
    assert "pose" in tr.frozen_params
    logits, x0 = tr.sample_panoptic_clip(batch, jax.random.key(0),
                                         num_inference_steps=2)
    assert np.all(np.isfinite(np.asarray(x0)))
