"""Stage-3 walkthrough: pose-consistent video panoptic segmentation.

The reference fork's stated (and unfinished) goal — "implement a
pose-VAE" for cross-frame consistency (reference README.md:3-5) —
completed here end to end, at toy scale on synthetic clips:

  1. train the segmentation VAE + LDM per frame (stages 1-2),
  2. train PoseExpNet self-supervised on clips (SE(3) inverse-warp
     photometric loss, `train/trainer_pose.py`),
  3. attach the pose net to the diffusion trainer
     (`TrainerDiffusion.attach_pose`) and fine-tune on clips with the
     pose-warped latent temporal-consistency loss,
  4. sample with pose-warped warm starts (`sample_panoptic_clip`: the
     mid-frame's denoised latent is warped into each neighbour by the
     predicted pose, blended, and partially re-denoised) and compare
     cross-frame latent consistency against independent per-frame
     sampling.

Usage:  python examples/video_pose_pipeline.py [--steps 8] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CLIP_T = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import numpy as np
    import jax.numpy as jnp
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.data.video import ClipDataset
    from ldmseg_tpu.models import UNetConfig, PoseExpNet
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.train.trainer_pose import TrainerPose
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

    cfg = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": [8, 16, 16, 32], "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8,
        },
        "train_kwargs": {"batch_size": 2,
                         "train_num_steps": args.steps,
                         "clip_grad": 1.0,
                         # weight of the pose-warped latent
                         # temporal-consistency term in clip training
                         "temporal_consistency_weight": 0.1},
        "sampling_kwargs": {"num_inference_steps": 4},
        "eval_kwargs": {"count_th": 16},
        "ignore_label": 0,
    })
    unet_cfg = UNetConfig(
        in_channels=8, out_channels=4, block_out_channels=(8, 16, 16, 32),
        layers_per_block=1, attention_head_dim=2, norm_num_groups=4,
        use_cross_attention=False)

    h, w = 64, 128
    base = SyntheticDVPS(length=12, size=(h, w), num_classes=20,
                         frames_per_scene=CLIP_T)
    clips = ClipDataset(base, clip_len=CLIP_T)

    print("== pose network: self-supervised on clips ==")
    pose_tr = TrainerPose(cfg, dataset=clips,
                          results_folder="/tmp/example_pose3")
    pose_tr.train_loop(max_steps=args.steps, log_every=max(args.steps // 2, 1))

    print("== LDM on clips with the temporal-consistency loss ==")
    ldm = TrainerDiffusion(cfg, unet_config=unet_cfg, dataset=clips,
                           val_dataset=base,
                           results_folder="/tmp/example_ldm3")
    # stage-3 handoff: the trained pose net drives (a) the consistency
    # loss during clip training and (b) pose-warped clip sampling
    ldm.attach_pose(pose_tr.model, pose_tr.state.params)
    batch = next(iter(Loader(clips, 2, shuffle=False)))
    ldm.init_state(batch)
    ldm.train_loop(max_steps=args.steps,
                   log_every=max(args.steps // 2, 1), save_every=10**9)

    print("== pose-warped clip sampling vs per-frame sampling ==")
    # static clip: cross-frame disagreement is then purely sampling noise
    for k in ("image", "image_semseg", "semseg", "mask", "depth"):
        v = np.asarray(batch[k])
        batch[k] = np.repeat(v[:, :1], CLIP_T, axis=1)

    def disagreement(x0):
        b = batch["image"].shape[0]
        x0 = np.asarray(x0).reshape(b, CLIP_T, *x0.shape[1:])
        return float(np.mean([np.mean(np.abs(x0[:, t + 1] - x0[:, t]))
                              for t in range(CLIP_T - 1)]))

    _, x0_plain = ldm.sample_panoptic_clip(
        batch, jax.random.key(3), num_inference_steps=4, pose_warp=False,
        repeat_noise=False)
    _, x0_warp = ldm.sample_panoptic_clip(
        batch, jax.random.key(3), num_inference_steps=4, pose_warp=True,
        repeat_noise=False,  # same independent noise — isolate the warp
        refine_strength=0.5, warp_blend=0.5)
    d_plain, d_warp = disagreement(x0_plain), disagreement(x0_warp)
    print(f"cross-frame latent disagreement: per-frame {d_plain:.4f} "
          f"-> pose-warped {d_warp:.4f}")
    assert d_warp < d_plain, "pose warping should increase consistency"

    print("== predicted 6-DoF poses for the clip ==")
    poses = pose_tr.predict_poses({"image": batch["image"],
                                   "depth": batch["depth"]})
    print("poses [B, T-1, 6]:", np.asarray(poses).shape)
    print("done.")


if __name__ == "__main__":
    sys.exit(main())
