"""End-to-end walkthrough on synthetic data (the notebooks' replacement).

Runs the full two-stage method at toy scale:
  1. stage 1 — train the segmentation VAE on analog-bits panoptic maps,
  2. stage 2 — train the conditional LDM on the frozen VAEs,
  3. sample panoptic maps with the 50-step (here 5-step) DDIM scan,
  4. evaluate PQ + windowed DVPQ,
  5. train the pose network on clips and predict 6-DoF poses.

Usage:  python examples/end_to_end_synthetic.py [--steps 20] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import numpy as np
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.data.video import ClipDataset
    from ldmseg_tpu.models import UNetConfig
    from ldmseg_tpu.train.trainer_ae import TrainerAE
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.train.trainer_pose import TrainerPose
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

    cfg = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": [8, 16, 16, 32], "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8,
        },
        "train_kwargs": {"batch_size": 8,
                         "train_num_steps": args.steps,
                         "clip_grad": 1.0},
        "loss_kwargs": {"num_points": 512, "max_masks": 16},
        "loss_weights": {"mask": 1.0, "ce": 1.0, "kl": 1e-6},
        "sampling_kwargs": {"num_inference_steps": 5},
        "eval_kwargs": {"count_th": 32},
        "ignore_label": 0,
    })
    ds = SyntheticDVPS(length=32, size=(64, 128), num_classes=20)

    print("== stage 1: segmentation VAE ==")
    ae = TrainerAE(cfg, dataset=ds, val_dataset=ds,
                   results_folder="/tmp/example_ae")
    ae.train_loop(max_steps=args.steps, log_every=max(args.steps // 4, 1),
                  save_every=10**9)
    print("mIoU:", ae.compute_miou(max_batches=2)["mIoU"])

    print("== stage 2: conditional LDM ==")
    unet_cfg = UNetConfig(
        in_channels=8, out_channels=4, block_out_channels=(8, 16, 16, 32),
        layers_per_block=1, cross_attention_dim=16, attention_head_dim=2,
        norm_num_groups=4, use_cross_attention=False)
    ldm = TrainerDiffusion(cfg, unet_config=unet_cfg, dataset=ds,
                           val_dataset=ds,
                           results_folder="/tmp/example_ldm")
    batch = next(iter(Loader(ds, 8, shuffle=False)))
    # stage-1 -> stage-2 handoff: adopt the trained seg-VAE weights
    ldm.init_state(batch, vae_seg_params=ae.state.params)
    ldm.train_loop(max_steps=args.steps, log_every=max(args.steps // 4, 1),
                   save_every=10**9)

    print("== sampling + PQ ==")
    results = ldm.compute_pq(num_inference_steps=5, max_batches=1)
    print({k: round(v, 2) for k, v in results.items()
           if isinstance(v, (int, float))})

    print("== DVPQ over sampled frames ==")
    from ldmseg_tpu.evals import evaluate_dvpq
    logits, _ = ldm.sample_panoptic(batch, jax.random.key(0),
                                    num_inference_steps=3)
    import jax.numpy as jnp
    pred = np.asarray(jnp.argmax(jax.image.resize(
        logits, (8, 64, 128, logits.shape[-1]), "linear"), -1))
    # the VPQ contract expects prediction categories < num_cat (20)
    pred = np.minimum(pred, 19)
    scores = evaluate_dvpq(
        [pred[i] for i in range(4)], [np.zeros_like(pred[i]) for i in range(4)],
        [batch["semseg"][i] for i in range(4)],
        [np.zeros_like(pred[i]) for i in range(4)],
        eval_frames=2, use_device=not args.cpu)
    print("DVPQ:", round(scores["pq"], 2))

    print("== pose network on clips ==")
    clips = ClipDataset(SyntheticDVPS(length=24, size=(64, 128),
                                      frames_per_scene=8), clip_len=3)
    pose_tr = TrainerPose(cfg, dataset=clips,
                          results_folder="/tmp/example_pose")
    pose_tr.train_loop(max_steps=2, log_every=1)
    cb = next(iter(Loader(clips, 4, shuffle=False)))
    poses = pose_tr.predict_poses({"image": cb["image"],
                                   "depth": cb["depth"]})
    print("poses:", np.asarray(poses).shape)
    print("done.")


if __name__ == "__main__":
    sys.exit(main())
