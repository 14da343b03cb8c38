"""Metric-level accuracy gate on a TRAINED model, on the real chip
(VERDICT r4 item 5).

Trains a small-but-real two-stage model on synthetic DVPS through the
trainer APIs (stage 1 seg-VAE -> stage 2 LDM adopting it -> short pose
stage), then gates the task metric:

  (a) sampled DVPQ improves over training (vs the step-0 model),
  (b) int8 sampling (auto-calibrated on the trained weights) matches
      bf16 DVPQ within noise,
  (c) pose-warped clip sampling is not worse than per-frame sampling
      on DVPQ with eval_frames=2.

The model is sized so the int8 kernel paths actually engage on chip
(attention d%8==0, T%8==0 at the 12x40 latent; s8 resnet convs).

Usage (real TPU, ~15-30 min):
    python -m ldmseg_tpu.tools.perf.trained_gate
"""

import json
import os
import time

import numpy as np


H, W = 96, 320
CLIP_T = 3


def small_cfg(merge_dicts, base):
    return merge_dicts(base, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": [16, 32, 32, 64], "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8,
        },
        "image_vae_kwargs": {"block_out_channels": [16, 32, 32, 64],
                             "groups": 8},
        "train_kwargs": {"batch_size": 8, "train_num_steps": 10**6,
                         "weight_dtype": "bfloat16", "clip_grad": 1.0},
        "optimizer_kwargs": {"lr": 2e-4, "weight_decay": 0.01},
        "noise_scheduler_kwargs": {"prediction_type": "epsilon",
                                   "weight": "max_clamp_snr",
                                   "max_snr": 2.0},
        "sampling_kwargs": {"num_inference_steps": 10},
        "eval_kwargs": {"count_th": 32, "mask_th": 0.0,
                        "overlap_th": 0.0, "eval_every": None},
        "transformation_kwargs": {"size": H, "size_2": W},
        "ignore_label": 0,
    })


def sample_dvpq(trainer, ds, batches, key, eval_frames=1):
    """Sample the val set per-frame and score DVPQ per scene."""
    import jax
    import jax.numpy as jnp
    from ldmseg_tpu.data import Loader
    from ldmseg_tpu.ops import panoptic_post_process
    from ldmseg_tpu.evals import evaluate_dvpq

    preds, gts = [], []
    for bi, batch in enumerate(Loader(ds, 8, shuffle=False)):
        key, sub = jax.random.split(jax.random.key(key) if
                                    isinstance(key, int) else key)
        logits, _ = trainer.sample_panoptic(batch, sub)
        h, w = np.asarray(batch["semseg"]).shape[1:3]
        lg = jax.image.resize(
            jnp.asarray(logits), (logits.shape[0], h, w,
                                  logits.shape[-1]), "linear")
        cleaned, _ = panoptic_post_process(
            lg, mask_th=trainer.mask_th, count_th=trainer.count_th,
            overlap_th=trainer.overlap_th, ignore_label=0)
        cleaned = np.asarray(cleaned)
        for i in range(cleaned.shape[0]):
            preds.append(np.maximum(cleaned[i], 0))
            gts.append(np.asarray(batch["semseg"][i]))
        if bi + 1 >= batches:
            break
    zeros = [np.zeros_like(p) for p in preds]
    res = evaluate_dvpq(preds, zeros, gts, zeros,
                        eval_frames=eval_frames, num_cat=33,
                        num_eval_cat=32, things_split=8)
    return float(res["pq"])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.data.video import ClipDataset
    from ldmseg_tpu.models import UNetConfig, PoseExpNet
    from ldmseg_tpu.train.trainer_ae import TrainerAE
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.train.trainer_pose import TrainerPose
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

    t_all = time.time()
    steps_ae = int(os.environ.get("LDMSEG_GATE_AE_STEPS", "300"))
    steps_ldm = int(os.environ.get("LDMSEG_GATE_LDM_STEPS", "500"))
    steps_pose = int(os.environ.get("LDMSEG_GATE_POSE_STEPS", "100"))
    out_dir = os.environ.get("LDMSEG_GATE_DIR", "/tmp/ldmseg_gate")
    os.system(f"rm -rf {out_dir}")
    cfg = small_cfg(merge_dicts, DEFAULT_CONFIG)

    train_ds = SyntheticDVPS(length=64, size=(H, W), num_classes=20,
                             frames_per_scene=CLIP_T)
    val_ds = SyntheticDVPS(length=16, size=(H, W), num_classes=20,
                           frames_per_scene=CLIP_T, seed=1)

    # ---- stage 1: seg-VAE ----
    ae = TrainerAE(cfg, dataset=train_ds, val_dataset=val_ds,
                   results_folder=os.path.join(out_dir, "ae"))
    ae.train_loop(max_steps=steps_ae, log_every=100, save_every=10**9)
    miou = float(ae.compute_miou(max_batches=2)["mIoU"])
    print(f"[stage1] {steps_ae} steps, recon mIoU {miou:.1f}",
          flush=True)

    # eval-plumbing sanity: GT scored against itself must be ~100
    from ldmseg_tpu.evals import evaluate_dvpq
    gts = [np.asarray(val_ds[i]["semseg"]) for i in range(8)]
    zeros = [np.zeros_like(g) for g in gts]
    sanity = float(evaluate_dvpq(gts, zeros, gts, zeros, eval_frames=1,
                                 num_cat=33, num_eval_cat=32,
                                 things_split=8)["pq"])
    print(f"[sanity] DVPQ(gt, gt) = {sanity:.1f} (expect ~100)",
          flush=True)

    # ---- stage 2: LDM adopting the trained seg-VAE ----
    # int8-capable small UNet: d = c/heads % 8 == 0 at every attn site,
    # T = 12*40 = 480 % 8 == 0
    unet_cfg = UNetConfig(
        in_channels=8, out_channels=4, block_out_channels=(32, 64),
        attn_down=(True, True), layers_per_block=1,
        cross_attention_dim=32, attention_head_dim=2,
        norm_num_groups=8, use_cross_attention=False)
    cfg_ldm = merge_dicts(cfg, {"sampling_kwargs": {
        "num_inference_steps": 10, "int8_inference": False}})
    tr = TrainerDiffusion(cfg_ldm, unet_config=unet_cfg,
                          dataset=train_ds, val_dataset=val_ds,
                          results_folder=os.path.join(out_dir, "ldm"))
    first = next(iter(Loader(train_ds, 8, shuffle=False)))
    tr.init_state(first, vae_seg_params=jax.device_get(
        ae.state.params))
    dvpq_step0 = sample_dvpq(tr, val_ds, batches=2, key=0)
    print(f"[stage2] DVPQ @ step 0: {dvpq_step0:.2f}", flush=True)
    tr.train_loop(max_steps=steps_ldm, log_every=100, save_every=10**9)
    dvpq_bf16 = sample_dvpq(tr, val_ds, batches=2, key=0)
    print(f"[stage2] DVPQ @ step {steps_ldm} (bf16): {dvpq_bf16:.2f}",
          flush=True)

    # ---- int8 on the TRAINED weights (auto-calibrates on first batch)
    cfg_i8 = merge_dicts(cfg_ldm, {"sampling_kwargs": {
        "int8_inference": True}})
    tr_i8 = TrainerDiffusion(cfg_i8, unet_config=unet_cfg,
                             dataset=train_ds, val_dataset=val_ds,
                             results_folder=os.path.join(out_dir, "ldm"))
    tr_i8.init_state(first,
                     unet_params=jax.device_get(tr.state.params),
                     vae_seg_params=jax.device_get(ae.state.params),
                     vae_img_params=jax.device_get(
                         tr.frozen_params["vae_img"]))
    dvpq_int8 = sample_dvpq(tr_i8, val_ds, batches=2, key=0)
    print(f"[int8] DVPQ (auto-calibrated s8 sampling): {dvpq_int8:.2f}",
          flush=True)

    # ---- stage 3: pose net + pose-warped clip sampling ----
    clips_train = ClipDataset(train_ds, clip_len=CLIP_T)
    clips_val = ClipDataset(val_ds, clip_len=CLIP_T)
    tp = TrainerPose(cfg, dataset=clips_train,
                     results_folder=os.path.join(out_dir, "pose"),
                     nb_ref_imgs=CLIP_T - 1, output_exp=False)
    tp.train_loop(max_steps=steps_pose)
    tr.attach_pose(PoseExpNet(nb_ref_imgs=CLIP_T - 1, output_exp=False),
                   jax.device_get(tp.state.params))

    def clip_dvpq(pose_warp):
        from ldmseg_tpu.ops import panoptic_post_process
        from ldmseg_tpu.evals import evaluate_dvpq
        batch = next(iter(Loader(clips_val, 4, shuffle=False)))
        logits, _ = tr.sample_panoptic_clip(
            batch, jax.random.key(7), num_inference_steps=10,
            repeat_noise=True, pose_warp=pose_warp,
            refine_strength=0.4, warp_blend=0.5)
        b = np.asarray(batch["image"]).shape[0]
        h, w = np.asarray(batch["semseg"]).shape[2:4]
        lg = jax.image.resize(
            jnp.asarray(logits), (logits.shape[0], h, w,
                                  logits.shape[-1]), "linear")
        cleaned, _ = panoptic_post_process(
            lg, mask_th=tr.mask_th, count_th=tr.count_th,
            overlap_th=tr.overlap_th, ignore_label=0)
        cleaned = np.asarray(cleaned).reshape(b, CLIP_T, h, w)
        scores = []
        for bi in range(b):
            pred = [np.maximum(cleaned[bi, t], 0)
                    for t in range(CLIP_T)]
            zeros = [np.zeros_like(p) for p in pred]
            gt = [np.asarray(batch["semseg"])[bi, t]
                  for t in range(CLIP_T)]
            scores.append(evaluate_dvpq(
                pred, zeros, gt, zeros, eval_frames=2, num_cat=33,
                num_eval_cat=32, things_split=8)["pq"])
        return float(np.mean(scores))

    dvpq_plain = clip_dvpq(False)
    dvpq_warp = clip_dvpq(True)
    print(f"[pose] clip DVPQ(eval_frames=2): per-frame {dvpq_plain:.2f}"
          f" vs pose-warped {dvpq_warp:.2f}", flush=True)

    gates = {
        "dvpq_improves": dvpq_bf16 > dvpq_step0,
        "int8_within_noise": abs(dvpq_int8 - dvpq_bf16) <= max(
            2.0, 0.1 * dvpq_bf16),
        "pose_not_worse": dvpq_warp >= dvpq_plain - 1.0,
    }
    print(json.dumps({
        "metric": "trained_model_gate",
        "recon_miou_stage1": round(miou, 2),
        "dvpq_step0": round(dvpq_step0, 2),
        "dvpq_bf16": round(dvpq_bf16, 2),
        "dvpq_int8": round(dvpq_int8, 2),
        "dvpq_clip_plain": round(dvpq_plain, 2),
        "dvpq_clip_warp": round(dvpq_warp, 2),
        "gates": gates,
        "all_pass": all(gates.values()),
        "steps": {"ae": steps_ae, "ldm": steps_ldm, "pose": steps_pose},
        "wall_s": round(time.time() - t_all, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
