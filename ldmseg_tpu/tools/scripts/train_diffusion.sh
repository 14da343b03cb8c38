#!/bin/bash
# Canonical stage-2 LDM run (mirrors tools/scripts/train_diffusion.sh:
# batch 32, 90k steps, bf16 (fp16 there), cosine LR, self-conditioning
# with 4 cond channels, max_clamp_snr(2.0) weights, eval thresholds
# mask_th .9 / overlap_th .9 / count_th 512, 50 DDIM steps).
python -m ldmseg_tpu.tools.main_ldm \
    datasets=kitti \
    data_prefix=${KITTI_DVPS_ROOT:-/data/video_sequence} \
    pretrained_model_path=${SD_MODEL_DIR:-} \
    vae_model_kwargs.pretrained_path=${SEG_VAE_CKPT:-} \
    train_kwargs.batch_size=32 \
    train_kwargs.train_num_steps=90000 \
    train_kwargs.weight_dtype=bfloat16 \
    train_kwargs.self_condition=True \
    model_kwargs.cond_channels=4 \
    model_kwargs.in_channels=8 \
    noise_scheduler_kwargs.weight=max_clamp_snr \
    noise_scheduler_kwargs.max_snr=2.0 \
    optimizer_kwargs.lr=1e-4 \
    optimizer_kwargs.weight_decay=0.05 \
    lr_scheduler_name=cosine \
    eval_kwargs.mask_th=0.9 \
    eval_kwargs.overlap_th=0.9 \
    eval_kwargs.count_th=512 \
    sampling_kwargs.num_inference_steps=50 \
    "$@"
