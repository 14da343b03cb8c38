#!/bin/bash
# Canonical stage-1 VAE run (mirrors tools/scripts/train_ae.sh of the
# reference: batch 8, 90k steps, warmup LR).
python -m ldmseg_tpu.tools.main_ae \
    datasets=kitti \
    data_prefix=${KITTI_DVPS_ROOT:-/data/video_sequence} \
    train_kwargs.batch_size=8 \
    train_kwargs.train_num_steps=90000 \
    optimizer_kwargs.lr=1e-4 \
    lr_scheduler_name=warmup \
    loss_weights.kl=1e-6 \
    "$@"
