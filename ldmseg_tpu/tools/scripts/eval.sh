#!/bin/bash
# Eval-only run (mirrors tools/scripts/eval.sh): restores the latest
# checkpoint and computes PQ on the val split.
python -m ldmseg_tpu.tools.main_ldm \
    datasets=kitti \
    data_prefix=${KITTI_DVPS_ROOT:-/data/video_sequence} \
    eval_only=True \
    eval_kwargs.mask_th=0.9 \
    eval_kwargs.overlap_th=0.9 \
    eval_kwargs.count_th=512 \
    "$@"
