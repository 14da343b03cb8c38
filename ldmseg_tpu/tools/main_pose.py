"""Pose-net ("pose-VAE") training entry point — stage 3 of the fork's
plan (reference README.md:3-5: "implement a pose-VAE"; the reference only
exercises PoseExpNet in Pose.ipynb cells 13-19 and has no trainer/CLI).

Trains :class:`PoseExpNet` on video clips from the DVPS datasets with the
SfMLearner photometric objective, checkpoints with orbax, and hands the
result to stage 2 via ``pose_model_kwargs.pretrained_path`` in main_ldm
(TrainerDiffusion.attach_pose -> temporal-consistency training +
pose-warped clip sampling).

Usage:
  python -m ldmseg_tpu.tools.main_pose \
      datasets=kitti train_kwargs.batch_size=4 clip_len=3 \
      output_dir=/tmp/pose [data_prefix=/path/to/data]
"""

from __future__ import annotations

import sys

from .main_ae import DATASET_PRESETS, build_datasets


def main(argv=None):
    from ldmseg_tpu.utils.config import (
        load_config, parse_dot_overrides, prepare_config, merge_dicts)
    from ldmseg_tpu.train.trainer_pose import TrainerPose
    from ldmseg_tpu.data.video import ClipDataset

    argv = argv if argv is not None else sys.argv[1:]
    overrides = parse_dot_overrides(argv)
    dataset = overrides.pop("datasets", "synthetic")
    config_path = overrides.pop("config", None)
    prefix = overrides.pop("data_prefix", None)
    output_dir = overrides.pop("output_dir", "/tmp/ldmseg_tpu_pose")
    run_idx = overrides.pop("run_idx", -1)
    clip_len = int(overrides.pop("clip_len", 3))

    cfg = load_config(config_path)
    cfg = merge_dicts(cfg, DATASET_PRESETS.get(dataset, {}))
    cfg = merge_dicts(cfg, overrides)
    cfg = prepare_config(cfg, output_dir, run_idx)
    print(f"Run dir: {cfg['output_dir']}")

    train_ds, _ = build_datasets(cfg, prefix)
    clips = ClipDataset(train_ds, clip_len=clip_len)
    print(f"{len(clips)} clips of {clip_len} frames")

    trainer = TrainerPose(cfg, dataset=clips,
                          results_folder=cfg["checkpoint_dir"],
                          nb_ref_imgs=clip_len - 1)
    trainer.train_loop()
    path = trainer.save(step=trainer.train_num_steps)
    print(f"Pose checkpoint: {path}")
    print("Hand off to stage 2 with "
          f"pose_model_kwargs.pretrained_path={path} "
          f"pose_model_kwargs.nb_ref_imgs={clip_len - 1}")


if __name__ == "__main__":
    main()
