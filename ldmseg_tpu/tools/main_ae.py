"""Stage-1 VAE training entry point.

Mirrors tools/main_ae.py (hydra config compose + mp.spawn + TrainerAE).
TPU-native: no process spawning — one SPMD program over the device mesh
(``jax.distributed.initialize`` handles multi-host when launched per
host).

Usage:
  python -m ldmseg_tpu.tools.main_ae \
      datasets=kitti train_kwargs.batch_size=8 output_dir=/tmp/run \
      [config=path.yaml] [eval_only=True] [data_prefix=/path/to/data]
"""

from __future__ import annotations

import os
import sys


DATASET_PRESETS = {
    # dataset config groups (tools/configs/datasets/*.yaml)
    "kitti": {"train_db_name": "kitti", "val_db_name": "kitti",
              "num_classes": 30, "num_bits": 5, "ignore_label": 0,
              "vae_model_kwargs": {"in_channels": 10, "out_channels": 128}},
    "cityscapes": {"train_db_name": "cityscapes",
                   "val_db_name": "cityscapes", "num_classes": 128,
                   "num_bits": 16, "ignore_label": 127,
                   "vae_model_kwargs": {"in_channels": 16,
                                        "out_channels": 128}},
    "synthetic": {"train_db_name": "synthetic", "val_db_name": "synthetic",
                  "num_classes": 32, "num_bits": 5, "ignore_label": 0,
                  "vae_model_kwargs": {"in_channels": 10,
                                       "out_channels": 32}},
}


def build_datasets(cfg: dict, prefix: str | None,
                   val_kwargs: dict | None = None):
    """``val_kwargs`` extends the val dataset only (e.g.
    ``image_only=True`` for GT-free prediction); synthetic ignores it."""
    from ldmseg_tpu.data import get_dataset
    name = cfg["train_db_name"]
    size = (cfg["transformation_kwargs"]["size"],
            cfg["transformation_kwargs"]["size_2"])
    kwargs = dict(num_bits=cfg["num_bits"],
                  ignore_label=cfg["ignore_label"], size=size)
    if name == "synthetic":
        train = get_dataset("synthetic", length=64, num_classes=20, **kwargs)
        val = get_dataset("synthetic", length=16, num_classes=20, **kwargs)
    else:
        kwargs["num_classes"] = cfg["num_classes"]
        # RGB normalize stats (reference dataset_base.py:19-42:
        # T.Normalize(**normalize_params) when normalize, else identity)
        tk = cfg["transformation_kwargs"]
        kwargs["normalize_params"] = (
            tk.get("normalize_params")
            if tk.get("normalize", True)
            else {"mean": [0.0, 0.0, 0.0], "std": [1.0, 1.0, 1.0]})
        # train-time augmentation (reference get_train_transforms:
        # hflip p=0.5 when transformation_kwargs.flip)
        train = get_dataset(name, prefix=prefix, split="train",
                            flip=cfg["transformation_kwargs"].get(
                                "flip", True), **kwargs)
        val = get_dataset(cfg["val_db_name"], prefix=prefix, split="val",
                          **kwargs, **(val_kwargs or {}))
    return train, val


def main(argv=None):
    from ldmseg_tpu.utils.config import (
        load_config, parse_dot_overrides, prepare_config, merge_dicts)
    from ldmseg_tpu.train.trainer_ae import TrainerAE

    argv = argv if argv is not None else sys.argv[1:]
    overrides = parse_dot_overrides(argv)
    dataset = overrides.pop("datasets", "synthetic")
    config_path = overrides.pop("config", None)
    prefix = overrides.pop("data_prefix", None)
    output_dir = overrides.pop("output_dir", "/tmp/ldmseg_tpu_ae")
    run_idx = overrides.pop("run_idx", -1)

    cfg = load_config(config_path)
    cfg = merge_dicts(cfg, DATASET_PRESETS.get(dataset, {}))
    cfg = merge_dicts(cfg, overrides)
    cfg = prepare_config(cfg, output_dir, run_idx)
    print(f"Run dir: {cfg['output_dir']}")

    train_ds, val_ds = build_datasets(cfg, prefix)
    trainer = TrainerAE(cfg, dataset=train_ds, val_dataset=val_ds,
                        results_folder=cfg["checkpoint_dir"])

    from ldmseg_tpu.data import Loader
    batch = next(iter(Loader(train_ds, cfg["train_kwargs"]["batch_size"],
                             shuffle=False)))
    trainer.init_state(batch)
    trainer.resume()

    if cfg.get("eval_only"):
        print(trainer.compute_miou())
        print(trainer.compute_pq())
        return

    # eval-before-train smoke test (reference trainers_ae.py:398)
    if cfg.get("eval_first", True):
        print("step-0 eval:", trainer.compute_metrics(max_batches=2))

    trainer.train_loop()
    trainer.save()
    print(trainer.compute_miou(max_batches=8))


if __name__ == "__main__":
    main()
