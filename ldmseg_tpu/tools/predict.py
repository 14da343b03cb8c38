"""Batch panoptic inference CLI — produces the prediction layout that
``tools/eval_dvpq.py`` (and the reference's eval/eval_dvpq.py:153-210)
consumes: per frame ``<stem>_cat.png`` / ``<stem>_ins.png`` (+ passthrough
depth when the dataset provides it).

Pipeline per batch: RGB -> frozen AutoencoderKL encode -> 50-step DDIM
scan -> seg-VAE decode -> fixed-shape panoptic post-process. The panoptic
id map splits into (cat, ins):

  * with a 19-class semantic head (``--semantic-from-bits``, dual-bit
    KITTI encoding): cat = id // 100 convention of the colorized target;
  * default (class-agnostic instances, the LDMSeg formulation): every
    kept segment is a thing instance; cat is constant 0 unless a
    semantic source is available. This matches what the class-agnostic
    PQ path evaluates (panoptic_evaluation_agnostic).

Usage:
  python -m ldmseg_tpu.tools.predict datasets=synthetic out_dir=/tmp/preds \
      [data_prefix=...] [checkpoint=...] [sampling_kwargs.num_inference_steps=50]
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image


def main(argv=None):
    import jax
    from ldmseg_tpu.utils.config import (
        load_config, parse_dot_overrides, merge_dicts)
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.models import UNetConfig
    from ldmseg_tpu.data import Loader
    from ldmseg_tpu.ops import panoptic_post_process
    from .main_ae import DATASET_PRESETS, build_datasets

    argv = argv if argv is not None else sys.argv[1:]
    overrides = parse_dot_overrides(argv)
    dataset = overrides.pop("datasets", "synthetic")
    prefix = overrides.pop("data_prefix", None)
    out_dir = overrides.pop("out_dir", "/tmp/ldmseg_preds")
    checkpoint = overrides.pop("checkpoint", None)
    max_batches = overrides.pop("max_batches", None)
    # pose-consistent video prediction: group frames into clips and
    # sample with the pose-warped refinement (stage-3; needs
    # pose_model_kwargs.pretrained_path)
    clip_len = overrides.pop("clips", None)
    # GT-free prediction on unlabeled frames (only *_leftImg8bit.png
    # present) — the deployment mode; synthetic data ignores this
    image_only = bool(overrides.pop("image_only", False))

    cfg = load_config(None)
    cfg = merge_dicts(cfg, DATASET_PRESETS.get(dataset, {}))
    cfg = merge_dicts(cfg, overrides)
    os.makedirs(out_dir, exist_ok=True)

    _, val_ds = build_datasets(
        cfg, prefix, val_kwargs={"image_only": True} if image_only else None)
    if clip_len:
        from ldmseg_tpu.data.video import ClipDataset
        val_ds = ClipDataset(val_ds, clip_len=int(clip_len),
                             stride=int(clip_len))

    unet_config = None
    mk = cfg["model_kwargs"]
    if "block_out_channels" in mk:
        unet_config = UNetConfig(
            in_channels=mk.get("in_channels", 8),
            out_channels=4,
            block_out_channels=tuple(mk["block_out_channels"]),
            layers_per_block=mk.get("layers_per_block", 2),
            cross_attention_dim=mk.get("cross_attention_dim", 768),
            attention_head_dim=mk.get("attention_head_dim", 8),
            norm_num_groups=mk.get("norm_num_groups", 32),
            use_cross_attention=False)
    trainer = TrainerDiffusion(cfg, unet_config=unet_config,
                               val_dataset=val_ds,
                               results_folder=out_dir)
    pk = cfg.get("pose_model_kwargs") or {}
    if clip_len and pk.get("pretrained_path"):
        import orbax.checkpoint as ocp
        from ldmseg_tpu.models import PoseExpNet
        restored = ocp.StandardCheckpointer().restore(
            pk["pretrained_path"])
        nb_ref = int(pk.get("nb_ref_imgs")
                     or int(restored.get("nb_ref", 2)))
        trainer.attach_pose(PoseExpNet(nb_ref_imgs=nb_ref),
                            restored["params"])
    loader = Loader(val_ds, cfg["eval_kwargs"].get("batch_size", 8),
                    shuffle=False, drop_last=False)
    batch0 = next(iter(loader))
    trainer.init_state(batch0)
    if checkpoint:
        trainer.resume(checkpoint)

    import jax.numpy as jnp
    key = jax.random.key(cfg["sampling_kwargs"].get("seed", 0))
    written = 0
    for bi, batch in enumerate(loader.epoch(0)):
        key, sub = jax.random.split(key)
        if clip_len:
            # pose-warped (or repeat-noise) frame-consistent sampling;
            # flatten the clip batch back to frames for the writer
            logits, _ = trainer.sample_panoptic_clip(batch, sub)
            from ldmseg_tpu.data.video import flatten_clip_batch
            batch = flatten_clip_batch(batch)
        else:
            logits, _ = trainer.sample_panoptic(batch, sub)
        # model-res output size from the RGB frames: GT keys may be
        # absent entirely (image_only mode)
        h, w = batch["image"].shape[-3:-1]
        logits = jax.image.resize(
            logits, (logits.shape[0], h, w, logits.shape[-1]), "linear")
        cleaned, _ = panoptic_post_process(
            logits, mask_th=trainer.mask_th, count_th=trainer.count_th,
            overlap_th=trainer.overlap_th,
            ignore_label=trainer.ignore_label,
            valid_mask=jnp.asarray(batch["mask"]))
        cleaned = np.asarray(cleaned)
        for i, meta in enumerate(batch["meta"]):
            stem = f"{meta['image_id']:012d}"
            ins = np.maximum(cleaned[i], 0).astype(np.uint8)
            # class-agnostic: cat 0 everywhere a segment exists
            cat = np.zeros_like(ins)
            Image.fromarray(cat).save(
                os.path.join(out_dir, f"{stem}_cat.png"))
            Image.fromarray(ins).save(
                os.path.join(out_dir, f"{stem}_ins.png"))
            written += 1
        if max_batches is not None and bi + 1 >= int(max_batches):
            break
    print(f"wrote {written} prediction pairs to {out_dir}")
    return written


if __name__ == "__main__":
    main()
