"""RGB-only (GT-free) inference — the deployment mode.

The reference sampler consumes ONLY RGB latents
(trainers_ldm_cond.py:1234-1242); a trained segmentation model must run
on unlabeled video. Covers: KittiDVPS ``image_only`` indexing,
``sample_panoptic`` from a bare ``{"image"}`` batch, and the predict CLI
end-to-end over a directory containing only ``*_leftImg8bit.png``.
"""

import os

import numpy as np
import jax
from PIL import Image

from ldmseg_tpu.data import SyntheticDVPS, Loader
from ldmseg_tpu.models import UNetConfig
from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

SMALL = merge_dicts(DEFAULT_CONFIG, {
    "vae_model_kwargs": {
        "in_channels": 10, "int_channels": 16, "out_channels": 24,
        "block_out_channels": [8, 8, 16, 16], "num_upscalers": 2,
        "upscale_channels": 16, "norm_num_groups": 8,
    },
    "train_kwargs": {"batch_size": 4, "train_num_steps": 2,
                     "self_condition": False},
    "sampling_kwargs": {"num_inference_steps": 2},
    "ignore_label": 0,
})

TINY_UNET = UNetConfig(
    in_channels=8, out_channels=4, block_out_channels=(8, 8, 16, 16),
    layers_per_block=1, cross_attention_dim=16, attention_head_dim=2,
    norm_num_groups=4, use_cross_attention=False)


def _write_rgb_tree(root, n=4, hw=(48, 96), with_depth=False):
    d = os.path.join(root, "val")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, hw + (3,), dtype=np.uint8)
        Image.fromarray(arr).save(
            os.path.join(d, f"000000_{i:06d}_leftImg8bit.png"))
        if with_depth:
            dep = rng.integers(256, 5000, hw, dtype=np.uint16)
            Image.fromarray(dep).save(
                os.path.join(d, f"000000_{i:06d}_depth_707.0912.png"))
    return root


def test_kitti_image_only_index_and_sample(tmp_path):
    from ldmseg_tpu.data.kitti import KittiDVPS
    _write_rgb_tree(str(tmp_path))
    ds = KittiDVPS(prefix=str(tmp_path), split="val", size=(32, 64),
                   image_only=True)
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (32, 64, 3)
    assert "semseg" not in s and "image_semseg" not in s
    assert s["mask"].all() and s["depth"].shape == (32, 64)
    assert s["meta"]["image_id"] == 0 and s["meta"]["focal"] is None
    # the default (GT-required) indexer must reject the same tree
    assert len(KittiDVPS(prefix=str(tmp_path), split="val",
                         size=(32, 64))) == 0


def test_kitti_image_only_keeps_depth_focal(tmp_path):
    from ldmseg_tpu.data.kitti import KittiDVPS
    _write_rgb_tree(str(tmp_path), with_depth=True)
    ds = KittiDVPS(prefix=str(tmp_path), split="val", size=(32, 64),
                   image_only=True)
    s = ds[1]
    assert s["depth"].max() > 0
    assert abs(s["meta"]["focal"] - 707.0912) < 1e-6


def test_sample_panoptic_needs_only_rgb(tmp_path):
    ds = SyntheticDVPS(length=8, size=(32, 64), num_classes=20)
    tr = TrainerDiffusion(SMALL, unet_config=TINY_UNET, dataset=ds,
                          results_folder=str(tmp_path))
    batch = next(iter(Loader(ds, 4, shuffle=False)))
    tr.init_state(batch)
    # strip EVERY GT key: inference sees bare frames
    logits, x0 = tr.sample_panoptic({"image": batch["image"]},
                                    jax.random.key(0),
                                    num_inference_steps=2)
    assert logits.shape == (4, 32, 64, 24)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_init_state_from_image_only_batch(tmp_path):
    ds = SyntheticDVPS(length=8, size=(32, 64), num_classes=20)
    tr = TrainerDiffusion(SMALL, unet_config=TINY_UNET, dataset=ds,
                          results_folder=str(tmp_path))
    batch = next(iter(Loader(ds, 4, shuffle=False)))
    tr.init_state({"image": batch["image"]})  # no image_semseg
    # seg-VAE input width fell back to its configured in_channels
    logits, _ = tr.sample_panoptic({"image": batch["image"]},
                                   jax.random.key(0),
                                   num_inference_steps=2)
    assert logits.shape == (4, 32, 64, 24)


def test_predict_cli_image_only(tmp_path):
    """predict.py over a directory with ONLY *_leftImg8bit.png files."""
    from ldmseg_tpu.tools import predict
    root = _write_rgb_tree(str(tmp_path / "data"))
    out = str(tmp_path / "preds")
    written = predict.main([
        "datasets=kitti",
        f"data_prefix={root}",
        f"out_dir={out}",
        "image_only=1",
        "train_kwargs.self_condition=False",
        "transformation_kwargs.size=32",
        "transformation_kwargs.size_2=64",
        "vae_model_kwargs.int_channels=16",
        "vae_model_kwargs.out_channels=24",
        "vae_model_kwargs.block_out_channels=[8,8,16,16]",
        "vae_model_kwargs.num_upscalers=2",
        "vae_model_kwargs.upscale_channels=16",
        "vae_model_kwargs.norm_num_groups=8",
        "model_kwargs.block_out_channels=[8,8,16,16]",
        "model_kwargs.layers_per_block=1",
        "model_kwargs.attention_head_dim=2",
        "model_kwargs.norm_num_groups=4",
        "eval_kwargs.batch_size=2",
        "sampling_kwargs.num_inference_steps=2",
        "max_batches=1",
    ])
    assert written == 2
    files = sorted(os.listdir(out))
    assert "000000000000_cat.png" in files
    assert "000000000000_ins.png" in files
    ins = np.asarray(Image.open(os.path.join(out, "000000000000_ins.png")))
    assert ins.shape == (32, 64)
