"""File-level DVPS pipeline (BASELINE config 5) + launcher CLI smoke.

The reference's public surface is its launchers; this drives them through
the files exactly like a user would:

  synthetic SemKITTI tree -> tools/predict.py main() (clip mode) ->
  prediction PNG layout -> tools/eval_dvpq.py main() -> DVPQ report ==
  in-memory evaluate_dvpq on the same arrays.

Also executes main_ae.main() / main_ldm.main() end-to-end on the
synthetic preset (2 steps) — previously the only never-called mains.
Reference: eval/eval_dvpq.py:153-210, tools/main_ldm.py:31-240,
tools/main_ae.py:31-120.
"""

import pytest
import os

import numpy as np
from PIL import Image

pytestmark = pytest.mark.slow

HW = (48, 96)  # model size == GT size so prediction/gt frames align

TINY_MODEL = [
    "model_kwargs.block_out_channels=[8,16]",
    "model_kwargs.layers_per_block=1",
    "model_kwargs.attention_head_dim=2",
    "model_kwargs.norm_num_groups=4",
    "vae_model_kwargs.int_channels=16",
    "vae_model_kwargs.out_channels=24",
    "vae_model_kwargs.block_out_channels=[8,8,16,16]",
    "vae_model_kwargs.num_upscalers=2",
    "vae_model_kwargs.upscale_channels=16",
    "vae_model_kwargs.norm_num_groups=8",
    "image_vae_kwargs.block_out_channels=[8,8,16,16]",
    "image_vae_kwargs.groups=8",
    "train_kwargs.self_condition=False",
    "sampling_kwargs.num_inference_steps=2",
]


def _write_kitti_tree(root, scenes=1, frames=4, hw=HW):
    d = os.path.join(root, "val")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for s in range(scenes):
        for f in range(frames):
            stem = f"{s:06d}_{f:06d}"
            rgb = rng.integers(0, 255, hw + (3,), dtype=np.uint8)
            Image.fromarray(rgb).save(
                os.path.join(d, f"{stem}_leftImg8bit.png"))
            cat = rng.integers(1, 11, hw).astype(np.uint8)
            Image.fromarray(cat).save(
                os.path.join(d, f"{stem}_gtFine_class.png"))
            ins = rng.integers(0, 5, hw).astype(np.uint8)
            Image.fromarray(ins).save(
                os.path.join(d, f"{stem}_gtFine_instance.png"))
            dep = rng.integers(256, 5000, hw, dtype=np.uint16)
            Image.fromarray(dep).save(
                os.path.join(d, f"{stem}_depth_707.0912.png"))
    return root


def test_predict_to_eval_dvpq_files(tmp_path):
    from ldmseg_tpu.tools import predict, eval_dvpq
    from ldmseg_tpu.evals import evaluate_dvpq

    root = _write_kitti_tree(str(tmp_path / "data"))
    out = str(tmp_path / "preds")
    written = predict.main([
        "datasets=kitti",
        f"data_prefix={root}",
        f"out_dir={out}",
        "clips=2",
        f"transformation_kwargs.size={HW[0]}",
        f"transformation_kwargs.size_2={HW[1]}",
        "eval_kwargs.batch_size=1",
        *TINY_MODEL,
    ])
    assert written == 4
    files = sorted(os.listdir(out))
    assert sum(f.endswith("_cat.png") for f in files) == 4
    assert sum(f.endswith("_ins.png") for f in files) == 4

    # CLI report over the files (reference eval/eval_dvpq.py:153-210)
    scores = eval_dvpq.main([
        "--pan_dir", out,
        "--gt_dir", os.path.join(root, "val"),
        "--eval_frames", "2",
    ])
    for k in ("pq", "tpq", "spq"):
        assert np.isfinite(scores[k])

    # the report must equal the in-memory evaluation of the same arrays
    load = lambda n: np.asarray(Image.open(n))  # noqa: E731
    gt_dir = os.path.join(root, "val")
    pred_cat = [load(os.path.join(out, f)) for f in files
                if f.endswith("_cat.png")]
    pred_ins = [load(os.path.join(out, f)) for f in files
                if f.endswith("_ins.png")]
    gt_names = sorted(n for n in os.listdir(gt_dir)
                      if "gtFine_class" in n)
    gt_cat = [load(os.path.join(gt_dir, n)) for n in gt_names]
    gt_ins = [load(os.path.join(gt_dir,
                                n.replace("class", "instance")))
              for n in gt_names]
    want = evaluate_dvpq(pred_cat, pred_ins, gt_cat, gt_ins,
                         eval_frames=2)
    for k in ("pq", "tpq", "spq"):
        np.testing.assert_allclose(scores[k], want[k], rtol=1e-9,
                                   err_msg=k)


def test_main_ae_cli_smoke(tmp_path):
    from ldmseg_tpu.tools import main_ae
    main_ae.main([
        "datasets=synthetic",
        f"output_dir={tmp_path}",
        "run_idx=0",
        "transformation_kwargs.size=32",
        "transformation_kwargs.size_2=64",
        "vae_model_kwargs.int_channels=16",
        "vae_model_kwargs.block_out_channels=[8,8,16,16]",
        "vae_model_kwargs.num_upscalers=2",
        "vae_model_kwargs.upscale_channels=16",
        "vae_model_kwargs.norm_num_groups=8",
        "train_kwargs.batch_size=8",
        "train_kwargs.train_num_steps=2",
        "eval_first=False",
    ])
    run = os.path.join(str(tmp_path), "run_0")
    assert os.path.isdir(run)


def test_main_ldm_cli_smoke(tmp_path):
    from ldmseg_tpu.tools import main_ldm
    main_ldm.main([
        "datasets=synthetic",
        f"output_dir={tmp_path}",
        "run_idx=0",
        "transformation_kwargs.size=32",
        "transformation_kwargs.size_2=64",
        "train_kwargs.batch_size=8",
        "train_kwargs.train_num_steps=2",
        "eval_kwargs.batch_size=8",
        "eval_first=False",
        *TINY_MODEL,
    ])
    run = os.path.join(str(tmp_path), "run_0")
    assert os.path.isdir(run)
