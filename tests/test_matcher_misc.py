"""Hungarian matcher, DVPQ CLI, multihost helpers, metrics sink."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ldmseg_tpu.losses.matcher import hungarian_match
from ldmseg_tpu.utils.metrics_sink import MetricsSink


def test_matcher_recovers_identity():
    """When output channel c IS the mask of class c, the optimal matching
    maps each channel to its own class slot."""
    rng = np.random.RandomState(0)
    tgt = rng.randint(0, 6, (1, 32, 32)).astype(np.int32)
    q = 6
    # logits strongly favoring the true class per pixel
    out = np.full((1, 32, 32, q), -8.0, np.float32)
    for c in range(q):
        out[0][tgt[0] == c, c] = 8.0
    a, ids = hungarian_match(jax.random.key(0), jnp.asarray(out),
                             jnp.asarray(tgt), num_points=512,
                             max_targets=q, ignore_label=0)
    a, ids = np.asarray(a)[0], np.asarray(ids)[0]
    # every assigned query's matched target-slot id equals the query index
    for query, slot in enumerate(a):
        if slot >= 0:
            assert ids[slot] == query


def test_matcher_empty_targets():
    tgt = jnp.zeros((1, 16, 16), jnp.int32)  # only ignore
    out = jnp.zeros((1, 16, 16, 4))
    a, ids = hungarian_match(jax.random.key(0), out, tgt, num_points=64,
                             max_targets=4, ignore_label=0)
    assert np.all(np.asarray(a) == -1)


def test_dvpq_cli(tmp_path):
    from ldmseg_tpu.tools.eval_dvpq import main
    gt_dir = tmp_path / "gt"
    pan_dir = tmp_path / "pred"
    os.makedirs(gt_dir)
    os.makedirs(pan_dir)
    rng = np.random.RandomState(0)
    for f in range(3):
        cat = rng.randint(0, 5, (32, 32)).astype(np.uint8)
        ins = np.zeros((32, 32), np.uint8)
        Image.fromarray(cat).save(gt_dir / f"{f:06d}_gtFine_class.png")
        Image.fromarray(ins).save(gt_dir / f"{f:06d}_gtFine_instance.png")
        Image.fromarray(cat).save(pan_dir / f"{f:06d}_cat.png")
        Image.fromarray(ins).save(pan_dir / f"{f:06d}_ins.png")
    scores = main(["--pan_dir", str(pan_dir), "--gt_dir", str(gt_dir),
                   "--eval_frames", "2", "--host"])
    # perfect predictions -> PQ 100 for every PRESENT class; the report
    # averages over all 19 classes unconditionally (eval_dvpq.py:196-204),
    # so the mean reflects 5 present / 19 total
    per = np.asarray(scores["per_class_pq"])
    present = per > 0
    assert present.sum() == 5
    np.testing.assert_allclose(per[present], 100.0, rtol=1e-6)


def test_multihost_helpers_single_host():
    from ldmseg_tpu.parallel.multihost import (
        initialize_from_env, is_main_process, world_size, all_gather_host)
    info = initialize_from_env()
    assert info["process_count"] == 1
    assert is_main_process() and world_size() == 1
    assert all_gather_host({"x": 1}) == [{"x": 1}]


def test_metrics_sink(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    sink = MetricsSink(path)
    sink.log(1, loss=0.5, lr=1e-4)
    sink.log(2, loss=0.4)
    sink.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2


def test_kitti_asymmetric_bits(tmp_path):
    from tests.test_data import _write_kitti_tree
    from ldmseg_tpu.data import KittiDVPS
    _write_kitti_tree(tmp_path)
    ds = KittiDVPS(prefix=str(tmp_path), split="train", size=(64, 128),
                   num_bits=5, num_bits_instance=6)
    s = ds[0]
    assert s["image_semseg"].shape == (64, 128, 11)  # 5 + 6 channels
