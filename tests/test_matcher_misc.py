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


def test_metrics_sink_none_scalars_and_images(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    sink = MetricsSink(path)
    sink.log(1, pq=10.0, sq=None)  # in-training eval passes optional keys
    sink.log_image(2, "train_panel", str(tmp_path / "panel.jpg"))
    sink.close()
    lines = [json.loads(l) for l in open(path)]
    assert "sq" not in lines[0] and lines[0]["pq"] == 10.0
    assert lines[1]["image"]["name"] == "train_panel"
    assert lines[1]["image"]["ref"].endswith("panel.jpg")


def test_kitti_asymmetric_bits(tmp_path):
    from tests.test_data import _write_kitti_tree
    from ldmseg_tpu.data import KittiDVPS
    _write_kitti_tree(tmp_path)
    ds = KittiDVPS(prefix=str(tmp_path), split="train", size=(64, 128),
                   num_bits=5, num_bits_instance=6)
    s = ds[0]
    assert s["image_semseg"].shape == (64, 128, 11)  # 5 + 6 channels


def test_checkify_guard():
    from ldmseg_tpu.train.debug import checkified, assert_all_finite
    import pytest as _pytest

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = checkified(jax.jit(bad))
    assert np.isfinite(float(f(jnp.asarray(1.0))))
    with _pytest.raises(Exception):
        f(jnp.asarray(-1.0))
    with _pytest.raises(FloatingPointError):
        assert_all_finite({"a": jnp.asarray([1.0, float("nan")])})


def test_dataset_metadata(tmp_path):
    from tests.test_data import _write_kitti_tree
    from ldmseg_tpu.data import KittiDVPS
    from ldmseg_tpu.data.base import THING_IDS
    _write_kitti_tree(tmp_path)
    ds = KittiDVPS(prefix=str(tmp_path), split="train", size=(64, 128))
    assert ds.get_class_names()[13] == "car"
    assert ds.meta_data["thing_dataset_id_to_contiguous_id"][11] == 11
    assert THING_IDS == {11, 12, 13, 14, 15, 16, 17, 18}


def test_remat_unet_matches_no_remat():
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    base = dict(in_channels=8, out_channels=4,
                block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                cross_attention_dim=16, attention_head_dim=2,
                norm_num_groups=4, use_cross_attention=False)
    m0 = UNet2DCondition(config=UNetConfig(**base))
    m1 = UNet2DCondition(
        config=UNetConfig(**base, gradient_checkpointing=True))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 24, 80, 8),
                    jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    p = jax.jit(m0.init)(jax.random.key(0), x, t)
    out0 = m0.apply(p, x, t)
    out1 = m1.apply(p, x, t)  # same params: remat must be numerically id.
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-4, atol=1e-5)
    g0 = jax.grad(lambda pp: m0.apply(pp, x, t).sum())(p)
    g1 = jax.grad(lambda pp: m1.apply(pp, x, t).sum())(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        # remat reassociates float ops; grads agree to ~1e-3
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-3)
    # remat_policy (named jax.checkpoint_policies entry) keeps the same
    # numerics while saving the dot outputs instead of recomputing them
    m2 = UNet2DCondition(config=UNetConfig(
        **base, gradient_checkpointing=True,
        remat_policy="dots_with_no_batch_dims_saveable"))
    out2 = m2.apply(p, x, t)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out2),
                               rtol=1e-4, atol=1e-5)
    g2 = jax.grad(lambda pp: m2.apply(pp, x, t).sum())(p)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-2,
                                   atol=1e-3)
