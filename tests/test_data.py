"""Data pipeline tests: synthetic dataset schema, loader determinism and
sharding, collation, KITTI file-layout parsing on a generated mini tree,
remap strategies, mask generator.
"""

import os

import numpy as np
from PIL import Image

from ldmseg_tpu.data import (
    SyntheticDVPS, KittiDVPS, CityscapesDVPS, Loader, collate,
    MaskingGenerator)
from ldmseg_tpu.data.remap import (
    remap_contiguous, remap_random, remap_per_scene)
from ldmseg_tpu.ops.bits import decode_bits_np


def test_synthetic_schema_and_bits_roundtrip():
    ds = SyntheticDVPS(length=4, size=(96, 320), num_classes=20)
    s = ds[0]
    assert s["image"].shape == (96, 320, 3)
    assert s["image_semseg"].shape == (96, 320, 10)
    assert s["semseg"].shape == (96, 320)
    # bits decode back to ids (non-ignore pixels)
    sem = decode_bits_np(2.0 * s["image_semseg"][..., :5] - 1.0)
    valid = s["semseg"] != 0
    np.testing.assert_array_equal(sem[valid], s["semseg"][valid])
    ins = decode_bits_np(2.0 * s["image_semseg"][..., 5:] - 1.0,
                         invalid_to_zero=False)
    np.testing.assert_array_equal(ins, s["instance"])


def test_synthetic_determinism_and_video():
    ds = SyntheticDVPS(length=16, size=(48, 160), frames_per_scene=8)
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["semseg"], b["semseg"])
    # same scene, different frames -> same id space, moving blobs
    f0, f1 = ds[0], ds[1]
    assert f0["meta"]["scene"] == f1["meta"]["scene"]
    assert f0["meta"]["frame"] != f1["meta"]["frame"]


def test_loader_batches_and_sharding():
    ds = SyntheticDVPS(length=32, size=(48, 160))
    ld = Loader(ds, batch_size=4, num_threads=4, seed=1)
    batches = list(ld.epoch(0))
    assert len(batches) == 8
    assert batches[0]["image"].shape == (4, 48, 160, 3)
    assert len(batches[0]["meta"]) == 4
    # deterministic given epoch
    again = list(Loader(ds, batch_size=4, num_threads=2, seed=1).epoch(0))
    np.testing.assert_array_equal(batches[0]["semseg"], again[0]["semseg"])
    # different epoch -> different order
    other = list(Loader(ds, batch_size=4, num_threads=2, seed=1).epoch(1))
    assert not np.array_equal(batches[0]["semseg"], other[0]["semseg"])
    # sharding covers disjoint halves of each epoch
    sh0 = Loader(ds, batch_size=4, seed=1, shard_id=0, num_shards=2)
    sh1 = Loader(ds, batch_size=4, seed=1, shard_id=1, num_shards=2)
    ids0 = {m["image_id"] for b in sh0.epoch(0) for m in b["meta"]}
    ids1 = {m["image_id"] for b in sh1.epoch(0) for m in b["meta"]}
    assert len(ids0) == 16 and len(ids1) == 16
    assert not ids0 & ids1


def _write_kitti_tree(root, n_scenes=2, n_frames=3, hw=(64, 128)):
    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    h, w = hw
    for s in range(n_scenes):
        for f in range(n_frames):
            base = f"{s:06d}_{f:06d}"
            Image.fromarray(
                rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
                os.path.join(d, f"{base}_leftImg8bit.png"))
            Image.fromarray(
                rng.randint(0, 19, (h, w)).astype(np.uint8)).save(
                os.path.join(d, f"{base}_gtFine_class.png"))
            Image.fromarray(
                rng.randint(0, 10, (h, w)).astype(np.uint8)).save(
                os.path.join(d, f"{base}_gtFine_instance.png"))
            Image.fromarray(
                rng.randint(1, 5000, (h, w)).astype(np.uint16)).save(
                os.path.join(d, f"{base}_depth_707.0912.png"))


def test_kitti_parsing_and_sample(tmp_path):
    _write_kitti_tree(tmp_path)
    ds = KittiDVPS(prefix=str(tmp_path), split="train", size=(64, 128))
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (64, 128, 3)
    assert s["image_semseg"].shape == (64, 128, 10)
    assert s["semseg"].max() < 30
    assert s["meta"]["focal"] == 707.0912
    assert s["meta"]["image_id"] == 0
    # mask zeros where raw class == 0
    assert np.all(s["mask"][s["meta"]["gt_cat"] == 0] == 0)


def test_kitti_per_scene_remap_consistency(tmp_path):
    _write_kitti_tree(tmp_path)
    ds = KittiDVPS(prefix=str(tmp_path), split="train", size=(64, 128),
                   remap_mode="per_scene")
    s0, s1 = ds[0], ds[1]  # same scene, consecutive frames
    # raw id -> remapped id must agree across frames
    raw0, rem0 = s0["meta"]["gt_cat"], s0["semseg"]
    raw1, rem1 = s1["meta"]["gt_cat"], s1["semseg"]
    m0 = {int(r): int(v) for r, v in zip(raw0.flat, rem0.flat) if r != 0}
    m1 = {int(r): int(v) for r, v in zip(raw1.flat, rem1.flat) if r != 0}
    shared = set(m0) & set(m1)
    assert shared
    assert all(m0[k] == m1[k] for k in shared)


def _write_cityscapes_tree(root, hw=(64, 128)):
    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    h, w = hw
    for s in range(2):
        for f in range(2):
            base = f"{s:06d}_{f:06d}_x_y"
            Image.fromarray(
                rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
                os.path.join(d, f"{base}_leftImg8bit.png"))
            Image.fromarray(
                rng.randint(0, 60, (h, w)).astype(np.uint16)).save(
                os.path.join(d, f"{base}_instanceTrainIds.png"))
            Image.fromarray(
                rng.randint(1, 5000, (h, w)).astype(np.uint16)).save(
                os.path.join(d, f"{base}_depth.png"))


def test_cityscapes_16bit_sample(tmp_path):
    _write_cityscapes_tree(tmp_path)
    ds = CityscapesDVPS(prefix=str(tmp_path), split="train", size=(64, 128))
    assert len(ds) == 4
    s = ds[0]
    assert s["image_semseg"].shape == (64, 128, 16)
    assert s["semseg"].max() < 128
    # decode round-trip on non-ignore pixels
    dec = decode_bits_np(2.0 * s["image_semseg"] - 1.0,
                         invalid_to_zero=False)
    valid = s["semseg"] != 127
    np.testing.assert_array_equal(dec[valid], s["semseg"][valid])


def test_remap_strategies():
    rng = np.random.default_rng(0)
    labels = np.array([[0, 5, 5], [9, 9, 200]], dtype=np.int32)
    out, mapping = remap_contiguous(labels, 0)
    assert out.max() == 3 and mapping[0] == 0

    out, mapping = remap_random(labels, num_classes=8, ignore_label=0,
                                rng=rng, min_pixels=2)
    # 200 occurs once -> sent to top id 7
    assert mapping[200] == 7
    assert set(np.unique(out)) <= set(range(8))
    # ignore stays ignore
    assert out[0, 0] == 0

    table = {}
    a = remap_per_scene(np.array([[7, 8]]), table, 32, 0)
    b = remap_per_scene(np.array([[8, 7]]), table, 32, 0)
    assert a[0, 0] == b[0, 1] and a[0, 1] == b[0, 0]


def test_mask_generator_modes():
    rng = np.random.default_rng(0)
    g = MaskingGenerator((32, 32), mode="random_local")
    m = g(t=0.3, rng=rng)
    assert m.shape == (32, 32)
    frac = m.mean()
    assert 0.2 < frac < 0.4
    assert g(t=0.0, rng=rng).sum() == 0

    g = MaskingGenerator((32, 32), num_masking_patches=256,
                         mode="random_global")
    m = g(rng=np.random.default_rng(1))
    assert 128 <= m.sum() <= 300  # block process reaches ~target count


def test_train_augmentation_flip_and_crop(tmp_path):
    """Train-time augmentation (reference get_train_transforms: hflip
    p=0.5 + CropResize, dataset_base.py:17-33, pil_transforms.py:43,:99):
    flips vary per epoch, all modalities flip together, labels stay
    nearest-interpolated, and crop modes produce square-source crops."""
    _write_kitti_tree(tmp_path, n_scenes=1, n_frames=8)
    ds = KittiDVPS(prefix=str(tmp_path), split="train", size=(64, 128),
                   flip=True, seed=3)
    base = KittiDVPS(prefix=str(tmp_path), split="train", size=(64, 128),
                     flip=False, seed=3)

    flipped = 0
    for idx in range(8):
        s = ds.__getitem__(idx, epoch=0)
        b = base.__getitem__(idx, epoch=0)
        if np.array_equal(s["semseg"], b["semseg"][:, ::-1]):
            flipped += 1
            # every modality flips together
            np.testing.assert_array_equal(s["image"], b["image"][:, ::-1])
            np.testing.assert_array_equal(s["mask"], b["mask"][:, ::-1])
            np.testing.assert_array_equal(
                s["image_semseg"], b["image_semseg"][:, ::-1])
            np.testing.assert_array_equal(
                s["meta"]["gt_cat"], b["meta"]["gt_cat"][:, ::-1])
        else:
            np.testing.assert_array_equal(s["semseg"], b["semseg"])
    assert 0 < flipped < 8  # p=0.5, both outcomes occur

    # augmentation varies per epoch: some sample flips differently
    diff = 0
    for idx in range(8):
        a = ds.__getitem__(idx, epoch=0)
        c = ds.__getitem__(idx, epoch=1)
        if not np.array_equal(a["semseg"], c["semseg"]):
            diff += 1
    assert diff > 0

    # labels remain integer ids (nearest interp) under augmentation
    s = ds.__getitem__(0, epoch=0)
    assert s["semseg"].dtype == np.int32
    assert set(np.unique(s["semseg"])) <= set(range(30))

    # crop modes: random crop varies across epochs; centre is stable;
    # val split never crops/flips
    dsc = KittiDVPS(prefix=str(tmp_path), split="train", size=(64, 64),
                    crop_mode="random", seed=3)
    a = dsc.__getitem__(0, epoch=0)["image"]
    bvals = [dsc.__getitem__(0, epoch=e)["image"] for e in range(1, 6)]
    assert any(not np.array_equal(a, b) for b in bvals)
    dscc = KittiDVPS(prefix=str(tmp_path), split="train", size=(64, 64),
                     crop_mode="centre", seed=3)
    np.testing.assert_array_equal(dscc.__getitem__(0, epoch=0)["image"],
                                  dscc.__getitem__(0, epoch=1)["image"])


def test_val_split_never_augments(tmp_path):
    _write_kitti_tree(tmp_path)
    os.rename(os.path.join(tmp_path, "train"), os.path.join(tmp_path, "val"))
    ds = KittiDVPS(prefix=str(tmp_path), split="val", size=(64, 128),
                   flip=True, crop_mode="random", seed=0)
    assert not ds.flip and ds.crop_mode is None
    a = ds.__getitem__(0, epoch=0)
    b = ds.__getitem__(0, epoch=5)
    np.testing.assert_array_equal(a["image"], b["image"])


def test_kitti_fullres_gt(tmp_path):
    """keep_fullres_gt: meta carries original-resolution remapped GT and
    the model-res maps are its nearest downsample (one shared id table),
    enabling per-image eval restore (trainers_ldm_cond.py:1264-1284)."""
    _write_kitti_tree(tmp_path, hw=(96, 192))
    ds = KittiDVPS(prefix=str(tmp_path), split="train", size=(64, 128),
                   keep_fullres_gt=True)
    s = ds[0]
    assert s["meta"]["gt_sem"].shape == (96, 192)
    assert s["meta"]["gt_inst"].shape == (96, 192)
    assert s["meta"]["im_size"] == (96, 192)
    assert s["semseg"].shape == (64, 128)
    # model-res map is exactly the nearest downsample of the full-res map
    from PIL import Image as PILImage
    down = np.asarray(PILImage.fromarray(
        s["meta"]["gt_sem"], mode="I").resize((128, 64), PILImage.NEAREST))
    np.testing.assert_array_equal(s["semseg"], down)
    # same id space
    assert set(np.unique(s["semseg"])) <= set(np.unique(s["meta"]["gt_sem"]))


def test_make_loader_injects_process_shard(monkeypatch):
    """Trainers build loaders via make_loader, which shards each epoch
    across JAX processes (DistributedSampler equivalent,
    trainers_ldm_cond.py:246-247): disjoint coverage, no overlap."""
    import jax
    from ldmseg_tpu.data import make_loader
    ds = SyntheticDVPS(length=32, size=(48, 160))

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    seen = []
    for pid in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda pid=pid: pid)
        ld = make_loader(ds, 4, seed=1)
        assert (ld.shard_id, ld.num_shards) == (pid, 2)
        seen.append({m["image_id"] for b in ld.epoch(0) for m in b["meta"]})
    assert len(seen[0]) == 16 and len(seen[1]) == 16
    assert not seen[0] & seen[1]

    monkeypatch.setattr(jax, "process_count", lambda: 1)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    ld = make_loader(ds, 4)
    assert ld.num_shards == 1


def test_random_color_map_reference_palette():
    """Seeded palette must match the reference's exact construction
    (np.random.RandomState(20).randint(..., dtype=uint8) — the dtype
    argument changes WHERE the MT19937 stream is consumed, so astype()
    produces a different palette; reference kitti.py:22-27)."""
    from ldmseg_tpu.ops.color import random_color_map
    cmap = random_color_map(20, seed=20)
    assert cmap.dtype == np.uint8 and cmap.shape == (20, 3)
    ref = np.random.RandomState(20).randint(0, 256, (20, 3),
                                            dtype=np.uint8)
    np.testing.assert_array_equal(cmap, ref)
    np.testing.assert_array_equal(cmap[0], [99, 189, 143])
