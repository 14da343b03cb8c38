"""ClipDataset video batching + COCO panoptic dataset on a generated mini
COCO tree.
"""

import json
import os

import numpy as np
from PIL import Image

from ldmseg_tpu.data.video import ClipDataset, flatten_clip_batch
from ldmseg_tpu.data import SyntheticDVPS, Loader
from ldmseg_tpu.data.coco import CocoPanoptic, rgb_to_id


def test_clip_dataset():
    base = SyntheticDVPS(length=24, size=(48, 160), frames_per_scene=8)
    clips = ClipDataset(base, clip_len=5, stride=2)
    assert len(clips) == 3 * 2  # 3 scenes, frames 0-4 and 2-6
    c = clips[0]
    assert c["image"].shape == (5, 48, 160, 3)
    scenes = {m["scene"] for m in c["meta"]}
    assert len(scenes) == 1  # one scene per clip
    frames = [m["frame"] for m in c["meta"]]
    assert frames == sorted(frames)

    ld = Loader(clips, batch_size=2, shuffle=False)
    batch = next(iter(ld))
    assert batch["image"].shape == (2, 5, 48, 160, 3)
    flat = flatten_clip_batch(batch)
    assert flat["image"].shape == (10, 48, 160, 3)
    assert len(flat["meta"]) == 10


def _make_coco_tree(root):
    os.makedirs(os.path.join(root, "train2017"), exist_ok=True)
    os.makedirs(os.path.join(root, "panoptic_train2017"), exist_ok=True)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    rng = np.random.RandomState(0)
    annotations = []
    for i in range(3):
        img = rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "train2017", f"{i:012d}.jpg"))
        pan = np.zeros((64, 96, 3), dtype=np.uint8)
        # two segments with ids 7 and 300 (300 = 44 + 1*256)
        pan[:32, :, 0] = 7
        pan[32:, :, 0] = 44
        pan[32:, :, 1] = 1
        Image.fromarray(pan).save(
            os.path.join(root, "panoptic_train2017", f"{i:012d}.png"))
        annotations.append({
            "image_id": i,
            "file_name": f"{i:012d}.png",
            "segments_info": [
                {"id": 7, "category_id": 1, "iscrowd": 0},
                {"id": 44 + 256, "category_id": 2, "iscrowd": 0},
            ],
        })
    with open(os.path.join(root, "annotations",
                           "panoptic_train2017.json"), "w") as f:
        json.dump({"annotations": annotations, "categories": [
            {"id": 1, "name": "a", "isthing": 1},
            {"id": 2, "name": "b", "isthing": 0}]}, f)
    with open(os.path.join(root, "annotations",
                           "captions_train2017.json"), "w") as f:
        json.dump({"annotations": [
            {"image_id": 0, "caption": "a test scene"}]}, f)


def test_rgb_to_id():
    arr = np.array([[[44, 1, 0]]], dtype=np.uint8)
    assert rgb_to_id(arr)[0, 0] == 44 + 256


def test_coco_dataset(tmp_path):
    _make_coco_tree(tmp_path)
    ds = CocoPanoptic(prefix=str(tmp_path), split="train", size=(64, 96),
                      num_classes=16, caption_dropout=0.0)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (64, 96, 3)
    assert s["image_semseg"].shape == (64, 96, 7)
    # two segments + ignore
    ids = set(np.unique(s["semseg"]))
    assert len(ids - {0}) == 2
    assert s["semseg"].max() < 16
    assert s["text"] == "a test scene"
    # deterministic
    s2 = ds[0]
    np.testing.assert_array_equal(s["semseg"], s2["semseg"])
