"""Video clip batching.

The reference treats video *outside* the model: per-frame inference +
DVPQ window concatenation (SURVEY §5), with frame-consistent noise via
``repeat_noise`` (trainers_ldm_cond.py:1085-1098) and the per-scene
``pop_gt`` colorization. The TPU build makes clips first-class: a
:class:`ClipDataset` groups a frame dataset by scene and yields fixed-T
clips whose frames stack on a leading axis — sharded over the batch/data
mesh axis like any other batch dim.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .collate import STACK_KEYS


class ClipDataset:
    """Wrap a frame dataset (KittiDVPS / SyntheticDVPS) into T-frame clips.

    Requires the base dataset to expose ``scene_frame(idx)`` or samples
    with ``meta['scene']/meta['frame']``. Clips are consecutive frames of
    one scene with stride ``stride``.
    """

    def __init__(self, base, clip_len: int = 5, stride: int = 1):
        self.base = base
        self.clip_len = clip_len
        scenes: dict = defaultdict(list)
        for i in range(len(base)):
            if hasattr(base, "scene_frame"):
                scene, frame = base.scene_frame(i)
            else:
                meta = base[i]["meta"]
                scene, frame = meta["scene"], meta["frame"]
            scenes[scene].append((frame, i))
        self.clips = []
        for scene, frames in scenes.items():
            frames.sort()
            idxs = [i for _, i in frames]
            for s in range(0, len(idxs) - clip_len + 1, stride):
                self.clips.append(idxs[s:s + clip_len])

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, idx: int, epoch: int = 0) -> dict:
        samples = [self.base.__getitem__(i, epoch=epoch)
                   for i in self.clips[idx]]
        out: dict = {}
        for k in STACK_KEYS:
            if k in samples[0]:
                out[k] = np.stack([s[k] for s in samples])  # [T, ...]
        out["meta"] = [s["meta"] for s in samples]
        out["text"] = samples[0].get("text", "")
        return out


def flatten_clip_batch(batch: dict) -> dict:
    """[B, T, ...] -> [B*T, ...] so frames ride the data axis; metas
    flatten likewise."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 2:
            out[k] = v.reshape((-1,) + v.shape[2:])
        elif k == "meta":
            out[k] = [m for clip in v for m in clip]
        else:
            out[k] = v
    return out
