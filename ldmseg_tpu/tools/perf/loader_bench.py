"""Host input-pipeline throughput probe (VERDICT r4 item 3).

Answers "can the host feed the device rate?": synthesizes a KITTI-DVPS
``video_sequence`` tree at realistic camera resolution (375x1242 PNGs),
then measures end-to-end Loader samples/s — PNG decode, per-modality
resize to 192x640, per-scene deterministic remap, native analog-bits
encode (data/native/bitcodec.cpp), collate to fixed shapes — through
the threaded Loader (the torch ``DataLoader(num_workers=8,
pin_memory=True)`` equivalent, reference trainers_ldm_cond.py:246-258).

Usage (no device needed):
    python -m ldmseg_tpu.tools.perf.loader_bench [--frames 256]
"""

import argparse
import json
import os
import tempfile
import time

import numpy as np


def synthesize_tree(root: str, n_scenes: int, n_frames: int,
                    hw=(375, 1242)) -> None:
    from PIL import Image
    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    h, w = hw
    # realistic content: piecewise-constant label maps (PNG run-length
    # behaviour) over photographic-noise RGB
    for s in range(n_scenes):
        for f in range(n_frames):
            base = f"{s:06d}_{f:06d}"
            rgb = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(rgb).save(
                os.path.join(d, f"{base}_leftImg8bit.png"))
            blocks = rng.randint(0, 19, (h // 25 + 1, w // 25 + 1))
            sem = np.kron(blocks, np.ones((25, 25), np.uint8))[:h, :w]
            Image.fromarray(sem.astype(np.uint8)).save(
                os.path.join(d, f"{base}_gtFine_class.png"))
            inst = np.kron(rng.randint(0, 12, blocks.shape),
                           np.ones((25, 25), np.uint8))[:h, :w]
            Image.fromarray(inst.astype(np.uint8)).save(
                os.path.join(d, f"{base}_gtFine_instance.png"))
            depth = rng.randint(1, 20000, (h, w)).astype(np.uint16)
            Image.fromarray(depth).save(
                os.path.join(d, f"{base}_depth_707.0912.png"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    from ldmseg_tpu.data import get_dataset, Loader

    tmp = tempfile.mkdtemp(prefix="ldmseg_loader_bench_")
    per_scene = max(1, args.frames // args.scenes)
    t0 = time.perf_counter()
    synthesize_tree(tmp, args.scenes, per_scene)
    print(f"synthesized {args.scenes * per_scene} frames at 375x1242 in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    ds = get_dataset("kitti", prefix=tmp, split="train", num_bits=5,
                     ignore_label=0, num_classes=30, size=(192, 640))
    loader = Loader(ds, args.batch, shuffle=True,
                    num_threads=args.threads, seed=0)

    # warm epoch (page cache, codec init), then timed epoch
    n = 0
    for b in loader.epoch(0):
        n += b["image"].shape[0]
    t0 = time.perf_counter()
    n = 0
    for b in loader.epoch(1):
        n += b["image"].shape[0]
    dt = time.perf_counter() - t0
    sps = n / dt

    # single-thread decode cost for the per-sample breakdown
    t0 = time.perf_counter()
    for i in range(16):
        ds[i]
    per_sample_ms = (time.perf_counter() - t0) / 16 * 1e3

    print(json.dumps({
        "metric": "host_loader_samples_per_sec",
        "value": round(sps, 1),
        "unit": "samples/s",
        "threads": args.threads,
        "batch": args.batch,
        "frames": n,
        "per_sample_decode_ms_1thread": round(per_sample_ms, 1),
        "source_res": "375x1242", "target_res": "192x640",
    }), flush=True)
    if not args.keep:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
