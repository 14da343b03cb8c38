"""DVPQ evaluation CLI — file-based, mirroring eval/eval_dvpq.py:153-210.

Reads prediction PNGs (``*cat.png`` / ``*ins.png`` (+ depth)) and the GT
``video_sequence/val`` layout (``*gtFine_class.png`` / ``*_instance.png``
/ ``*depth*.png``), builds k-frame windows, and reports PQ / TPQ / SPQ —
evaluated with the device-vectorized VPQ kernel instead of a host
multiprocessing pool.

Usage:
  python -m ldmseg_tpu.tools.eval_dvpq --pan_dir P --gt_dir G \
      [--depth_dir D] [--eval_frames k] [--depth_thres t]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def _sorted(dirname, predicate):
    names = [os.path.join(dirname, n.name) for n in os.scandir(dirname)
             if predicate(n.name)]
    return sorted(names)


def main(argv=None):
    from ldmseg_tpu.evals import evaluate_dvpq

    ap = argparse.ArgumentParser()
    ap.add_argument("--pan_dir", required=True)
    ap.add_argument("--gt_dir", default="video_sequence/val")
    ap.add_argument("--depth_dir", default="")
    ap.add_argument("--eval_frames", type=int, default=1)
    ap.add_argument("--depth_thres", type=float, default=0.0)
    ap.add_argument("--host", action="store_true",
                    help="use the numpy oracle instead of the device path")
    args = ap.parse_args(argv)

    gt_cat_names = _sorted(args.gt_dir, lambda n: "gtFine_class" in n)
    gt_ins_names = [n.replace("class", "instance") for n in gt_cat_names]
    cat_pred = _sorted(args.pan_dir, lambda n: n.endswith("cat.png"))
    ins_pred = _sorted(args.pan_dir, lambda n: n.endswith("ins.png"))
    assert len(cat_pred) == len(gt_cat_names), (
        f"{len(cat_pred)} predictions vs {len(gt_cat_names)} gt frames")

    load = lambda n: np.asarray(Image.open(n))  # noqa: E731
    pred_cat = [load(n) for n in cat_pred]
    pred_ins = [load(n) for n in ins_pred]
    gt_cat = [load(n) for n in gt_cat_names]
    gt_ins = [load(n) for n in gt_ins_names]

    depth_pred = depth_gt = None
    if args.depth_thres > 0:
        depth_gt = [load(n) for n in
                    _sorted(args.gt_dir, lambda n: "depth" in n)]
        depth_pred = [load(n) for n in
                      _sorted(args.depth_dir, lambda n: True)]

    scores = evaluate_dvpq(
        pred_cat, pred_ins, gt_cat, gt_ins,
        eval_frames=args.eval_frames,
        depth_pred=depth_pred, depth_gt=depth_gt,
        depth_thres=args.depth_thres,
        use_device=not args.host,
    )
    # same 3-number report format as the reference (:206-210)
    print(f"{scores['pq']:.1f} {scores['tpq']:.1f} {scores['spq']:.1f}")
    return scores


if __name__ == "__main__":
    main()
