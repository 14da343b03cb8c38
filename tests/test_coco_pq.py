"""COCO-style PQ (panopticapi-equivalent) tests."""

import numpy as np

from ldmseg_tpu.evals.coco_pq import pq_compute_images


def _seg(idv, cat, crowd=0):
    return {"id": idv, "category_id": cat, "iscrowd": crowd}


def test_perfect_match():
    gt = np.zeros((16, 16), np.int64)
    gt[:8] = 1
    gt[8:] = 2
    pairs = [(gt.copy(), [_seg(1, 5), _seg(2, 7)],
              gt, [_seg(1, 5), _seg(2, 7)])]
    res = pq_compute_images(pairs)
    assert res["pq"] == 100.0 and res["n"] == 2


def test_category_mismatch_is_fn_fp():
    gt = np.zeros((16, 16), np.int64)
    gt[:] = 1
    pairs = [(gt.copy(), [_seg(1, 9)], gt, [_seg(1, 5)])]
    res = pq_compute_images(pairs)
    assert res["per_class"][5]["fn"] == 1
    assert res["per_class"][9]["fp"] == 1
    assert res["pq"] == 0.0


def test_void_discounted_union():
    # prediction covers the whole image; GT half void (0) half seg ->
    # union discounts void overlap -> IoU = 1 -> TP
    gt = np.zeros((16, 16), np.int64)
    gt[:8] = 3
    pred = np.full((16, 16), 7, np.int64)
    pairs = [(pred, [_seg(7, 5)], gt, [_seg(3, 5)])]
    res = pq_compute_images(pairs)
    assert res["per_class"][5]["tp"] == 1
    assert res["pq"] == 100.0


def test_crowd_not_matched_not_fn():
    gt = np.zeros((16, 16), np.int64)
    gt[:] = 4
    pred = np.zeros((16, 16), np.int64)  # predicts only void
    pairs = [(pred, [], gt, [_seg(4, 5, crowd=1)])]
    res = pq_compute_images(pairs)
    # crowd GT neither matched nor counted as FN
    assert res["n"] == 0 and res["pq"] == 0.0


def test_class_agnostic_mode():
    gt = np.zeros((16, 16), np.int64)
    gt[:8] = 1
    gt[8:] = 2
    pairs = [(gt.copy(), [_seg(1, 9), _seg(2, 11)],
              gt, [_seg(1, 5), _seg(2, 7)])]
    res = pq_compute_images(pairs, class_agnostic=True)
    assert res["pq"] == 100.0
