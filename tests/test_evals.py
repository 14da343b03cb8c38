"""Evaluation metric tests: device VPQ vs the numpy oracle (a direct port
of eval/eval_dvpq.py:25-101), DVPQ windowing + depth masking, mIoU meter,
greedy PQ evaluator sanity.
"""

import numpy as np
import jax.numpy as jnp

from ldmseg_tpu.evals import (
    vpq_eval_np, vpq_eval_device, vpq_stats_to_scores, SemsegMeter,
    PanopticEvaluator, evaluate_dvpq)
from ldmseg_tpu.evals.vpq import MAX_INS


def _random_panoptic(rng, h, w, n_cat=20, n_ins=5, p_void=0.1):
    cat = rng.randint(0, n_cat, size=(h, w))
    cat[rng.rand(h, w) < p_void] = 255
    ins = rng.randint(0, n_ins, size=(h, w))
    ins[cat >= 8] = 0  # stuff has no instances
    return cat * MAX_INS + ins


def _blocky(rng, h, w, block=8, **kw):
    hs, ws = h // block, w // block
    small = _random_panoptic(rng, hs, ws, **kw)
    return np.kron(small, np.ones((block, block), dtype=np.int64))


def test_vpq_device_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    for trial in range(5):
        gt = _blocky(rng, 64, 96)
        # prediction: GT with noise -> realistic partial matches; predictions
        # never contain the void category (the reference arrays are sized
        # num_cat and would crash otherwise -> same contract here)
        pred = gt.copy()
        noise = _blocky(rng, 64, 96, p_void=0.0)
        m = (rng.rand(64, 96) < 0.2) | (gt // MAX_INS == 255)
        pred[m] = noise[m]
        ref = vpq_eval_np(pred, gt)
        dev = vpq_eval_device(jnp.asarray(pred), jnp.asarray(gt),
                              max_seg=256)
        for a, b, name in zip(dev, ref, ["iou", "tp", "fn", "fp"]):
            np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5,
                                       atol=1e-5, err_msg=name)


def test_vpq_overflow_guard_crowded_window():
    """A window with > 256 distinct segments must NOT be silently
    truncated: evaluate_dvpq grows max_seg from the exact device segment
    count and still matches the numpy oracle."""
    from ldmseg_tpu.evals.vpq import count_segments_device

    rng = np.random.RandomState(7)
    # ~400 distinct ids per map: 8 thing classes x 50 instances on a grid
    hs, ws = 20, 20
    cat = rng.randint(0, 8, size=(hs, ws))
    ins = rng.randint(0, 50, size=(hs, ws))
    gt_small = cat * MAX_INS + ins
    gt = np.kron(gt_small, np.ones((8, 8), dtype=np.int64))
    pred = gt.copy()
    noise = np.kron(rng.randint(0, 8, size=(hs, ws)) * MAX_INS
                    + rng.randint(0, 50, size=(hs, ws)),
                    np.ones((8, 8), dtype=np.int64))
    m = np.kron(rng.rand(hs, ws) < 0.2, np.ones((8, 8), dtype=bool))
    pred[m] = noise[m]

    n_gt, n_pred = (int(x) for x in count_segments_device(
        jnp.asarray(pred), jnp.asarray(gt)))
    assert max(n_gt, n_pred) > 256  # the scenario actually overflows
    assert n_gt == len(np.unique(gt)) and n_pred == len(np.unique(pred))

    ref = vpq_eval_np(pred, gt)
    s_dev = evaluate_dvpq([pred // MAX_INS], [pred % MAX_INS],
                          [gt // MAX_INS], [gt % MAX_INS],
                          eval_frames=1, max_seg=256)
    s_ref = vpq_stats_to_scores(*ref)
    np.testing.assert_allclose(s_dev["pq"], s_ref["pq"], rtol=1e-6)
    np.testing.assert_allclose(s_dev["per_class_pq"],
                               s_ref["per_class_pq"], rtol=1e-6)


def test_vpq_perfect_prediction():
    rng = np.random.RandomState(1)
    gt = _blocky(rng, 32, 48)
    iou, tp, fn, fp = vpq_eval_device(jnp.asarray(gt), jnp.asarray(gt))
    scores = vpq_stats_to_scores(iou, tp, fn, fp)
    present = np.asarray(tp)[:19] > 0
    assert np.all(np.asarray(fp)[:19] == 0)
    assert np.all(np.asarray(fn)[:19] == 0)
    # every present class has PQ 100
    per = np.asarray(scores["per_class_pq"])
    np.testing.assert_allclose(per[present], 100.0, rtol=1e-5)


def test_dvpq_windowing_and_depth():
    rng = np.random.RandomState(2)
    frames = 4
    cats = [(_blocky(rng, 32, 32) // MAX_INS) for _ in range(frames)]
    inss = [np.zeros((32, 32), np.int64) for _ in range(frames)]
    depth_gt = [np.full((32, 32), 10.0) for _ in range(frames)]
    depth_good = [np.full((32, 32), 10.2) for _ in range(frames)]
    depth_bad = [np.full((32, 32), 30.0) for _ in range(frames)]

    # perfect predictions + accurate depth -> same as no depth masking
    s1 = evaluate_dvpq(cats, inss, cats, inss, eval_frames=2,
                       depth_pred=depth_good, depth_gt=depth_gt,
                       depth_thres=0.5)
    s2 = evaluate_dvpq(cats, inss, cats, inss, eval_frames=2)
    np.testing.assert_allclose(s1["pq"], s2["pq"], rtol=1e-6)
    # wildly wrong depth -> all preds reassigned to cat 19 -> PQ 0
    s3 = evaluate_dvpq(cats, inss, cats, inss, eval_frames=2,
                       depth_pred=depth_bad, depth_gt=depth_gt,
                       depth_thres=0.5)
    assert s3["pq"] < 1e-6
    # device and numpy paths agree
    s4 = evaluate_dvpq(cats, inss, cats, inss, eval_frames=2,
                       use_device=False)
    np.testing.assert_allclose(s2["pq"], s4["pq"], rtol=1e-6)


def test_miou_meter():
    meter = SemsegMeter(num_classes=4, ignore_index=255)
    gt = np.array([[0, 1, 2, 3]])
    meter.update(np.array([[0, 1, 2, 2]]), gt)
    scores = meter.return_score()
    # classes 0,1 perfect; 2: inter 1 / union 2; 3: 0
    np.testing.assert_allclose(scores["per_class"],
                               [100, 100, 50, 0], rtol=1e-4)
    # ignore pixels excluded
    meter.reset()
    meter.update(np.array([[0, 0]]), np.array([[255, 255]]))
    assert meter.union.sum() == 0


def test_panoptic_evaluator_perfect_and_miss():
    ev = PanopticEvaluator(thing_ids={2}, ignore_label=0)
    gt = np.zeros((32, 32), np.int64)
    gt[2:10, 2:10] = 1          # stuff
    gt[20:30, 20:30] = 2        # one thing instance
    ev.add_image(gt.copy(), gt)
    res = ev.evaluate()
    assert res["pq"] == 100.0 and res["tp"] == 2
    assert res["fp"] == 0 and res["fn"] == 0

    # wrong-class prediction on labeled area -> FN + FP (note: predictions
    # on GT-ignore pixels are erased, cityscapes_pap_eval.py:108, so the FP
    # must sit on labeled GT)
    ev.reset()
    pred = np.zeros_like(gt)
    pred[20:28, 20:28] = 1  # overlaps gt thing region 2 with wrong class
    ev.add_image(pred, gt)
    res = ev.evaluate()
    assert res["tp"] == 0 and res["fn"] == 2 and res["fp"] == 1

    # two disconnected components of one thing class = 2 instances
    ev.reset()
    gt2 = np.zeros((32, 32), np.int64)
    gt2[2:8, 2:8] = 2
    gt2[20:26, 20:26] = 2
    ev.add_image(gt2.copy(), gt2)
    res = ev.evaluate()
    assert res["tp"] == 2


def test_panoptic_evaluator_class_agnostic():
    ev = PanopticEvaluator(thing_ids=set(), ignore_label=0,
                           class_agnostic=True)
    gt = np.zeros((16, 16), np.int64)
    gt[:8] = 3
    gt[8:] = 7
    pred = np.zeros_like(gt)
    pred[:8] = 5   # different label, but class-agnostic -> still matches
    pred[8:] = 9
    ev.add_image(pred, gt)
    res = ev.evaluate()
    assert res["tp"] == 2 and res["pq"] == 100.0
