"""(Depth-aware) Video Panoptic Quality — vectorized on device.

Reference: eval/eval_dvpq.py:25-101 (``vpq_eval``, the VIP-DeepLab
formulation): panoptic id = category * 2^20 + instance; per (gt, pred)
segment pair with equal category and IoU > 0.5 a TP is counted, where the
union discounts the prediction's overlap with the *void* gt segment
(category 255, instance 0); unmatched gt segments (cat != 255) are FN;
unmatched pred segments are FP unless > 50% of their area overlaps ignored
gt segments (any instance of cat 255).

The reference runs this per window in a host multiprocessing pool
(:186-188). Here the whole computation is dense array math:

  * ``jnp.unique(..., size=MAX_SEG)`` compacts segment ids statically,
  * per-pixel (gt_idx, pred_idx) pairs -> one ``bincount`` of the combined
    index = the full intersection matrix,
  * TP/FN/FP/IoU reduce from that [MAX_SEG, MAX_SEG] matrix.

A direct numpy port (``vpq_eval_np``) is kept as the parity oracle.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

MAX_INS = 2**20
IGN_ID = 255
NUM_CAT = 20


# ---------------------------------------------------------------------------
# Host reference (parity oracle)
# ---------------------------------------------------------------------------

def vpq_eval_np(pred_ids: np.ndarray, gt_ids: np.ndarray,
                num_cat: int = NUM_CAT, ign_id: int = IGN_ID,
                max_ins: int = MAX_INS):
    """Direct numpy port of eval/eval_dvpq.py:25-101."""
    offset = 2**30
    iou = np.zeros(num_cat)
    tp = np.zeros(num_cat)
    fn = np.zeros(num_cat)
    fp = np.zeros(num_cat)

    def counts(a):
        ids, c = np.unique(a, return_counts=True)
        return dict(zip(ids.tolist(), c.tolist()))

    pred_areas = counts(pred_ids)
    gt_areas = counts(gt_ids)
    void_id = ign_id * max_ins
    ign_ids = {g for g in gt_areas if g // max_ins == ign_id}

    int_ids = gt_ids.astype(np.int64) * offset + pred_ids.astype(np.int64)
    int_areas = counts(int_ids)

    def void_overlap(pid):
        return int_areas.get(void_id * offset + pid, 0)

    def ignored_overlap(pid):
        return sum(int_areas.get(i * offset + pid, 0) for i in ign_ids)

    gt_matched, pred_matched = set(), set()
    for int_id, area in int_areas.items():
        gid = int(int_id // offset)
        pid = int(int_id % offset)
        gcat, pcat = gid // max_ins, pid // max_ins
        if gcat != pcat:
            continue
        union = gt_areas[gid] + pred_areas[pid] - area - void_overlap(pid)
        # the reference divides numpy ints (0 -> nan -> fails the > 0.5
        # check with a warning); equivalent explicit guard here
        i = area / union if union > 0 else 0.0
        if i > 0.5:
            tp[gcat] += 1
            iou[gcat] += i
            gt_matched.add(gid)
            pred_matched.add(pid)

    for gid in gt_areas:
        if gid in gt_matched or gid // max_ins == ign_id:
            continue
        fn[gid // max_ins] += 1
    for pid in pred_areas:
        if pid in pred_matched:
            continue
        if ignored_overlap(pid) / pred_areas[pid] > 0.5:
            continue
        fp[pid // max_ins] += 1
    return iou, tp, fn, fp


# ---------------------------------------------------------------------------
# Device implementation
# ---------------------------------------------------------------------------

@jax.jit
def count_segments_device(pred_ids: jnp.ndarray, gt_ids: jnp.ndarray):
    """Exact distinct-segment counts ``(n_gt, n_pred)`` for one window.

    ``vpq_eval_device`` compacts ids with ``jnp.unique(..., size=max_seg)``,
    which silently DROPS segments past the cap. This sort-and-count-
    transitions pass is exact at any segment count; callers use it to
    grow ``max_seg`` (see :func:`~ldmseg_tpu.evals.dvpq.evaluate_dvpq`)
    so truncation can never happen silently.
    """
    def n_unique(a):
        s = jnp.sort(a.reshape(-1))
        return 1 + jnp.sum(s[1:] != s[:-1])

    return n_unique(gt_ids), n_unique(pred_ids)


@partial(jax.jit, static_argnames=("max_seg", "num_cat", "ign_id",
                                   "max_ins"))
def vpq_eval_device(
    pred_ids: jnp.ndarray,
    gt_ids: jnp.ndarray,
    max_seg: int = 256,
    num_cat: int = NUM_CAT,
    ign_id: int = IGN_ID,
    max_ins: int = MAX_INS,
):
    """Fixed-shape VPQ statistics for one (windowed) id map pair.

    Args:
      pred_ids / gt_ids: int arrays of identical shape (any rank),
        panoptic ids = cat * max_ins + ins.
      max_seg: static cap on distinct segments per map (typical windows have
        < 100).

    Returns: (iou, tp, fn, fp) each ``[num_cat]`` float32.
    """
    pred = pred_ids.reshape(-1).astype(jnp.int64)
    gt = gt_ids.reshape(-1).astype(jnp.int64)

    # pad with a sentinel above any real id so the unique array stays
    # sorted for searchsorted (jnp.unique pads at the END with fill_value);
    # categories are < 256 so ids are < 256*max_ins; int32-safe.
    sentinel = jnp.asarray(300 * max_ins, dtype=pred.dtype)
    gt_u = jnp.unique(gt, size=max_seg, fill_value=sentinel)
    pr_u = jnp.unique(pred, size=max_seg, fill_value=sentinel)
    gt_valid = gt_u < sentinel
    pr_valid = pr_u < sentinel

    gt_idx = jnp.searchsorted(gt_u, gt)
    pr_idx = jnp.searchsorted(pr_u, pred)

    # full intersection matrix via one histogram
    comb = gt_idx * max_seg + pr_idx
    inter = jnp.bincount(comb, length=max_seg * max_seg).reshape(
        max_seg, max_seg).astype(jnp.float32)
    gt_areas = jnp.sum(inter, axis=1)
    pr_areas = jnp.sum(inter, axis=0)

    gt_cat = jnp.where(gt_valid, gt_u // max_ins, -1)
    pr_cat = jnp.where(pr_valid, pr_u // max_ins, -2)

    # void overlap: intersection of each pred with gt id == ign_id*max_ins
    is_void_gt = (gt_u == ign_id * max_ins) & gt_valid
    void_overlap = jnp.sum(inter * is_void_gt[:, None].astype(jnp.float32),
                           axis=0)  # [max_seg] per pred
    # ignored overlap: all gt segments with cat == ign_id
    is_ign_gt = (gt_cat == ign_id) & gt_valid
    ign_overlap = jnp.sum(inter * is_ign_gt[:, None].astype(jnp.float32),
                          axis=0)

    same_cat = gt_cat[:, None] == pr_cat[None, :]
    union = gt_areas[:, None] + pr_areas[None, :] - inter - \
        void_overlap[None, :]
    iou_mat = jnp.where(same_cat & (inter > 0),
                        inter / jnp.maximum(union, 1.0), 0.0)
    match = iou_mat > 0.5

    cat_onehot_gt = jax.nn.one_hot(jnp.clip(gt_cat, 0, num_cat - 1),
                                   num_cat) * gt_valid[:, None]
    # TP / IoU per category (match rows index gt segments)
    tp_per_gt = jnp.any(match, axis=1)
    iou_per_gt = jnp.sum(iou_mat * match, axis=1)
    tp = jnp.sum(cat_onehot_gt * tp_per_gt[:, None], axis=0)
    iou = jnp.sum(cat_onehot_gt * iou_per_gt[:, None], axis=0)

    # FN: unmatched valid gt with cat != ign
    fn_seg = gt_valid & (~tp_per_gt) & (gt_cat != ign_id)
    fn = jnp.sum(cat_onehot_gt * fn_seg[:, None], axis=0)

    # FP: unmatched valid pred unless mostly ignored
    pr_matched = jnp.any(match, axis=0)
    mostly_ignored = ign_overlap / jnp.maximum(pr_areas, 1.0) > 0.5
    fp_seg = pr_valid & (~pr_matched) & (~mostly_ignored)
    cat_onehot_pr = jax.nn.one_hot(jnp.clip(pr_cat, 0, num_cat - 1),
                                   num_cat) * pr_valid[:, None]
    fp = jnp.sum(cat_onehot_pr * fp_seg[:, None], axis=0)

    return iou, tp, fn, fp


def vpq_stats_to_scores(iou, tp, fn, fp, num_eval_cat: int = 19,
                        things_split: int = 8):
    """Aggregate accumulated stats into PQ / TPQ / SPQ
    (eval/eval_dvpq.py:190-210). ``things_split``: classes [0, split) are
    things, [split, num_eval_cat) stuff."""
    eps = 1e-10
    iou = np.asarray(iou, dtype=np.float64)[:num_eval_cat]
    tp = np.asarray(tp, dtype=np.float64)[:num_eval_cat]
    fn = np.asarray(fn, dtype=np.float64)[:num_eval_cat]
    fp = np.asarray(fp, dtype=np.float64)[:num_eval_cat]
    sq = iou / (tp + eps)
    rq = tp / (tp + 0.5 * fn + 0.5 * fp + eps)
    pq = sq * rq
    return {
        "pq": float(pq.mean() * 100),
        "tpq": float(pq[:things_split].mean() * 100),
        "spq": float(pq[things_split:].mean() * 100),
        "per_class_pq": (pq * 100).tolist(),
    }
