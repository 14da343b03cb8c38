"""Multihost eval-sync MERGE-LOGIC test (simulated gather).

Reference parity: SemsegMeter all-reduce (semseg_evaluation.py:59-70) and
PanopticEvaluator per-rank record gather (panoptic_evaluation.py:97-100).
``jax.process_count`` / ``multihost_utils.process_allgather`` are
monkeypatched, so ONLY the packing/merge logic is under test here: two
evaluators fed disjoint image shards must, after "sync", score exactly
like one evaluator fed the whole set. The actual collective path is
covered by tests/test_multihost_real.py, which spawns a real 2-process
``jax.distributed`` CPU cluster.
"""

import numpy as np
import jax
from jax.experimental import multihost_utils

from ldmseg_tpu.evals import SemsegMeter, PanopticEvaluator
from ldmseg_tpu.parallel import multihost as mh


def _fake_two_process(monkeypatch, packed_by_rank):
    """Patch process_count=2 and allgather -> stack of both ranks' data.

    ``packed_by_rank`` maps id(obj)-independent rank order: the fake
    records rank-1's payload on the first call, then merges."""
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    def allgather(x):
        x = np.asarray(x)
        if "other" not in packed_by_rank:     # capture pass (rank 1)
            packed_by_rank["other"] = x
            return x[None]
        return np.stack([x, packed_by_rank["other"]])

    monkeypatch.setattr(multihost_utils, "process_allgather", allgather)


def _images(seed, n=3, hw=(24, 24)):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        gt = rng.integers(0, 6, hw).astype(np.int64)
        pred = gt.copy()
        flip = rng.random(hw) < 0.3
        pred[flip] = rng.integers(0, 6, int(flip.sum()))
        out.append((pred, gt))
    return out


def test_panoptic_sync_matches_single_process(monkeypatch):
    shard1, shard2 = _images(0), _images(1)

    full = PanopticEvaluator(thing_ids={2, 3}, ignore_label=0)
    for p, g in shard1 + shard2:
        full.add_image(p, g)
    want = full.evaluate(synchronize=False)

    e1 = PanopticEvaluator(thing_ids={2, 3}, ignore_label=0)
    e2 = PanopticEvaluator(thing_ids={2, 3}, ignore_label=0)
    for p, g in shard1:
        e1.add_image(p, g)
    for p, g in shard2:
        e2.add_image(p, g)

    state = {}
    _fake_two_process(monkeypatch, state)
    e2.synchronize_between_processes()   # capture pass: records rank-2
    got = e1.evaluate()                  # merge pass: rank-1 + rank-2

    for k in ("pq", "sq", "rq", "tp", "fp", "fn"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9,
                                   err_msg=k)


def test_semseg_meter_sync_matches_single_process(monkeypatch):
    shard1, shard2 = _images(2), _images(3)

    full = SemsegMeter(num_classes=6, ignore_index=255)
    for p, g in shard1 + shard2:
        full.update(p[None], g[None])
    want = full.return_score()

    m1 = SemsegMeter(num_classes=6, ignore_index=255)
    m2 = SemsegMeter(num_classes=6, ignore_index=255)
    for p, g in shard1:
        m1.update(p[None], g[None])
    for p, g in shard2:
        m2.update(p[None], g[None])

    state = {}
    _fake_two_process(monkeypatch, state)
    m2.synchronize()
    # m2 after a self-only gather must be unchanged (sum of one shard)
    m1.synchronize()
    got = m1.return_score()
    np.testing.assert_allclose(got["per_class"], want["per_class"],
                               rtol=1e-6)


def test_all_gather_host(monkeypatch):
    state = {}
    _fake_two_process(monkeypatch, state)
    # capture pass stores rank-2's value; merge pass sees both
    assert mh.all_gather_host(np.array([5.0])) is not None
    vals = mh.all_gather_host(np.array([7.0]))
    assert len(vals) == 2
    np.testing.assert_allclose(np.asarray(vals).ravel(), [7.0, 5.0])
