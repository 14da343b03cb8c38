"""Panoptic post-process: vectorized device op vs a direct numpy port of the
reference per-segment loop (trainers_ldm_cond.py:1287-1325).
"""

import numpy as np
import jax.numpy as jnp

from ldmseg_tpu.ops import panoptic_post_process


def _reference_post_process(logits_chw, mask_th, count_th, overlap_th,
                            ignore_label):
    """Numpy port of the reference host loop."""
    c = logits_chw.shape[0]
    pred = np.argmax(logits_chw, axis=0)
    e = np.exp(logits_chw - logits_chw.max(axis=0, keepdims=True))
    probs = e / e.sum(axis=0, keepdims=True)
    maxprob = probs.max(axis=0)
    pred[maxprob < mask_th] = ignore_label
    sig = 1.0 / (1.0 + np.exp(-logits_chw))
    cleaned = pred.copy()
    for label, count in zip(*np.unique(pred, return_counts=True)):
        if count < count_th or label in (-1, ignore_label):
            cleaned[cleaned == label] = -1
            continue
        original_mask = sig[label] >= mask_th
        denom = max(original_mask.sum(), 1)
        if (pred == label).sum() / denom < overlap_th:
            cleaned[cleaned == label] = -1
    return cleaned


def test_parity_with_reference_loop():
    rng = np.random.RandomState(0)
    h, w, c = 48, 64, 16
    logits = rng.randn(h, w, c).astype(np.float32) * 3.0
    # plant some big confident segments
    logits[:20, :30, 3] += 10.0
    logits[25:, 40:, 7] += 10.0
    for mask_th, count_th, overlap_th in [(0.5, 100, 0.5), (0.9, 512, 0.9),
                                          (0.3, 10, 0.1)]:
        ours, keep = panoptic_post_process(
            jnp.asarray(logits), mask_th=mask_th, count_th=count_th,
            overlap_th=overlap_th, ignore_label=0)
        ref = _reference_post_process(
            logits.transpose(2, 0, 1), mask_th, count_th, overlap_th, 0)
        np.testing.assert_array_equal(np.asarray(ours), ref)


def test_valid_mask_excludes_padding():
    rng = np.random.RandomState(1)
    h, w, c = 32, 32, 8
    logits = rng.randn(h, w, c).astype(np.float32)
    logits[:, :, 2] += 8.0  # everything class 2, confident
    valid = np.ones((h, w), dtype=bool)
    valid[:, 16:] = False  # half the image is padding
    ours, keep = panoptic_post_process(
        jnp.asarray(logits), mask_th=0.5, count_th=600, overlap_th=0.5,
        ignore_label=0, valid_mask=jnp.asarray(valid))
    # only 512 valid pixels of class 2 -> below count_th -> removed
    assert not bool(keep[2])
    assert np.all(np.asarray(ours) == -1)


def test_batched():
    rng = np.random.RandomState(2)
    logits = rng.randn(3, 16, 16, 4).astype(np.float32)
    out, keep = panoptic_post_process(jnp.asarray(logits), count_th=4)
    assert out.shape == (3, 16, 16)
    assert keep.shape == (3, 4)
