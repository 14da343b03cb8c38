"""Per-image original-size PQ eval restore (reference compute_pq
upsamples, crops padding and resizes each prediction to its own
meta['im_size'] before scoring, trainers_ldm_cond.py:1264-1284,:1175) +
the evaluator's cross-process synchronization no-op on one process.
"""

import pytest
import numpy as np
import jax.numpy as jnp

from ldmseg_tpu.evals import PanopticEvaluator
from ldmseg_tpu.models import UNetConfig
from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

pytestmark = pytest.mark.slow


def _mini_trainer(tmp_path):
    cfg = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 16, "out_channels": 8,
            "block_out_channels": [8, 8, 8, 8], "num_upscalers": 2,
            "upscale_channels": 8, "norm_num_groups": 4,
        },
        "train_kwargs": {"batch_size": 2, "train_num_steps": 1},
        "eval_kwargs": {"mask_th": 0.0, "count_th": 0, "overlap_th": 0.0},
        "ignore_label": 0,
    })
    ucfg = UNetConfig(in_channels=8, out_channels=4,
                      block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                      cross_attention_dim=8, attention_head_dim=2,
                      norm_num_groups=4, use_cross_attention=False)
    return TrainerDiffusion(cfg, unet_config=ucfg,
                            results_folder=str(tmp_path))


def _blob_logits(rng, h, w, c):
    """Logits whose argmax draws a few rectangles."""
    x = rng.normal(0, 0.1, (h, w, c)).astype(np.float32)
    x[:, :, 1] += 2.0  # background class 1
    x[h // 4:h // 2, w // 4:w // 2, 2] += 5.0
    x[h // 2:, w // 2:, 3] += 5.0
    return x


def test_eval_fullres_matches_per_image_oracle(tmp_path):
    """Heterogeneous-size val batch: _eval_fullres must equal scoring
    each image independently at its own resolution."""
    from ldmseg_tpu.ops import panoptic_post_process
    import jax

    tr = _mini_trainer(tmp_path)
    rng = np.random.RandomState(0)
    c = 8
    logits = np.stack([_blob_logits(rng, 16, 32, c) for _ in range(3)])

    gt_shapes = [(24, 48), (40, 80), (16, 32)]  # heterogeneous originals
    metas = []
    for (oh, ow) in gt_shapes:
        gt = np.ones((oh, ow), np.int32)
        gt[oh // 4:oh // 2, ow // 4:ow // 2] = 2
        gt[oh // 2:, ow // 2:] = 3
        metas.append({"gt_sem": gt, "im_size": (oh, ow),
                      "gt_mask": np.ones((oh, ow), np.uint8)})

    ev = PanopticEvaluator(thing_ids=set(), class_agnostic=False,
                           ignore_label=0)
    tr._eval_fullres(ev, jnp.asarray(logits), metas)

    # oracle: process each image independently
    ev2 = PanopticEvaluator(thing_ids=set(), class_agnostic=False,
                            ignore_label=0)
    for bi, m in enumerate(metas):
        oh, ow = m["gt_sem"].shape
        li = jax.image.resize(jnp.asarray(logits[bi:bi + 1]),
                              (1, oh, ow, c), "linear")
        cleaned, _ = panoptic_post_process(
            li, mask_th=tr.mask_th, count_th=tr.count_th,
            overlap_th=tr.overlap_th, ignore_label=0,
            valid_mask=jnp.ones((1, oh, ow), bool))
        ev2.add_image(np.asarray(cleaned)[0], m["gt_sem"])

    assert (ev.TP, ev.FP, ev.FN) == (ev2.TP, ev2.FP, ev2.FN)
    np.testing.assert_allclose(ev.iou_sum, ev2.iou_sum)
    r1, r2 = ev.evaluate(), ev2.evaluate()
    np.testing.assert_allclose(r1["pq"], r2["pq"])
    assert r1["tp"] > 0  # the rectangles actually match

    # heterogeneous sizes share ONE compiled program (padded bucket),
    # instead of recompiling resize+post-process per distinct (oh, ow)
    assert tr._fullres_post._cache_size() == 1


def test_eval_fullres_padding_crop(tmp_path):
    """meta['padding'] removes padded rows/cols before the restore —
    a prediction padded with garbage must score the same as unpadded."""
    tr = _mini_trainer(tmp_path)
    rng = np.random.RandomState(1)
    c = 8
    base = _blob_logits(rng, 16, 32, c)
    # pad 4 garbage rows at the bottom, 8 garbage cols at the right
    padded = np.concatenate([base, rng.normal(5, 1, (4, 32, c))], axis=0)
    padded = np.concatenate(
        [padded, rng.normal(5, 1, (20, 8, c))], axis=1).astype(np.float32)

    gt = np.ones((32, 64), np.int32)
    gt[8:16, 16:32] = 2
    gt[16:, 32:] = 3
    meta_pad = {"gt_sem": gt, "im_size": (32, 64),
                "padding": (0, 4, 0, 8)}
    meta_ref = {"gt_sem": gt, "im_size": (32, 64)}

    ev_pad = PanopticEvaluator(thing_ids=set(), ignore_label=0)
    tr._eval_fullres(ev_pad, jnp.asarray(padded[None]), [meta_pad])
    ev_ref = PanopticEvaluator(thing_ids=set(), ignore_label=0)
    tr._eval_fullres(ev_ref, jnp.asarray(base[None]), [meta_ref])

    assert (ev_pad.TP, ev_pad.FP, ev_pad.FN) == \
        (ev_ref.TP, ev_ref.FP, ev_ref.FN)


def test_evaluator_sync_single_process_noop():
    ev = PanopticEvaluator(thing_ids=set(), ignore_label=0)
    pred = np.ones((8, 8), np.int32)
    ev.add_image(pred, pred)
    tp_before = ev.TP
    ev.synchronize_between_processes()
    assert ev.TP == tp_before
    res = ev.evaluate()
    assert res["pq"] == 100.0
