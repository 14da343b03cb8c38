"""Point-loss parity tests.

We regenerate the (deterministic, key-driven) point coordinates and compute
the reference loss values with torch (F.grid_sample + F.cross_entropy /
BCE / dice exactly as ldmseg/trainers/losses.py does), then require our
fixed-shape implementation to match.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ldmseg_tpu.losses import PointLossConfig, point_losses, select_topk_masks
from ldmseg_tpu.losses.point_losses import _ce_loss, _mask_losses
from ldmseg_tpu.ops.uncertainty import (
    get_uncertain_point_coords,
    uncertainty_sigmoid,
    uncertainty_top2,
)

B, H, W, C = 2, 32, 48, 8
CFG = PointLossConfig(num_points=256, oversample_ratio=3,
                      importance_sample_ratio=0.75, ignore_label=0,
                      max_masks=C)


def _data(seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(B, H, W, C).astype(np.float32)
    targets = rng.randint(0, C, size=(B, H // 2, W // 2)).astype(np.int32)
    # upscale targets so label res != logit res (like 192x640 vs 96x320)
    targets = np.kron(targets, np.ones((2, 2), dtype=np.int32))
    return logits, targets


def _torch_point_sample(feat_nchw, coords, mode="bilinear"):
    t = torch.from_numpy(feat_nchw)
    g = torch.from_numpy(coords).unsqueeze(2)
    out = F.grid_sample(t, 2.0 * g - 1.0, mode=mode, align_corners=False)
    return out.squeeze(3)


def test_ce_loss_parity():
    logits, targets = _data()
    key = jax.random.key(0)
    ours = _ce_loss(key, jnp.asarray(logits), jnp.asarray(targets), CFG)

    coords = np.asarray(get_uncertain_point_coords(
        key, jnp.asarray(logits), uncertainty_top2, CFG.num_points,
        CFG.oversample_ratio, CFG.importance_sample_ratio))
    t_logits = _torch_point_sample(logits.transpose(0, 3, 1, 2), coords)
    t_labels = _torch_point_sample(
        targets[:, None].astype(np.float32), coords, mode="nearest"
    ).squeeze(1).long()
    ref = F.cross_entropy(t_logits / CFG.temperature, t_labels,
                          ignore_index=CFG.ignore_label).item()
    np.testing.assert_allclose(float(ours), ref, rtol=1e-4)


def test_select_topk_masks():
    targets = np.zeros((1, 8, 8), dtype=np.int32)
    targets[0, :4] = 3
    targets[0, 4:6] = 5
    targets[0, 6] = 1
    ids, valid = select_topk_masks(jnp.asarray(targets), 8, 0, 4)
    ids, valid = np.asarray(ids), np.asarray(valid)
    # largest first: class 3 (32 px), 5 (16), 1 (8); ignore(0) excluded
    assert list(ids[0][:3]) == [3, 5, 1]
    assert valid[0].tolist() == [True, True, True, False]


def test_mask_loss_parity():
    logits, targets = _data(1)
    key = jax.random.key(7)
    ours = float(_mask_losses(key, jnp.asarray(logits), jnp.asarray(targets),
                              CFG))

    # --- torch reference, replicating losses.py:117-207 exactly ---
    ids, valid = select_topk_masks(jnp.asarray(targets), C, 0, CFG.max_masks)
    ids, valid = np.asarray(ids), np.asarray(valid)

    # per-mask channels + binary target masks
    src = np.stack([logits[b, :, :, ids[b]] for b in range(B)])  # [B,H,W,K]
    src = src.transpose(0, 3, 1, 2).reshape(B * CFG.max_masks, 1, H, W)
    tgt = np.stack([
        (targets[b][None] == ids[b][:, None, None]) for b in range(B)
    ]).astype(np.float32).reshape(B * CFG.max_masks, 1, H, W)

    src_nhwc = src.transpose(0, 2, 3, 1)
    coords = np.asarray(get_uncertain_point_coords(
        key, jnp.asarray(src_nhwc), uncertainty_sigmoid, CFG.num_points,
        CFG.oversample_ratio, CFG.importance_sample_ratio))
    pl = _torch_point_sample(src, coords).squeeze(1)       # point logits
    plab = _torch_point_sample(tgt, coords).squeeze(1)     # bilinear labels

    vmask = torch.from_numpy(valid.reshape(-1).astype(np.float32))
    num_masks = max(valid.sum(), 1)
    bce = F.binary_cross_entropy_with_logits(pl, plab, reduction="none")
    loss_bce = (bce.mean(1) * vmask).sum() / num_masks
    p = pl.sigmoid()
    numerator = 2 * (p * plab).sum(-1)
    denominator = p.sum(-1) + plab.sum(-1)
    dice = 1 - (numerator + 1) / (denominator + 1)
    loss_dice = (dice * vmask).sum() / num_masks
    ref = float(loss_bce + loss_dice)

    # float32 accumulation order differs between the fused jax path and
    # the torch reference; dice's (1 - ratio) form amplifies it
    np.testing.assert_allclose(ours, ref, rtol=1e-2)


def test_point_losses_api_and_corrupt_mask():
    logits, targets = _data(2)
    key = jax.random.key(3)
    out = point_losses(key, jnp.asarray(logits), jnp.asarray(targets), CFG)
    assert set(out) == {"ce", "mask"}
    assert np.isfinite(float(out["ce"])) and np.isfinite(float(out["mask"]))
    # fully corrupted mask -> all targets ignore -> ce must be 0
    zeros = jnp.zeros(targets.shape)
    out2 = point_losses(key, jnp.asarray(logits), jnp.asarray(targets), CFG,
                        corrupt_mask=zeros)
    assert float(out2["ce"]) == 0.0


def test_mask_count_psum_under_shard_map():
    """The global mask-count normalization must match the reference's
    all_reduce/world_size semantics under a real device mesh."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    logits, targets = _data(4)
    devices = np.array(jax.devices()[:2])
    mesh = Mesh(devices, ("data",))
    cfg = CFG

    def local(lg, tg):
        loss = _mask_losses(jax.random.key(0), lg, tg, cfg,
                            axis_name="data")
        # DDP semantics: per-shard losses are averaged across the axis
        return jax.lax.pmean(loss, "data")

    f = shard_map(local, mesh=mesh, in_specs=(P("data"), P("data")),
                  out_specs=P())
    out = f(jnp.asarray(logits), jnp.asarray(targets))
    assert np.isfinite(float(out))
