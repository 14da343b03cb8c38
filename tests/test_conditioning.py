"""Conditioning + classifier-free guidance, end-to-end through the LDM
trainer (reference trainers_ldm_cond.py:722-735 builds
encoder_hidden_states in process_inputs; CFG chunk/combine :1147-1149).

Covers: caller-supplied context ('none' descriptor), a frozen CLIP text
tower ('clip_text' with a tiny random FlaxCLIPTextModel — no downloads),
learnable object queries, and CFG behavior (scale 1 == no-CFG exactly;
scale > 1 changes the samples).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldmseg_tpu.data import SyntheticDVPS, Loader
from ldmseg_tpu.models import UNetConfig
from ldmseg_tpu.models.descriptors import DescriptorSpec, get_image_descriptors
from ldmseg_tpu.diffusion.sampler import cfg_model_fn
from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
from ldmseg_tpu.parallel import shard_batch
from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

SMALL = merge_dicts(DEFAULT_CONFIG, {
    "vae_model_kwargs": {
        "in_channels": 10, "int_channels": 32, "out_channels": 32,
        "block_out_channels": [8, 16, 16, 32], "num_upscalers": 2,
        "upscale_channels": 32, "norm_num_groups": 8,
    },
    "train_kwargs": {"batch_size": 8, "train_num_steps": 4,
                     "clip_grad": 1.0},
    "sampling_kwargs": {"num_inference_steps": 3, "guidance_scale": 3.0},
    "eval_kwargs": {"count_th": 16},
    "ignore_label": 0,
})

CROSS_UNET = UNetConfig(
    in_channels=8, out_channels=4, block_out_channels=(8, 16, 16, 32),
    layers_per_block=1, cross_attention_dim=16, attention_head_dim=2,
    norm_num_groups=4, use_cross_attention=True)


def _trainer(tmp_path, descriptor, unet_cfg=CROSS_UNET, cfg_over=None):
    cfg = merge_dicts(SMALL, cfg_over or {})
    ds = SyntheticDVPS(length=16, size=(64, 128), num_classes=20)
    tr = TrainerDiffusion(cfg, unet_config=unet_cfg, dataset=ds,
                          val_dataset=ds, results_folder=str(tmp_path),
                          descriptor=descriptor)
    batch = next(iter(Loader(ds, 8, shuffle=False)))
    return tr, batch


def test_context_train_and_sample(tmp_path):
    """'none' descriptor: caller-supplied embeddings flow through the
    train step AND change the model output (cross-attn is live)."""
    spec = DescriptorSpec(kind="none", use_cross_attention=True)
    tr, batch = _trainer(tmp_path, spec)
    ctx = np.random.RandomState(0).randn(8, 4, 16).astype(np.float32)
    batch["context"] = ctx
    tr.init_state(batch)
    db = shard_batch(tr.mesh, tr._device_batch(batch))
    assert "context" in db
    tr.state, metrics, _ = tr._train_step(tr.state, tr.frozen_params, db,
                                          jax.random.key(0))
    assert np.isfinite(float(jax.device_get(metrics["loss"])))

    # context actually reaches cross attention: different context ->
    # different prediction
    lat = jnp.zeros((8, 8, 16, 4))
    rgb = jnp.zeros((8, 8, 16, 4))
    t = jnp.zeros((8,), jnp.int32)
    p1 = tr._unet_apply(tr.state.params, lat, rgb, None, t, jnp.asarray(ctx))
    p2 = tr._unet_apply(tr.state.params, lat, rgb, None, t,
                        jnp.asarray(ctx) + 1.0)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_clip_text_descriptor(tmp_path):
    """clip_text: token ids -> frozen CLIP text tower -> UNet context."""
    transformers = pytest.importorskip("transformers")
    cfgc = transformers.CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=77)
    model = transformers.FlaxCLIPTextModel(cfgc, seed=0)
    spec = DescriptorSpec(kind="clip_text", use_cross_attention=True,
                          model=model)
    tr, batch = _trainer(tmp_path, spec)
    batch["text_tokens"] = np.random.RandomState(0).randint(
        0, 64, size=(8, 77)).astype(np.int32)
    tr.init_state(batch)
    assert "descriptor" in tr.frozen_params
    db = shard_batch(tr.mesh, tr._device_batch(batch))
    assert db["text_tokens"].shape == (8, 77)
    state, metrics, _ = tr._train_step(tr.state, tr.frozen_params, db,
                                       jax.random.key(0))
    assert np.isfinite(float(jax.device_get(metrics["loss"])))

    ctx = tr._context(tr.frozen_params, db)
    assert ctx.shape == (8, 77, 16)


def test_learnable_queries(tmp_path):
    """'learnable' builds object queries inside the UNet; no external
    context needed (reference descriptors.py:97-99, unet.py:38-40)."""
    spec = get_image_descriptors("learnable", num_queries=4)
    ucfg = UNetConfig(**{**CROSS_UNET.__dict__, "num_object_queries": 4})
    tr, batch = _trainer(tmp_path, spec, unet_cfg=ucfg)
    tr.init_state(batch)
    assert "object_queries" in tr.state.params["params"]
    db = shard_batch(tr.mesh, tr._device_batch(batch))
    state, metrics, _ = tr._train_step(tr.state, tr.frozen_params, db,
                                       jax.random.key(0))
    assert np.isfinite(float(jax.device_get(metrics["loss"])))


def test_cfg_scale_one_is_identity():
    """cfg(scale=1) == cond prediction exactly."""
    cond_fn = lambda lat, c, t: lat * 2.0  # noqa: E731
    uncond_fn = lambda lat, c, t: lat * -1.0  # noqa: E731
    fn = cfg_model_fn(cond_fn, uncond_fn, 1.0)
    x = jnp.arange(8.0).reshape(2, 4)
    np.testing.assert_allclose(np.asarray(fn(x, None, 0)),
                               np.asarray(cond_fn(x, None, 0)), rtol=1e-6)


def test_cfg_changes_samples(tmp_path):
    """guidance_scale > 1 produces different samples than scale 1, with
    identical rng; scale 1 bypasses the uncond branch entirely."""
    spec = DescriptorSpec(kind="none", use_cross_attention=True)
    tr, batch = _trainer(tmp_path, spec)
    batch["context"] = np.random.RandomState(1).randn(
        8, 4, 16).astype(np.float32)
    tr.init_state(batch)

    _, x0_nocfg = tr.sample_panoptic(batch, jax.random.key(7),
                                     num_inference_steps=2,
                                     guidance_scale=1.0)
    _, x0_cfg = tr.sample_panoptic(batch, jax.random.key(7),
                                   num_inference_steps=2,
                                   guidance_scale=3.0)
    assert not np.allclose(np.asarray(x0_nocfg), np.asarray(x0_cfg))

    # deterministic: same scale + same key -> identical samples
    _, x0_cfg2 = tr.sample_panoptic(batch, jax.random.key(7),
                                    num_inference_steps=2,
                                    guidance_scale=3.0)
    np.testing.assert_allclose(np.asarray(x0_cfg), np.asarray(x0_cfg2))


def test_cond_noise_level_changes_training(tmp_path):
    """cond_noise_level noises the self-conditioning channel (reference
    trainers_ldm_cond.py:579-585) — the config knob must not be a no-op."""
    unet12 = UNetConfig(
        in_channels=12, out_channels=4, block_out_channels=(8, 16, 16, 32),
        layers_per_block=1, cross_attention_dim=16, attention_head_dim=2,
        norm_num_groups=4, use_cross_attention=False)
    losses = []
    for lvl in (0, 400):
        spec = DescriptorSpec(kind="remove", use_cross_attention=False)
        tr, batch = _trainer(
            tmp_path, spec, unet_cfg=unet12,
            cfg_over={"train_kwargs": {"self_condition": True,
                                       "cond_noise_level": lvl}})
        tr.init_state(batch, seed=0)
        db = shard_batch(tr.mesh, tr._device_batch(batch))
        _, metrics, _ = tr._train_step(tr.state, tr.frozen_params, db,
                                       jax.random.key(3))
        losses.append(float(jax.device_get(metrics["loss"])))
    assert np.isfinite(losses).all()
    assert losses[0] != losses[1]


def test_clip_sampling_text_token_flattening(tmp_path):
    """Clip sampling accepts descriptor tokens per CLIP ([B, 77]) or
    already flattened per FRAME ([B*T, 77]); per-clip tokens repeat per
    frame and both forms sample identically (regression: the flat form
    used to be re-repeated to B*T*T)."""
    transformers = pytest.importorskip("transformers")
    from ldmseg_tpu.data.video import ClipDataset

    cfgc = transformers.CLIPTextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=77)
    model = transformers.FlaxCLIPTextModel(cfgc, seed=0)
    spec = DescriptorSpec(kind="clip_text", use_cross_attention=True,
                          model=model)
    base = SyntheticDVPS(length=6, size=(64, 128), num_classes=20,
                         frames_per_scene=3)
    clips = ClipDataset(base, clip_len=3)
    cfg = merge_dicts(SMALL, {"train_kwargs": {"batch_size": 2}})
    tr = TrainerDiffusion(cfg, unet_config=CROSS_UNET, dataset=clips,
                          val_dataset=base, results_folder=str(tmp_path),
                          descriptor=spec)
    batch = next(iter(Loader(clips, 2, shuffle=False)))
    tr.init_state(batch)

    toks = np.random.RandomState(0).randint(
        0, 64, size=(2, 77)).astype(np.int32)
    batch["text_tokens"] = toks
    _, x0_clip = tr.sample_panoptic_clip(
        batch, jax.random.key(1), num_inference_steps=2, pose_warp=False,
        guidance_scale=1.0)

    flat = dict(batch)
    flat["text_tokens"] = np.repeat(toks, 3, axis=0)  # [B*T, 77]
    _, x0_flat = tr.sample_panoptic_clip(
        flat, jax.random.key(1), num_inference_steps=2, pose_warp=False,
        guidance_scale=1.0)
    np.testing.assert_allclose(np.asarray(x0_clip), np.asarray(x0_flat),
                               rtol=1e-4, atol=1e-5)


def test_clip_sampling_with_conditioning(tmp_path):
    """sample_panoptic_clip threads the descriptor context + CFG per
    flattened frame (regression: the clip path used to hardcode
    context=None, crashing conditioned models)."""
    from ldmseg_tpu.data.video import ClipDataset

    spec = DescriptorSpec(kind="none", use_cross_attention=True)
    base = SyntheticDVPS(length=6, size=(64, 128), num_classes=20,
                         frames_per_scene=3)
    clips = ClipDataset(base, clip_len=3)
    cfg = merge_dicts(SMALL, {"train_kwargs": {"batch_size": 2}})
    tr = TrainerDiffusion(cfg, unet_config=CROSS_UNET, dataset=clips,
                          val_dataset=base, results_folder=str(tmp_path),
                          descriptor=spec)
    batch = next(iter(Loader(clips, 2, shuffle=False)))
    tr.init_state(batch)
    batch["context"] = np.random.RandomState(0).randn(
        2, 4, 16).astype(np.float32)  # per clip, repeated per frame

    logits, x0 = tr.sample_panoptic_clip(
        batch, jax.random.key(1), num_inference_steps=2,
        pose_warp=False, guidance_scale=1.0)
    assert np.isfinite(np.asarray(x0)).all()
    assert x0.shape[0] == 2 * 3  # flattened frames

    # context reaches the sampler: different context -> different x0
    batch2 = dict(batch)
    batch2["context"] = batch["context"] + 5.0
    _, x0b = tr.sample_panoptic_clip(
        batch2, jax.random.key(1), num_inference_steps=2,
        pose_warp=False, guidance_scale=1.0)
    assert not np.allclose(np.asarray(x0), np.asarray(x0b))

    # CFG on the clip path runs and changes the samples
    _, x0c = tr.sample_panoptic_clip(
        batch, jax.random.key(1), num_inference_steps=2,
        pose_warp=False, guidance_scale=3.0)
    assert np.isfinite(np.asarray(x0c)).all()
    assert not np.allclose(np.asarray(x0), np.asarray(x0c))
