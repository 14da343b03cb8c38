"""Flagship-scale dress rehearsal of the REAL TrainerDiffusion on TPU.

Runs the canonical stage-2 workload (reference
tools/scripts/train_diffusion.sh:1-43 + trainers_ldm_cond.py:792-902) at
SD-1.4 size through the config path: 815M UNet (self-conditioning double
forward, cond_channels=4), frozen SD-width RGB VAE encodes per batch,
seg-VAE encodes, SNR-weighted loss, AdamW + cosine schedule + frozen
time_embedding, bf16 compute on fp32 masters, gradient checkpointing —
NOT bench.py's reduced UNet-only MSE probe.

Phases:
  1. compile + warmup (3 steps)
  2. timed steady-state train steps  -> samples/s/chip
  3. orbax save -> fresh trainer -> resume -> param/step parity check
  4. a few post-resume steps + a short sample_panoptic (bf16 path)

Emits one JSON line with the measured numbers. Designed for the 16 GB
v5e: batch via LDMSEG_DRESS_BATCH (default 16; drop to 8 on OOM).

Usage (from /root/repo, real TPU):
    python -m ldmseg_tpu.tools.perf.dress_rehearsal
"""

import json
import os
import time

import numpy as np


def canonical_setup(batch: int, h: int, w: int, tiny: bool = False):
    """(cfg, unet_config) for the canonical stage-2 workload — the
    reference train_diffusion.sh knobs mapped to TPU (fp16 -> bf16).
    Shared by this rehearsal and bench.py's real-trainer train probe so
    both compile the SAME executable (one .jax_cache entry)."""
    from ldmseg_tpu.utils.config import load_config, merge_dicts
    from ldmseg_tpu.tools.main_ae import DATASET_PRESETS

    cfg = load_config(None)
    cfg = merge_dicts(cfg, DATASET_PRESETS["synthetic"])
    cfg = merge_dicts(cfg, {
        "train_kwargs": {
            "batch_size": batch,
            "train_num_steps": 10**6,
            "self_condition": True,
            "weight_dtype": "bfloat16",
            "gradient_checkpointing": True,
            "clip_grad": 1.0,
            "ohem_ratio": 1.0,
        },
        "model_kwargs": {"cond_channels": 4},
        "noise_scheduler_kwargs": {"prediction_type": "epsilon",
                                   "weight": "max_clamp_snr",
                                   "max_snr": 2.0},
        "optimizer_name": "adamw",
        "optimizer_kwargs": {"lr": 1.0e-4, "weight_decay": 0.05},
        "optimizer_zero_redundancy": True,
        "lr_scheduler_name": "cosine",
        "vae_model_kwargs": {"num_upscalers": 2, "num_mid_blocks": 0,
                             "scaling_factor": 0.18215,
                             "parametrization": "gaussian"},
        "transformation_kwargs": {"size": h, "size_2": w},
        "eval_kwargs": {"eval_every": None},
    })
    unet_config = None  # None -> the SD-1.4-sized trainer default
    if tiny:
        from ldmseg_tpu.models import UNetConfig
        unet_config = UNetConfig(
            in_channels=12, out_channels=4, cond_channels=4,
            block_out_channels=(8, 16, 16, 32), layers_per_block=1,
            cross_attention_dim=16, attention_head_dim=2,
            norm_num_groups=4, use_cross_attention=False,
            gradient_checkpointing=True)
        cfg = merge_dicts(cfg, {
            "vae_model_kwargs": {"in_channels": 10, "out_channels": 32,
                                 "block_out_channels": [8, 16, 16, 32],
                                 "norm_num_groups": 8,
                                 "upscale_channels": 32},
            "image_vae_kwargs": {"block_out_channels": [8, 16, 16, 32],
                                 "groups": 8}})
    return cfg, unet_config


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ldmseg_tpu.tools.main_ae import build_datasets
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    tiny = os.environ.get("LDMSEG_DRESS_TINY") == "1"  # CPU logic smoke
    if tiny:
        jax.config.update("jax_platforms", "cpu")
    batch = int(os.environ.get("LDMSEG_DRESS_BATCH", "4" if tiny else "16"))
    timed_steps = int(os.environ.get("LDMSEG_DRESS_STEPS",
                                     "4" if tiny else "50"))
    h, w = (64, 128) if tiny else (256, 512)

    cfg, unet_config = canonical_setup(batch, h, w, tiny=tiny)

    ckpt_dir = os.environ.get("LDMSEG_DRESS_DIR", "/tmp/ldmseg_dress")
    os.system(f"rm -rf {ckpt_dir}")

    train_ds, _ = build_datasets(cfg, None)
    print(f"dress rehearsal: {'tiny' if tiny else 'SD-1.4'} UNet, "
          f"self-cond, adamw, bf16-on-fp32, remat, batch {batch} @ "
          f"{h}x{w}", flush=True)

    trainer = TrainerDiffusion(cfg, unet_config=unet_config,
                               dataset=train_ds, val_dataset=None,
                               results_folder=ckpt_dir)

    from ldmseg_tpu.data import Loader
    first = next(iter(Loader(train_ds, batch, shuffle=False)))
    t0 = time.perf_counter()
    trainer.init_state(first)
    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(trainer.state.params))
    t_init = time.perf_counter() - t0
    print(f"init: {n_params/1e6:.0f}M UNet params in {t_init:.1f}s",
          flush=True)

    def sync():
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        np.asarray(leaf.ravel()[0])  # real fetch; block_until_ready lies

    # phase 1: compile + warmup
    t0 = time.perf_counter()
    trainer.train_loop(max_steps=3, log_every=100, save_every=10**9)
    sync()
    t_compile = time.perf_counter() - t0
    print(f"compile+3 warmup steps: {t_compile:.1f}s", flush=True)

    # phase 2: steady-state through the REAL train_loop (includes the
    # host input pipeline — on this 1-CPU VM the loader, not the chip,
    # can bound this; see phase 2b for the device-only rate)
    t0 = time.perf_counter()
    trainer.train_loop(max_steps=3 + timed_steps, log_every=10**6,
                       save_every=10**9)
    sync()
    dt = (time.perf_counter() - t0) / timed_steps
    sps = batch / dt
    print(f"steady state (loop, incl. host pipeline): {dt*1e3:.1f} "
          f"ms/step -> {sps:.2f} samples/s/chip over {timed_steps} "
          f"steps", flush=True)

    # phase 2b: device-only rate — the SAME compiled _train_step on a
    # fixed pre-sharded batch, async-dispatched (host collate excluded).
    # This is the number comparable to bench.py's train probes.
    import jax.numpy as jnp
    from ldmseg_tpu.parallel import shard_batch
    db = shard_batch(trainer.mesh, {
        k: jnp.asarray(v) for k, v in
        trainer._device_batch(first).items()})
    import jax as _jax
    key = _jax.random.key(123)
    key, sub = _jax.random.split(key)
    trainer.state, m, _ = trainer._train_step(
        trainer.state, trainer.frozen_params, db, sub)
    np.asarray(m["loss"])
    dev_iters = max(5, timed_steps // 2)
    t0 = time.perf_counter()
    for _ in range(dev_iters):
        key, sub = _jax.random.split(key)
        trainer.state, m, _ = trainer._train_step(
            trainer.state, trainer.frozen_params, db, sub)
    np.asarray(m["loss"])
    dev_dt = (time.perf_counter() - t0) / dev_iters
    dev_sps = batch / dev_dt
    print(f"steady state (device-only): {dev_dt*1e3:.1f} ms/step -> "
          f"{dev_sps:.2f} samples/s/chip over {dev_iters} steps",
          flush=True)

    # phase 3: orbax save/resume round-trip at scale
    t0 = time.perf_counter()
    path = trainer.save()
    t_save = time.perf_counter() - t0
    step_before = int(trainer.state.step)
    leaf_before = np.asarray(
        jax.tree_util.tree_leaves(trainer.state.params)[0]).ravel()[:8]

    # the restart trainer allocates its own fp32 masters + adamw moments
    # (~10 GB at 816M params); two full train states do NOT fit on the
    # 16 GB v5e — release the first trainer's device buffers first
    # (observed RESOURCE_EXHAUSTED without this)
    import gc
    trainer.state = None
    trainer.frozen_params = None
    del db, m
    gc.collect()

    trainer2 = TrainerDiffusion(cfg, unet_config=unet_config,
                                dataset=train_ds, val_dataset=None,
                                results_folder=ckpt_dir)
    trainer2.init_state(first)
    t0 = time.perf_counter()
    trainer2.resume(path)
    t_resume = time.perf_counter() - t0
    assert int(trainer2.state.step) == step_before, (
        int(trainer2.state.step), step_before)
    leaf_after = np.asarray(
        jax.tree_util.tree_leaves(trainer2.state.params)[0]).ravel()[:8]
    np.testing.assert_array_equal(leaf_before, leaf_after)
    print(f"save {t_save:.1f}s / resume {t_resume:.1f}s OK "
          f"(step {step_before}, params bit-equal)", flush=True)

    # phase 4: continue training on the resumed state + a short sample
    trainer2.train_loop(max_steps=step_before + 5, log_every=100,
                        save_every=10**9)
    assert int(trainer2.state.step) == step_before + 5
    t0 = time.perf_counter()
    logits, _ = trainer2.sample_panoptic(first, jax.random.key(0),
                                         num_inference_steps=10)
    np.asarray(logits.ravel()[0])
    t_sample = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(logits[:1])))
    print(f"post-resume 5 steps + 10-step sample OK "
          f"({t_sample:.1f}s incl. compile)", flush=True)

    print(json.dumps({
        "metric": "dress_rehearsal_train_samples_per_sec_per_chip",
        "value": round(dev_sps, 3),
        "unit": "samples/s",
        "batch": batch, "hw": [h, w],
        "step_ms_device": round(dev_dt * 1e3, 1),
        "loop_samples_per_sec_incl_host": round(sps, 3),
        "step_ms": round(dt * 1e3, 1),
        "unet_params_m": round(n_params / 1e6, 1),
        "compile_s": round(t_compile, 1),
        "save_s": round(t_save, 1),
        "resume_s": round(t_resume, 1),
        "config": "canonical train_diffusion.sh (self-cond, adamw, "
                  "remat, bf16-on-fp32-masters, frozen time_embedding)",
    }), flush=True)


if __name__ == "__main__":
    main()
