"""Config system.

Mirrors the reference's hydra/omegaconf surface (ldmseg/utils/config.py +
tools/configs/base/base.yaml:1-185) with the SAME key names, as plain
dicts + YAML files: ``load_config`` composes base + dataset + overrides by
dict union (main_ldm.py:43,:47) and ``prepare_config`` creates the
timestamped ``run_<idx>`` output tree (config.py:73-98).
"""

from __future__ import annotations

import copy
import datetime
import os
from typing import Optional

# Key-for-key mirror of tools/configs/base/base.yaml:1-185.
DEFAULT_CONFIG: dict = {
    "pretrained_model_path": None,
    "wandb": False,
    "eval_only": False,
    "load_path": None,
    "image_scaling_factor": 0.18215,
    "shared_vae_encoder": False,
    "vae_model_kwargs": {
        "in_channels": 16,
        "int_channels": 256,
        "out_channels": 128,
        "block_out_channels": [32, 64, 128, 256],
        "latent_channels": 4,
        "num_latents": 2,
        "num_upscalers": 2,
        "upscale_channels": 256,
        "norm_num_groups": 32,
        "scaling_factor": 0.2,
        "parametrization": "gaussian",
        "act_fn": "none",
        "clamp_output": False,
        "freeze_codebook": False,
        "num_mid_blocks": 0,
        "fuse_rgb": False,
        "resize_input": False,
        "skip_encoder": False,
        "pretrained_path": None,
    },
    "backbone": "unet",
    "model_kwargs": {
        "in_channels": 8,
        "init_mode_seg": "copy",
        "init_mode_image": "zero",
        "cond_channels": 0,
        "separate_conv": False,
        "separate_encoder": False,
        "add_adaptor": False,
        "init_mode_adaptor": "random",
    },
    "noise_scheduler_kwargs": {
        "prediction_type": "epsilon",
        "beta_schedule": "scaled_linear",
        "num_train_timesteps": 1000,
        "beta_start": 0.00085,
        "beta_end": 0.012,
        "steps_offset": 1,
        "clip_sample": False,
        "set_alpha_to_one": False,
        "thresholding": False,
        "dynamic_thresholding_ratio": 0.995,
        "clip_sample_range": 1.0,
        "sample_max_value": 1.0,
        "weight": "none",
        "max_snr": 5.0,
    },
    "train_kwargs": {
        "dropout": 0.0,
        "inpaint_mask_size": [64, 64],
        "type_mask": "ignore",
        "latent_mask": False,
        "encoding_mode": "bits",
        "image_descriptors": "remove",
        "caption_type": "none",
        "caption_dropout": 1.0,
        "prob_train_on_pred": 0.0,
        "prob_inpainting": 0.0,
        "min_noise_level": 0,
        "rgb_noise_level": 0,
        "cond_noise_level": 0,
        "self_condition": False,
        "sample_posterior": False,
        "sample_posterior_rgb": False,
        "remap_seg": True,
        "train_num_steps": 24000,
        "batch_size": 8,
        "accumulate": 1,
        "num_workers": 8,
        "loss": "l2",
        "ohem_ratio": 1.0,
        "fp16": False,
        "weight_dtype": "float32",
        # CUDA/DDP-only reference knobs, accepted as no-ops so reference
        # YAMLs load unchanged (base.yaml train_kwargs): cudnn/allow_tf32
        # -> XLA controls matmul precision; use_xformers -> Pallas fused
        # attention (fused_attention below); gradient_as_bucket_view /
        # find_unused_parameters -> DDP-isms with no SPMD equivalent
        "cudnn": False,
        "use_xformers": False,
        "gradient_as_bucket_view": False,
        "allow_tf32": False,
        "find_unused_parameters": False,
        "clip_grad": 3.0,
        "freeze_layers": ["time_embedding"],
        "gradient_checkpointing": False,
        # jax.checkpoint_policies name applied at the UNet remat sites
        # when gradient_checkpointing is on (None = recompute everything,
        # the diffusers-equivalent default); e.g.
        # 'dots_with_no_batch_dims_saveable' keeps weight-matmul outputs
        "remat_policy": None,
        # Pallas attention for the training fwd/bwd (flash-style backward
        # kernel); auto-falls-back to XLA on CPU / unsupported shapes
        "fused_attention": True,
        # stage-3 video: train on T-frame clips (None = per-frame) with a
        # pose-warped latent temporal-consistency loss (trainer_ldm;
        # finishes the fork's "pose-VAE" plan, reference README.md:3-5)
        "video_clips": None,
        "temporal_consistency_weight": 0.0,
    },
    # trained pose net for the stage-3 handoff (tools/main_pose.py)
    "pose_model_kwargs": {
        "pretrained_path": None,
        "nb_ref_imgs": None,
    },
    "loss_weights": {"mask": 1.0, "ce": 1.0, "kl": 0.0},
    "loss_kwargs": {
        "num_points": 12544,
        "oversample_ratio": 3,
        "importance_sample_ratio": 0.75,
        "cost_mask": 1.0,
        "cost_class": 1.0,
        "temperature": 1.0,
        # TPU-only knob: static cap on per-image masks in the dense
        # BCE+Dice loss. Exact reference parity (every present class
        # supervised) needs max_masks >= num_classes; the default matches
        # the default 128 instance channels.
        "max_masks": 128,
    },
    "sampling_kwargs": {
        "num_inference_steps": 50,
        # "ddim" (reference parity) or "dpmpp_2m" (DPM-Solver++ 2M:
        # comparable sample quality in 2-3x fewer steps — pair with
        # num_inference_steps 15-25)
        "sampler": "ddim",
        "guidance_scale": 7.5,
        "seed": 0,
        "block_size": 2,
        "prob_mask": 0.5,
        # TPU-native int8 sampling (s8 convs + s8 attention, weights
        # pre-quantized outside the scan); training stays bf16
        "int8_inference": False,
        # static conv act scale; measure on real data with
        # ops.quant.calibrate_act_scale before deploying a checkpoint
        "int8_act_scale": 0.05,
        # static q/k/v act scale for the s8 attention kernels
        "int8_attn_act_scale": 0.1,
        # fused-norms transformer inference (LN + projections + attention
        # + residual in one padded s8 kernel, LN + GEGLU in another);
        # the fastest int8 path — disable to fall back to the flat
        # s8-attention + fused-FF pipeline
        "fused_norms": True,
        "fused_ff": True,
    },
    "eval_kwargs": {
        "mask_th": 0.5,
        "count_th": 512,
        "overlap_th": 0.5,
        "batch_size": 16,
        "num_workers": 2,
        "vis_every": 1500,
        "print_freq": 20,
        # periodic in-training eval with best-PQ snapshot (reference
        # cadence trainers_ldm_cond.py:922-923, :1366-1373); None = only
        # from the CLI after training
        "eval_every": None,
    },
    "optimizer_name": "adamw",
    "optimizer_kwargs": {
        "lr": 1.0e-4,
        "betas": [0.9, 0.999],
        "weight_decay": 0.0,
        "weight_decay_norm": 0.0,
    },
    "optimizer_zero_redundancy": False,
    # TPU-native extensions (no reference equivalent): shard UNet params
    # col/row-parallel over the model axis; H-shard the full-res VAE
    # stages over the model axis (parallel/tp.py, parallel/sp.py)
    "tensor_parallel": False,
    "spatial_parallel": False,
    "optimizer_backbone_multiplier": 1.0,
    "optimizer_save_optim": False,
    "ema_on": False,
    # 'device' accepted as a no-op (reference offloads EMA to cuda/cpu;
    # on-device EMA here — PARITY.md EMA row)
    "ema_kwargs": {"decay": 0.9999, "device": "tpu"},
    "lr_scheduler_name": "warmup",
    "lr_scheduler_kwargs": {"final_lr": 0.000001, "warmup_iters": 200},
    "transformation_kwargs": {
        "type": "crop_resize_pil",
        "size": 192,
        "size_2": 640,
        "size_rgb": 192,
        "size_rgb_2": 640,
        "max_size": 640,
        "flip": True,
        "normalize": True,
        # mean/std for the RGB normalize (reference dataset_base.py:19-42
        # T.Normalize(**normalize_params); same values kitti.py:123-125
        # hardcodes)
        "normalize_params": {"mean": [0.485, 0.456, 0.406],
                             "std": [0.229, 0.224, 0.225]},
        # accepted for reference-config compat; dead in the reference too
        # (base.yaml declares them but no transform consumes them —
        # dataset_base.py only reads type/size*/flip/normalize*)
        "scales": [352, 384, 416, 448, 480, 512, 544, 576, 608, 640],
        "min_scale": 0.5,
        "max_scale": 1.5,
        "pad_value": 0,
    },
    "train_db_name": "kitti",
    "val_db_name": "kitti",
    "split": "val",
    "num_classes": 128,
    "num_bits": 16,
    "has_bg": False,
    "ignore_label": 127,
    "fill_value": 0.5,
    "inpainting_strength": 0.0,
}


def merge_dicts(base: dict, override: dict) -> dict:
    """Recursive dict union, override wins (main_ldm.py:43 ``cfg | cfg_ds``
    but deep)."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_config(path: Optional[str] = None,
                overrides: Optional[dict] = None) -> dict:
    """Compose DEFAULT_CONFIG (+ optional YAML file) (+ overrides)."""
    cfg = copy.deepcopy(DEFAULT_CONFIG)
    if path is not None:
        import yaml
        with open(path) as f:
            cfg = merge_dicts(cfg, yaml.safe_load(f) or {})
    if overrides:
        cfg = merge_dicts(cfg, overrides)
    return cfg


def parse_dot_overrides(args: list[str]) -> dict:
    """CLI ``a.b.c=value`` overrides (the scripts' hydra style,
    tools/scripts/train_diffusion.sh:6-43)."""
    import ast
    out: dict = {}
    for arg in args:
        if "=" not in arg:
            continue
        key, val = arg.split("=", 1)
        try:
            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def prepare_config(cfg: dict, output_dir: str, run_idx: int = -1) -> dict:
    """Create the run directory tree (reference config.py:73-98):
    ``run_idx=-1`` -> timestamped dir; returns cfg with ``output_dir`` /
    ``checkpoint_dir`` / ``log_dir`` set."""
    cfg = copy.deepcopy(cfg)
    if run_idx == -1:
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        run_name = f"run_{stamp}"
    else:
        run_name = f"run_{run_idx}"
    root = os.path.join(output_dir, run_name)
    cfg["output_dir"] = root
    cfg["checkpoint_dir"] = os.path.join(root, "checkpoints")
    cfg["log_dir"] = os.path.join(root, "logs")
    for d in (root, cfg["checkpoint_dir"], cfg["log_dir"]):
        os.makedirs(d, exist_ok=True)
    # persist the composed config (hydra runs save theirs too); lets
    # tools like export_checkpoint rebuild the trainer from a run dir
    import json
    with open(os.path.join(root, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1, default=str)
    return cfg
