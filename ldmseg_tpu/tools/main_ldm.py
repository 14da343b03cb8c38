"""Stage-2 LDM training entry point.

Mirrors tools/main_ldm.py: builds the frozen RGB VAE (SD AutoencoderKL
encoder), the stage-1 seg VAE (optionally from a checkpoint), the surgered
UNet (conv_in expansion, cross-attn removal per ``image_descriptors``),
the DDIM schedule, and runs TrainerDiffusion.

SD-1.4 weights load from a LOCAL diffusers checkpoint directory via
``models/torch_import.py`` (zero-egress environment — no downloads);
without weights the models start from random init (useful for pipeline
smoke runs and scratch training).
"""

from __future__ import annotations

import sys

from .main_ae import DATASET_PRESETS, build_datasets


def build_unet_config(cfg):
    """UNetConfig from the run config's ``model_kwargs`` size overrides
    (the reference pins SD-1.4; these allow scratch-scale / smoke runs);
    None -> the trainer builds the SD-1.4-sized default. Shared with
    ``tools/export_checkpoint.py`` so an exported run rebuilds the exact
    same tree."""
    from ldmseg_tpu.models import UNetConfig
    mk = cfg["model_kwargs"]
    if "block_out_channels" not in mk:
        return None
    return UNetConfig(
        in_channels=mk.get("in_channels", 8) + mk.get("cond_channels", 0),
        out_channels=4,
        block_out_channels=tuple(mk["block_out_channels"]),
        layers_per_block=mk.get("layers_per_block", 2),
        cross_attention_dim=mk.get("cross_attention_dim", 768),
        attention_head_dim=mk.get("attention_head_dim", 8),
        norm_num_groups=mk.get("norm_num_groups", 32),
        use_cross_attention=(
            cfg["train_kwargs"].get("image_descriptors",
                                    "remove") != "remove"),
        cond_channels=mk.get("cond_channels", 0),
        gradient_checkpointing=cfg["train_kwargs"].get(
            "gradient_checkpointing", False),
        use_fused_attention=cfg["train_kwargs"].get(
            "fused_attention", True),
    )


def main(argv=None):
    from ldmseg_tpu.utils.config import (
        load_config, parse_dot_overrides, prepare_config, merge_dicts)
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.models import UNetConfig, expand_conv_in

    argv = argv if argv is not None else sys.argv[1:]
    overrides = parse_dot_overrides(argv)
    dataset = overrides.pop("datasets", "synthetic")
    config_path = overrides.pop("config", None)
    prefix = overrides.pop("data_prefix", None)
    output_dir = overrides.pop("output_dir", "/tmp/ldmseg_tpu_ldm")
    run_idx = overrides.pop("run_idx", -1)

    cfg = load_config(config_path)
    cfg = merge_dicts(cfg, DATASET_PRESETS.get(dataset, {}))
    cfg = merge_dicts(cfg, overrides)
    cfg = prepare_config(cfg, output_dir, run_idx)
    print(f"Run dir: {cfg['output_dir']}")

    train_ds, val_ds = build_datasets(cfg, prefix)
    unet_config = build_unet_config(cfg)

    # video-clip training (stage-3: pose-consistent LDM) — wrap the frame
    # dataset into fixed-T clips; frames ride the batch axis in the
    # train step and the consistency loss ties them (trainer_ldm)
    clip_len = cfg["train_kwargs"].get("video_clips")
    if clip_len:
        from ldmseg_tpu.data.video import ClipDataset
        train_ds = ClipDataset(train_ds, clip_len=int(clip_len))
        print(f"Clip training: {len(train_ds)} clips of {clip_len}")

    trainer = TrainerDiffusion(cfg, unet_config=unet_config,
                               dataset=train_ds, val_dataset=val_ds,
                               results_folder=cfg["checkpoint_dir"])

    # stage-3 handoff: adopt a trained pose net (main_pose.py) for the
    # temporal-consistency loss + pose-warped clip sampling
    pk = cfg.get("pose_model_kwargs") or {}
    if pk.get("pretrained_path"):
        import orbax.checkpoint as ocp
        from ldmseg_tpu.models import PoseExpNet
        restored = ocp.StandardCheckpointer().restore(
            pk["pretrained_path"])
        nb_ref = int(pk.get("nb_ref_imgs")
                     or int(restored.get("nb_ref", 2)))
        trainer.attach_pose(PoseExpNet(nb_ref_imgs=nb_ref),
                            restored["params"])
        print(f"Attached pose net ({nb_ref} ref frames) from "
              f"{pk['pretrained_path']}")

    # ----- weight ingestion (main_ldm.py:138-169) -----
    unet_params = None
    vae_img_params = None
    pretrained = cfg.get("pretrained_model_path")
    if pretrained:
        from ldmseg_tpu.models.torch_import import (
            load_diffusers_unet, load_diffusers_vae)
        mk = cfg["model_kwargs"]
        unet_params = load_diffusers_unet(
            pretrained, trainer.unet_config)
        unet_params = expand_conv_in(
            unet_params,
            init_mode_seg=mk.get("init_mode_seg", "copy"),
            init_mode_image=mk.get("init_mode_image", "zero"),
            cond_channels=mk.get("cond_channels", 0),
            init_mode_cond=mk.get("init_mode_cond", "zero"))
        vae_img_params = load_diffusers_vae(pretrained,
                                            decoder_enabled=False)

    vae_seg_params = None
    seg_path = cfg["vae_model_kwargs"].get("pretrained_path")
    if seg_path:
        # stage-1 -> stage-2 handoff (vae.py:117-122): orbax checkpoint
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(seg_path)
        vae_seg_params = restored["params"]

    # warm-start / eval from a full reference stage-2 torch save dict
    # (construct_save_dict, trainers_ldm_cond.py:1844-1877)
    ref_ldm = cfg.get("pretrained_ldm_path")
    if ref_ldm:
        from ldmseg_tpu.models.torch_import import load_reference_ldm
        vk = cfg["vae_model_kwargs"]
        loaded = load_reference_ldm(
            ref_ldm, trainer.unet_config,
            block_out_channels=tuple(vk["block_out_channels"]),
            num_upscalers=vk.get("num_upscalers", 1))
        unet_params = loaded["ema"] or loaded["unet"]
        vae_img_params = loaded["vae_image"]
        vae_seg_params = loaded["vae_semseg"]
        print(f"Loaded reference LDM checkpoint {ref_ldm} "
              f"(step {loaded['step']}, ema={'yes' if loaded['ema'] else 'no'})")

    from ldmseg_tpu.data import Loader
    batch = next(iter(Loader(train_ds, cfg["train_kwargs"]["batch_size"],
                             shuffle=False)))
    trainer.init_state(batch, unet_params=unet_params,
                       vae_seg_params=vae_seg_params,
                       vae_img_params=vae_img_params)
    trainer.resume()

    if cfg.get("eval_only"):
        print(trainer.compute_pq(max_batches=8))
        return

    # eval-before-train smoke test (trainers_ldm_cond.py:922-923)
    if cfg.get("eval_first", True):
        print("step-0 eval:", trainer.compute_metrics(
            max_batches=1, num_inference_steps=5))

    trainer.train_loop()
    trainer.save()
    print(trainer.compute_pq(max_batches=4, save_model=True))


if __name__ == "__main__":
    main()
