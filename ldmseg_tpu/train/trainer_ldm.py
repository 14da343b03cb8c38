"""Stage-2 latent-diffusion trainer.

Reference: ldmseg/trainers/trainers_ldm_cond.py (``TrainerDiffusion``).
The design maps the reference's hot path onto three jitted programs:

  * ``encode_step``  — frozen seg/RGB VAE encoders -> latents + loss mask
                       (process_inputs, :679-767)
  * ``train_step``   — noise/timestep draw, optional self-conditioning
                       double-forward (stop-grad, :824-833), concat
                       [noisy, rgb(, cond)] -> UNet -> masked MSE x SNR
                       weights x OHEM (compute_loss, :530-619), optax
                       update of the UNet only
  * ``sample_step``  — the full 50-step DDIM loop as one lax.scan
                       (sample, :1049-1173) + seg-VAE decode
                       (decode_latents, :399-427)

Deliberate fixes vs the reference (SURVEY §7): latents keep their true
non-square shape (the reference resizes to (latent_size, latent_size),
:381-392); sampling noise matches the rgb-latent spatial shape (:1092).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import SegVAE, ImageVAE, UNet2DCondition, UNetConfig
from ..diffusion import (
    make_ddim_schedule, add_noise, remove_noise, ddim_sample,
    dpmpp_2m_sample)
from ..losses import diffusion_loss
from ..parallel import make_mesh, replicate
from ..utils.meters import AverageMeter, ProgressMeter
from .optim import make_optimizer, make_lr_schedule
from .state import TrainState, cast_f32 as _cast_f32


class TrainerDiffusion:
    def __init__(self, p: dict, unet_config: Optional[UNetConfig] = None,
                 dataset=None, val_dataset=None, mesh=None,
                 results_folder: Optional[str] = None, descriptor=None):
        self.p = p
        tk = p["train_kwargs"]
        vk = dict(p["vae_model_kwargs"])
        vk.pop("pretrained_path", None)
        vk["block_out_channels"] = tuple(vk["block_out_channels"])
        self.vae_seg = SegVAE(**vk)
        # frozen RGB VAE: SD AutoencoderKL-sized by default (the
        # reference loads the pretrained SD VAE, main_ldm.py:165-169);
        # image_vae_kwargs shrinks it for smoke tests/dryruns where the
        # full 512-channel encoder dominates compile time
        ivk = dict(p.get("image_vae_kwargs") or {})
        ivk.setdefault("decoder_enabled", False)
        if "block_out_channels" in ivk:
            ivk["block_out_channels"] = tuple(ivk["block_out_channels"])
        self.vae_img = ImageVAE(**ivk)
        self.seg_scale = vk.get("scaling_factor", 0.2)
        self.img_scale = p.get("image_scaling_factor", 0.18215)
        self.num_classes = vk["out_channels"]
        self.ignore_label = p["ignore_label"]

        mk = p["model_kwargs"]
        self.self_condition = tk.get("self_condition", False)
        cond_channels = mk.get("cond_channels", 0)
        if self.self_condition and cond_channels == 0:
            # the reference requires cond_channels=4 alongside
            # self_condition (train_diffusion.sh); auto-correct here
            cond_channels = 4
        in_ch = mk.get("in_channels", 8) + cond_channels

        # conditioning descriptor (reference get_image_descriptor_model,
        # descriptors.py:67-105; wired through process_inputs :722-735)
        from ..models.descriptors import get_image_descriptors
        if descriptor is None:
            descriptor = get_image_descriptors(
                tk.get("image_descriptors", "remove"),
                pretrained_path=p.get("descriptor_pretrained_path"))
        self.descriptor = descriptor

        if unet_config is None:
            unet_config = UNetConfig(
                in_channels=in_ch,
                use_cross_attention=descriptor.use_cross_attention,
                num_object_queries=descriptor.num_object_queries,
                encoder_hid_dim=descriptor.encoder_hid_dim,
                cond_channels=cond_channels,
                separate_conv=mk.get("separate_conv", False),
                separate_encoder=mk.get("separate_encoder", False),
                add_adaptor=mk.get("add_adaptor", False),
                dropout=tk.get("dropout", 0.0),
                gradient_checkpointing=tk.get("gradient_checkpointing",
                                              False),
                remat_policy=tk.get("remat_policy"),
                # Pallas VMEM-softmax self-attention for the TRAINING
                # forward/backward too (flash-style bwd kernel — no HBM
                # score round-trips); falls back to XLA on CPU and on
                # unsupported shapes
                use_fused_attention=tk.get("fused_attention", True),
            )
        self.unet_config = unet_config
        self.unet = UNet2DCondition(config=unet_config)

        nk = p["noise_scheduler_kwargs"]
        self.sched = make_ddim_schedule(**nk)
        self.min_noise_level = tk.get("min_noise_level", 0)
        self.rgb_noise_level = tk.get("rgb_noise_level", 0)
        self.cond_noise_level = tk.get("cond_noise_level", 0)
        self.prob_train_on_pred = tk.get("prob_train_on_pred", 0.0)
        self.prob_inpainting = tk.get("prob_inpainting", 0.0)
        # pose-consistent video training/sampling (the fork's stated but
        # unfinished goal, reference README.md:3-5; wired via attach_pose)
        self.temporal_consistency_weight = tk.get(
            "temporal_consistency_weight", 0.0)
        self.pose_model = None
        self._pending_pose_params = None
        self.type_mask = tk.get("type_mask", "ignore")
        self.loss_type = tk.get("loss", "l2")
        self.ohem_ratio = tk.get("ohem_ratio", 1.0)
        self.sample_posterior = tk.get("sample_posterior", False)
        self.sample_posterior_rgb = tk.get("sample_posterior_rgb", False)
        self.batch_size = tk["batch_size"]
        self.train_num_steps = tk["train_num_steps"]
        # "float16" (the reference's AMP dtype, train_diffusion.sh) maps
        # to bf16 — the TPU-native mixed-precision dtype. Master params
        # stay fp32; _unet_apply casts a bf16 working copy per step (the
        # torch autocast equivalent — without the cast, flax promotes
        # fp32 params x bf16 inputs to an fp32 forward and the MXU runs
        # at half rate; caught by the r5 flagship dress rehearsal).
        self.compute_dtype = jnp.bfloat16 if tk.get("weight_dtype") in \
            ("bfloat16", "float16") else jnp.float32

        ek = p["eval_kwargs"]
        self.mask_th = ek.get("mask_th", 0.5)
        self.count_th = ek.get("count_th", 512)
        self.overlap_th = ek.get("overlap_th", 0.5)
        sk = p["sampling_kwargs"]
        self.num_inference_steps = sk.get("num_inference_steps", 50)
        # "ddim" (reference parity) or "dpmpp_2m" (diffusion/dpm.py:
        # 2nd-order multistep — comparable quality in 2-3x fewer steps)
        self.sampler = sk.get("sampler", "ddim")
        assert self.sampler in ("ddim", "dpmpp_2m"), self.sampler
        # CFG (reference sample :1147-1149 + guidance_scale base.yaml:118);
        # inactive unless the descriptor produces a context
        self.guidance_scale = float(sk.get("guidance_scale", 1.0))
        # int8 inference (TPU-native, no reference counterpart): sampling
        # runs the s8-conv/s8-attention UNet on weights pre-quantized
        # outside the scan; training always stays bf16. Accuracy gates in
        # tests/test_int8_inference.py; ~1.25x sampling throughput
        # (BENCH_NOTES.md round-2 table).
        self.int8_inference = bool(sk.get("int8_inference", False))
        if self.int8_inference:
            # fused-norms transformer path (round 3, the bench.py 9.14 f/s
            # config): LN1 + projections + attention + to_out + residual in
            # one padded s8 kernel, LN3 + GEGLU + residual in another —
            # the self-attn block is exactly two custom calls
            fused_norms = bool(sk.get("fused_norms", True))
            self.unet_infer = UNet2DCondition(config=dataclasses.replace(
                unet_config,
                use_int8_conv=True,
                int8_act_scale=sk.get("int8_act_scale", 0.05),
                use_int8_attention=not fused_norms,
                use_int8_ff=True,
                # fused s8 GEGLU kernel: the whole feed-forward chain in
                # one VMEM pass (-3.6 ms/fwd at b16, BENCH_NOTES r3)
                use_fused_ff=sk.get("fused_ff", True),
                use_fused_attention=not fused_norms,
                use_padded_attention=fused_norms,
                use_fused_norms=fused_norms,
                int8_attn_act_scale=sk.get("int8_attn_act_scale", 0.1)))
            from ..ops.quant import (prequantize_conv_tree,
                                     pack_inference_tiles)
            self._prequant_base = functools.partial(
                prequantize_conv_tree, quantize_ff=True,
                absorbed_attention=fused_norms,
                attention_heads=unet_config.attention_head_dim)
            # prebuild the fused-norms kernels' loop-invariant operands
            # (scale tiles, padded/transposed weights) into the tree —
            # in-graph builds re-materialize every sampling-scan step
            self._pack_tiles = (functools.partial(
                pack_inference_tiles,
                attention_heads=unet_config.attention_head_dim,
                int8_act_scale=sk.get("int8_act_scale", 0.05),
                int8_attn_act_scale=sk.get("int8_attn_act_scale", 0.1))
                if fused_norms else (lambda p: p))
            self._prequant = jax.jit(
                lambda p: self._pack_tiles(self._prequant_base(p)))
        else:
            self.unet_infer = self.unet
        # int8 act-scale state: calibrate_int8 fills these; pretrained
        # (resumed/imported) weights must not silently sample with the
        # global default scales (see _ensure_int8_ready)
        self._int8_act_scales = None
        self._params_pretrained = False

        self.mesh = mesh if mesh is not None else make_mesh()
        # spatial parallelism: H-shard the full-res VAE stages over the
        # model axis (parallel/sp.py; GSPMD inserts conv halos/GN
        # reductions). No reference equivalent — TPU-native extension.
        from ..parallel.sp import has_spatial_axis
        self.spatial_parallel = (bool(p.get("spatial_parallel", False))
                                 and has_spatial_axis(self.mesh))
        self.ds = dataset
        self.ds_val = val_dataset
        self.results_folder = results_folder or p.get("checkpoint_dir",
                                                      "/tmp/ldmseg_ldm")
        os.makedirs(self.results_folder, exist_ok=True)
        from ..utils.metrics_sink import MetricsSink
        self.metrics = MetricsSink(
            os.path.join(self.results_folder, 'metrics.jsonl'),
            use_wandb=p.get('wandb', False))

        schedule = make_lr_schedule(
            p.get("lr_scheduler_name", "warmup"),
            p["optimizer_kwargs"]["lr"],
            self.train_num_steps,
            warmup_iters=p["lr_scheduler_kwargs"].get("warmup_iters", 200),
            final_lr=p["lr_scheduler_kwargs"].get("final_lr", 1e-6),
        )
        from ..models.unet import freeze_filter
        frozen = tuple(tk.get("freeze_layers", ()))
        lr_factor = None
        if frozen:
            flt = freeze_filter(frozen)
            lr_factor = lambda path: 0.0 if flt(path) else 1.0  # noqa: E731
        self.tx = make_optimizer(
            p.get("optimizer_name", "adamw"),
            learning_rate=schedule,
            betas=tuple(p["optimizer_kwargs"].get("betas", (0.9, 0.999))),
            weight_decay=p["optimizer_kwargs"].get("weight_decay", 0.0),
            weight_decay_norm=p["optimizer_kwargs"].get("weight_decay_norm"),
            clip_grad=tk.get("clip_grad", 0.0),
            lr_factor_fn=lr_factor,
        )

        self.state: Optional[TrainState] = None
        self.frozen_params: Optional[dict] = None
        self.best_pq = -1.0

        self._encode = jax.jit(self._encode_impl)
        self._encode_rgb = jax.jit(self._encode_rgb_impl)
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,))
        self._context = jax.jit(self._context_impl)
        self._sample_decode = jax.jit(
            self._sample_decode_impl,
            static_argnames=("num_inference_steps", "repeat_noise",
                             "guidance_scale"))

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def init_state(self, sample_batch: dict, seed: int = 0,
                   unet_params=None, vae_seg_params=None,
                   vae_img_params=None):
        """Initialize (or adopt pretrained) parameter trees."""
        img = sample_batch["image"]
        # clip batches are [B, T, H, W, 3]
        h, w = img.shape[2:4] if img.ndim == 5 else img.shape[1:3]
        f = 8
        if unet_params is not None:
            # adopted (imported/handed-off) weights count as pretrained
            # for the int8 act-scale guard (_ensure_int8_ready)
            self._params_pretrained = True
        key = jax.random.key(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        if vae_img_params is None:
            vae_img_params = jax.jit(functools.partial(
                self.vae_img.init, method=ImageVAE.encode))(
                {"params": k1}, jnp.zeros((1, h, w, 3)))
        if vae_seg_params is None:
            # image-only batches (RGB-only inference) carry no bit
            # encoding; the seg-VAE input width comes from its config
            bits = (sample_batch["image_semseg"].shape[-1]
                    if "image_semseg" in sample_batch
                    else self.vae_seg.in_channels)
            vae_seg_params = jax.jit(
                functools.partial(self.vae_seg.init,
                                  sample_posterior=False))(
                {"params": k2, "sample": jax.random.key(0)},
                jnp.zeros((1, h, w, bits)))
        if unet_params is None:
            init_args = [
                jnp.zeros((1, h // f, w // f,
                           self.unet_config.in_channels)),
                jnp.zeros((1,), jnp.int32)]
            if self.unet_config.use_cross_attention:
                # to_k/to_v infer the context dim at init
                init_args.append(jnp.zeros(
                    (1, 77, self.unet_config.cross_attention_dim)))
            unet_params = jax.jit(self.unet.init)({"params": k3},
                                                  *init_args)
        frozen = {"vae_img": vae_img_params, "vae_seg": vae_seg_params}
        if self.descriptor.model is not None:
            # frozen CLIP text/vision tower (reference descriptors.py:70-93)
            frozen["descriptor"] = self.descriptor.model.params
        if self._pending_pose_params is not None:
            frozen["pose"] = self._pending_pose_params
            self._pending_pose_params = None
        # frozen towers run entirely in the compute dtype (the reference
        # keeps the RGB VAE in fp16, main_ldm.py:165-169); cast once here
        # rather than per step
        frozen = _cast_f32(frozen, self.compute_dtype)
        self.frozen_params = replicate(self.mesh, frozen)
        tp = bool(self.p.get("tensor_parallel", False)) and \
            self.mesh.shape.get("model", 1) > 1
        if tp:
            # 2-D (data, model) mesh: UNet kernels sharded col/row-parallel
            # over the model axis (parallel/tp.py); GSPMD inserts the ICI
            # collectives. Composes with ZeRO-1 (opt state takes the TP
            # spec + a data-axis shard on a free dim).
            from ..parallel.tp import apply_tp
            unet_placed = apply_tp(self.mesh, unet_params)
        else:
            unet_placed = replicate(self.mesh, unet_params)
        self.state = TrainState.create(
            unet_placed, self.tx,
            ema=self.p.get("ema_on", False), mesh=self.mesh,
            zero1=self.p.get("optimizer_zero_redundancy", False),
            accumulate=self.p["train_kwargs"].get("accumulate", 1),
            tp=tp)
        return self.state

    # ------------------------------------------------------------------
    # pose ("pose-VAE") integration — the fork's stated goal
    # (reference README.md:3-5; posenet/posenet.py:21-96 was never wired
    # into its trainers)
    # ------------------------------------------------------------------
    def attach_pose(self, pose_model, pose_params):
        """Stage-3 handoff: adopt a trained :class:`PoseExpNet` (frozen)
        for (a) the clip-training temporal-consistency loss and (b)
        pose-warped clip sampling. ``pose_model.nb_ref_imgs`` must be
        ``clip_len - 1`` (target = middle frame, refs = the rest)."""
        self.pose_model = pose_model
        if self.frozen_params is not None:
            self.frozen_params = dict(
                self.frozen_params,
                pose=replicate(self.mesh,
                               _cast_f32(pose_params, self.compute_dtype)))
        else:
            self._pending_pose_params = pose_params

    def _clip_poses(self, frozen, images_clip):
        """``[B, T, H, W, 3]`` clip -> (poses ``[B, R, 6]``, mid, ref
        frame indices). Pose net is frozen (stop-grad)."""
        t = images_clip.shape[1]
        mid = t // 2
        ref_idx = [i for i in range(t) if i != mid]
        ref_idx = ref_idx[: self.pose_model.nb_ref_imgs]
        target = images_clip[:, mid]
        refs = [images_clip[:, i] for i in ref_idx]
        _, pose = self.pose_model.apply(frozen["pose"], target, refs,
                                        train=False)
        return jax.lax.stop_gradient(pose), mid, ref_idx

    @staticmethod
    def _latent_depth_focal(depth, focal, lh, lw):
        """GT depth ``[B(, T), H, W]`` + focal ``[B]`` -> latent-res depth
        and the focal scaled by the same downsampling factor."""
        shape = depth.shape[:-2] + (lh, lw)
        d = jax.image.resize(depth.astype(jnp.float32), shape, "nearest")
        f = focal.astype(jnp.float32) * (lw / depth.shape[-1])
        return d, f

    # ------------------------------------------------------------------
    # encoding (process_inputs, :679-767)
    # ------------------------------------------------------------------
    def _encode_impl(self, frozen, batch, key):
        k_seg, k_rgb = jax.random.split(key)
        # encode in the compute dtype (frozen params are cast at init);
        # diffusion-side latents go back to fp32 for the noise math
        bits = (2.0 * batch["image_semseg"].astype(jnp.float32)
                - 1.0).astype(self.compute_dtype)
        if self.spatial_parallel:
            from ..parallel.sp import spatial_constraint
            bits = spatial_constraint(bits, self.mesh)
        post_seg = self.vae_seg.apply(frozen["vae_seg"], bits,
                                      method=SegVAE.encode)
        if self.sample_posterior:
            latents = (post_seg.sample(k_seg) *
                       self.seg_scale).astype(jnp.float32)
        else:
            latents = (post_seg.mode() *
                       self.seg_scale).astype(jnp.float32)
        latents_mean = (post_seg.mode() *
                        self.seg_scale).astype(jnp.float32)

        # RGB path runs in the compute dtype (fp16 VAE in the reference,
        # main_ldm.py:165-169 -> bf16 here); shared with RGB-only
        # inference (_encode_rgb_impl applies its own spatial layout)
        rgb_latents = self._encode_rgb_impl(frozen, batch["image"], k_rgb)

        loss_mask = self._loss_weight_mask(batch, latents.shape[1:3])
        if self.spatial_parallel:
            # latent space back to the batch-only layout so the UNet's
            # own (data, model) shardings (TP, ZeRO-1) are unaffected
            from ..parallel.sp import batch_constraint
            latents = batch_constraint(latents, self.mesh)
            latents_mean = batch_constraint(latents_mean, self.mesh)
            rgb_latents = batch_constraint(rgb_latents, self.mesh)
        return latents, latents_mean, rgb_latents, loss_mask

    def _encode_rgb_impl(self, frozen, image, key):
        """RGB-only encode: bare frames -> scaled RGB latents.

        The sampler consumes ONLY the RGB latents (reference
        trainers_ldm_cond.py:1234-1242), so deployment-mode inference on
        unlabeled video must not require any GT keys; this is the encode
        path :meth:`sample_panoptic` uses."""
        rgb = 2.0 * _unnormalize_to01(
            image).astype(self.compute_dtype) - 1.0
        if self.spatial_parallel:
            from ..parallel.sp import spatial_constraint
            rgb = spatial_constraint(rgb, self.mesh)
        post = self.vae_img.apply(frozen["vae_img"], rgb,
                                  method=ImageVAE.encode)
        lat = post.sample(key) if self.sample_posterior_rgb else post.mode()
        lat = lat.astype(jnp.float32) * self.img_scale
        if self.spatial_parallel:
            from ..parallel.sp import batch_constraint
            lat = batch_constraint(lat, self.mesh)
        return lat

    def _loss_weight_mask(self, batch, latent_hw):
        """get_loss_weight_mask (:621-663): 'ignore' / 'counts' /
        'padding' / none — vectorized."""
        lh, lw = latent_hw
        if self.type_mask == "none":
            return None
        if self.type_mask == "padding":
            src = batch["mask"].astype(jnp.float32)
        else:
            src = batch["semseg"].astype(jnp.float32)
        b = src.shape[0]
        t = jax.image.resize(src[..., None], (b, lh, lw, 1),
                             "nearest")[..., 0]
        if self.type_mask == "padding":
            return t
        if self.type_mask == "ignore":
            return (t != self.ignore_label).astype(jnp.float32)
        # 'counts': 1 / class-pixel-count per pixel, 0 at ignore. Gather
        # straight from the [B, C] table — no [B, HW, C] materialization.
        ti = t.astype(jnp.int32)
        hist = jax.vmap(
            lambda x: jnp.bincount(x.reshape(-1),
                                   length=self.num_classes))(ti)
        inv = 1.0 / jnp.maximum(hist, 1).astype(jnp.float32)
        m = jnp.take_along_axis(inv, ti.reshape(b, -1),
                                axis=1).reshape(b, lh, lw)
        return jnp.where(ti == self.ignore_label, 0.0, m)

    # ------------------------------------------------------------------
    # conditioning (process_inputs :722-735)
    # ------------------------------------------------------------------
    def tokenize(self, texts) -> Optional[np.ndarray]:
        """Host-side caption tokenization -> ``[B, 77]`` int32 ids."""
        tok = self.descriptor.tokenizer
        if tok is None:
            return None
        enc = tok(list(texts), padding="max_length", max_length=77,
                  truncation=True, return_tensors="np")
        return enc["input_ids"].astype(np.int32)

    def _context_impl(self, frozen, batch):
        """encoder_hidden_states from the descriptor (jit-traceable).

        'remove'/'learnable' -> None (queries live inside the UNet);
        'none' -> caller-supplied ``batch['context']``; 'clip_text' ->
        frozen CLIP text tower over ``batch['text_tokens']``; 'clip_vision'
        -> frozen CLIP vision tower over the RGB frame.
        """
        spec = self.descriptor
        if spec.kind in ("remove", "learnable"):
            return None
        if spec.kind == "none":
            return batch.get("context")
        if spec.kind == "clip_text":
            ids = batch.get("text_tokens")
            if ids is None:
                return None
            out = spec.model(input_ids=ids, params=frozen["descriptor"])
            return out[0].astype(jnp.float32)  # last_hidden_state [B,77,D]
        if spec.kind == "clip_vision":
            # CLIP preprocessing: [0,1] image -> CLIP stats, 224x224 NCHW
            img01 = _unnormalize_to01(batch["image"].astype(jnp.float32))
            mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
            std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
            b = img01.shape[0]
            pix = jax.image.resize(img01, (b, 224, 224, 3), "linear")
            pix = ((pix - mean) / std).transpose(0, 3, 1, 2)
            out = spec.model(pixel_values=pix, params=frozen["descriptor"])
            return out[0].astype(jnp.float32)
        return None

    def _uncond_context(self, context, frozen):
        """Context for the CFG unconditional branch: empty-caption
        embedding when a tokenizer exists, zeros otherwise.

        The empty-caption embedding is input-independent, so it is
        computed ONCE (on device, batch 1) and cached; every eval batch
        just broadcasts it — no repeated CLIP tower runs or host pulls."""
        if context is None:
            return None
        if self.descriptor.kind == "clip_text" and \
                self.descriptor.tokenizer is not None:
            if getattr(self, "_uncond_embed", None) is None:
                ids = jnp.asarray(self.tokenize([""]))
                out = self.descriptor.model(
                    input_ids=ids, params=frozen["descriptor"])
                self._uncond_embed = jnp.asarray(out[0], jnp.float32)
            e = self._uncond_embed
            return jnp.broadcast_to(e, (context.shape[0],) + e.shape[1:])
        return jnp.zeros_like(context)

    def _device_batch(self, batch) -> dict:
        """Select + tokenize the per-step device batch."""
        keys = ("image", "image_semseg", "semseg", "mask",
                "inpainting_mask")
        db = {k: batch[k] for k in keys if k in batch}
        if (getattr(batch.get("image"), "ndim", 0) == 5
                and self.pose_model is not None
                and self.temporal_consistency_weight > 0):
            # clip batch with pose-consistency training: the warp needs
            # GT depth + focal (meta['focal'], default KITTI 707)
            db["depth"] = np.asarray(batch["depth"], np.float32)
            db["focal"] = np.asarray(
                [float((m[0] if isinstance(m, list) else m).get("focal")
                       or 707.0) for m in batch["meta"]], np.float32)
        spec = self.descriptor
        if spec.kind == "clip_text":
            toks = batch.get("text_tokens")
            if toks is None and spec.tokenizer is not None:
                n = len(batch["image"])
                toks = self.tokenize(batch.get("text", [""] * n))
            if toks is not None:
                db["text_tokens"] = toks
        elif spec.kind == "none" and "context" in batch:
            db["context"] = batch["context"]
        return db

    # ------------------------------------------------------------------
    # training (train_single_epoch + compute_loss)
    # ------------------------------------------------------------------
    def _unet_apply(self, params, latents, rgb_latents, condition, t,
                    context=None, infer: bool = False):
        inputs = jnp.concatenate([latents, rgb_latents], axis=-1)
        if condition is not None:
            inputs = jnp.concatenate([inputs, condition], axis=-1)
        unet = self.unet_infer if infer else self.unet
        if not infer:
            # bf16 working copy of the fp32 masters (torch-autocast
            # equivalent; the cast is differentiable, so grads land back
            # on the fp32 tree). Inference params are cast/prequantized
            # OUTSIDE the sampling scan by the callers — XLA does not
            # hoist per-step casts out of lax.scan.
            params = _cast_f32(params, self.compute_dtype)
        return unet.apply(params, inputs.astype(self.compute_dtype),
                          t, context).astype(jnp.float32)

    def _train_step_impl(self, state: TrainState, frozen, batch,
                         key: jax.Array):
        keys = jax.random.split(key, 10)
        # video-clip batches ([B, T, ...]) flatten frames onto the batch
        # axis; the temporal-consistency loss below ties them back
        clip_shape = None
        if batch["image"].ndim == 5:
            clip_shape = batch["image"].shape[:2]
            frame_keys = ("image", "image_semseg", "semseg", "mask",
                          "inpainting_mask")
            batch = dict(batch, **{
                k: batch[k].reshape((-1,) + batch[k].shape[2:])
                for k in frame_keys if k in batch})
        latents, latents_mean, rgb_latents, loss_mask = self._encode_impl(
            frozen, batch, keys[0])
        b = latents.shape[0]
        context = self._context_impl(frozen, batch)

        pose_info = None
        if (clip_shape is not None and self.pose_model is not None
                and self.temporal_consistency_weight > 0
                and "depth" in batch):
            images_clip = batch["image"].reshape(
                clip_shape + batch["image"].shape[1:])
            poses, mid, ref_idx = self._clip_poses(frozen, images_clip)
            lh, lw = latents.shape[1:3]
            d_lat, f_lat = self._latent_depth_focal(
                batch["depth"], batch["focal"], lh, lw)
            pose_info = (poses, mid, ref_idx, d_lat, f_lat)

        # (optional) train on own predictions (:738-744)
        if self.prob_train_on_pred > 0:
            pred_latents = self._predict_sample(
                state.params, latents, rgb_latents, keys[1],
                tmax=self.sched.num_train_timesteps // 2, context=context)
            take = jax.random.uniform(keys[2], (b, 1, 1, 1)) < \
                self.prob_train_on_pred
            latents = jnp.where(take, pred_latents, latents)

        noise = jax.random.normal(keys[3], latents.shape)
        if clip_shape is not None:
            # one timestep per CLIP (shared across its frames) so the
            # frames' x0 estimates are comparable for the consistency term
            bc, tt = clip_shape
            timesteps = jnp.repeat(jax.random.randint(
                keys[4], (bc,), self.min_noise_level,
                self.sched.num_train_timesteps), tt)
        else:
            timesteps = jax.random.randint(
                keys[4], (b,), self.min_noise_level,
                self.sched.num_train_timesteps)
        noisy = add_noise(self.sched, latents, noise, timesteps)

        # (optional) inpainting: keep original latents where masked
        inpaint = None
        if self.prob_inpainting > 0:
            m = jax.image.resize(
                batch["inpainting_mask"].astype(jnp.float32)[..., None],
                (b, latents.shape[1], latents.shape[2], 1), "nearest")
            on = jax.random.uniform(keys[5], (b, 1, 1, 1)) < \
                self.prob_inpainting
            inpaint = m * on

        # (optional) self-conditioning first pass, no grad (:824-833)
        condition = None
        if self.self_condition:
            cond0 = jnp.zeros_like(noisy)
            pred0 = self._unet_apply(jax.lax.stop_gradient(state.params),
                                     noisy, rgb_latents, cond0, timesteps,
                                     context)
            condition = jax.lax.stop_gradient(
                remove_noise(self.sched, noisy, pred0, timesteps))
            if self.cond_noise_level > 0:
                # noise the self-conditioning channel (reference
                # trainers_ldm_cond.py:579-585)
                cn = jax.random.normal(keys[8], condition.shape)
                tc = jax.random.randint(keys[9], (b,), 0,
                                        self.cond_noise_level)
                condition = add_noise(self.sched, condition, cn, tc)

        def loss_fn(params):
            rgb_in = rgb_latents
            t_img = None
            if self.rgb_noise_level > 0:
                rn = jax.random.normal(keys[6], rgb_in.shape)
                t_img = jax.random.randint(keys[7], (b,), 0,
                                           self.rgb_noise_level)
                rgb_in = add_noise(self.sched, rgb_in, rn, t_img)
            pred = self._unet_apply(params, noisy, rgb_in, condition,
                                    timesteps, context)
            if self.sched.prediction_type == "epsilon":
                target = noise
            else:
                target = latents_mean
            loss = diffusion_loss(
                pred, target, timesteps=timesteps,
                schedule_weights=self.sched.weights, loss_mask=loss_mask,
                loss_type=self.loss_type, ohem_ratio=self.ohem_ratio)

            cons = jnp.asarray(0.0)
            if pose_info is not None:
                # temporal consistency on the per-frame x0 estimates:
                # warp each ref frame's x0 latent onto the middle frame
                # via the (frozen) pose net and penalize disagreement —
                # the seg-consistency objective the fork intended
                # (README.md:3-5) applied in latent space
                from ..losses.pose_consistency import inverse_warp
                if self.sched.prediction_type == "epsilon":
                    x0p = remove_noise(self.sched, noisy, pred, timesteps)
                else:
                    x0p = pred
                bc_, tt_ = clip_shape
                x0c = x0p.reshape((bc_, tt_) + x0p.shape[1:])
                poses, mid, ref_idx, d_lat, f_lat = pose_info
                total = 0.0
                for i, r in enumerate(ref_idx):
                    warped, valid = inverse_warp(
                        x0c[:, r], d_lat[:, mid], poses[:, i], f_lat)
                    valid = valid.astype(jnp.float32)
                    num = jnp.sum(jnp.abs(warped - x0c[:, mid])
                                  * valid[..., None])
                    den = jnp.maximum(jnp.sum(valid) * x0p.shape[-1], 1.0)
                    total = total + num / den
                cons = total / len(ref_idx)
                loss = loss + self.temporal_consistency_weight * cons
            return loss, (pred, cons)

        (loss, (pred, cons)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)

        # x0 prediction for visualization (:607-613)
        if self.sched.prediction_type == "epsilon":
            pred_x0 = remove_noise(self.sched, noisy, pred, timesteps)
        else:
            pred_x0 = pred
        if inpaint is not None:
            pred_x0 = jnp.where(inpaint > 0, latents_mean, pred_x0)
        metrics = {"loss": loss, "timestep_mean":
                   jnp.mean(timesteps.astype(jnp.float32)),
                   "consistency": cons}
        return new_state, metrics, pred_x0

    def _predict_sample(self, params, latents, rgb_latents, key, tmax,
                        context=None):
        """predict_sample (:446-495): one denoise at random t, no grad."""
        k1, k2 = jax.random.split(key)
        noise = jax.random.normal(k1, latents.shape)
        t = jax.random.randint(k2, (latents.shape[0],), 0, tmax)
        noisy = add_noise(self.sched, latents, noise, t)
        cond = jnp.zeros_like(noisy) if self.self_condition else None
        pred = self._unet_apply(jax.lax.stop_gradient(params), noisy,
                                rgb_latents, cond, t, context)
        out = remove_noise(self.sched, noisy, pred, t)
        out = jnp.clip(out, latents.min(), latents.max())
        return jax.lax.stop_gradient(out)

    # ------------------------------------------------------------------
    def log_images_train(self, batch: dict, pred_x0, step: int):
        """Decode predicted x0 latents and write an rgb/gt/pred panel
        (reference log_images_train, trainers_ldm_cond.py:1378-1512)."""
        from ..utils.visualization import save_train_panel
        z = jnp.asarray(pred_x0[:1]) * (1.0 / self.seg_scale)
        logits = self.vae_seg.apply(self.frozen_params["vae_seg"], z, True,
                                    method=SegVAE.decode)
        h, w = batch["semseg"].shape[1:3]
        logits = jax.image.resize(
            logits.astype(jnp.float32), (1, h, w, logits.shape[-1]),
            "linear")
        pred = np.asarray(jnp.argmax(logits, axis=-1))[0]
        path = os.path.join(self.results_folder, f"rgb_gt_pred_{step}.jpg")
        out = save_train_panel(path, batch["image"][0],
                               batch["semseg"][0], pred)
        # mirror the panel to wandb (reference log_images_train posts the
        # grid, trainers_ldm_cond.py:1481-1512)
        self.metrics.log_image(step, "train_panel", path)
        return out

    def log_images_val(self, batch: dict, logits, identifier: str = ""):
        """Eval-time overview strip (reference ``log_images_val``,
        trainers_ldm_cond.py:1378-1438): columns = val images, rows =
        RGB / GT / sampled prediction (+ inpainting mask when present).
        GT rows are skipped for RGB-only batches."""
        from ..utils.visualization import save_val_overview
        img = np.asarray(batch["image"])
        h, w = img.shape[1:3]
        lg = jax.image.resize(
            jnp.asarray(logits, jnp.float32),
            (logits.shape[0], h, w, logits.shape[-1]), "linear")
        pred = np.asarray(jnp.argmax(lg, axis=-1))
        path = os.path.join(self.results_folder,
                            f"overview{identifier}.png")
        save_val_overview(
            path, img,
            np.asarray(batch["semseg"]) if "semseg" in batch else None,
            pred,
            inpainting=(np.asarray(batch["inpainting_mask"])
                        if "inpainting_mask" in batch else None))
        step = int(self.state.step) if self.state is not None else 0
        self.metrics.log_image(step, "val_overview", path)
        return path

    def visualize_noise_schedule(self, seed: int = 42):
        """Noise one val bits map at strided timesteps and write the
        decoded strip (reference ``visualize_noise_schedule``,
        trainers_ldm_cond.py:1625-1660)."""
        from ..utils.visualization import noise_schedule_panel
        ds = self.ds_val if self.ds_val is not None else self.ds
        sample = ds[0]
        path = os.path.join(self.results_folder, "noise_schedule.jpg")
        return noise_schedule_panel(
            path, self.sched, np.asarray(sample["image_semseg"]),
            seed=seed)

    def _eval_during_training(self, step: int, eval_kw: dict):
        """Periodic in-training eval (reference train_loop evaluates at
        step 0 and every ``eval_every``, keeping the best-PQ snapshot,
        trainers_ldm_cond.py:922-923, :1366-1373)."""
        if self.ds_val is None:
            return None
        res = self.compute_pq(save_model=True, **eval_kw)
        self.metrics.log(step, pq=res["pq"], sq=res.get("sq"),
                         rq=res.get("rq"), best_pq=self.best_pq)
        print(f"[eval @ step {step}] PQ {res['pq']:.2f} "
              f"(best {self.best_pq:.2f})")
        return res

    def train_loop(self, seed: int = 0, log_every: int = 20,
                   save_every: int = 2000,
                   max_steps: Optional[int] = None,
                   vis_every: Optional[int] = None,
                   eval_every: Optional[int] = None,
                   eval_kwargs: Optional[dict] = None):
        assert self.ds is not None
        from ..data import make_loader
        loader = make_loader(self.ds, self.batch_size, seed=seed)
        max_steps = max_steps or self.train_num_steps
        if eval_every is None:
            eval_every = self.p["eval_kwargs"].get("eval_every")
        eval_kw = dict(eval_kwargs or {})
        meter = AverageMeter("loss", ":.4f")
        pending = []  # device losses; drained at log time (no per-step sync)
        key = jax.random.key(seed)
        step = int(self.state.step) if self.state is not None else 0
        if eval_every and self.state is not None:
            # eval-before-train smoke pass (reference :922-923)
            self._eval_during_training(step, eval_kw)
        epoch = 0
        t0 = time.time()
        from ..parallel import prefetch_to_device
        while step < max_steps:
            # double-buffered H2D: the next batch's collate + transfer
            # overlap the device step (the torch DataLoader pin_memory/
            # prefetch equivalent, reference trainers_ldm_cond.py:246-258)
            for db in prefetch_to_device(
                    (self._device_batch(b) for b in loader.epoch(epoch)),
                    self.mesh, size=2):
                if self.state is None:
                    self.init_state(db, seed)
                key, sub = jax.random.split(key)
                self.state, metrics, pred_x0 = self._train_step(
                    self.state, self.frozen_params, db, sub)
                step += 1
                if vis_every and step % vis_every == 0:
                    self.log_images_train(db, pred_x0, step)
                pending.append(metrics["loss"])
                if step % log_every == 0:
                    for v in jax.device_get(pending):
                        meter.update(float(v), self.batch_size)
                    pending.clear()
                    ProgressMeter(max_steps, [meter],
                                  prefix=f"Epoch [{epoch}]").display(step)
                    self.metrics.log(step, loss=meter.val)
                if step % save_every == 0:
                    self.save(step)
                if eval_every and step % eval_every == 0:
                    self._eval_during_training(step, eval_kw)
                if step >= max_steps:
                    break
            epoch += 1
        print(f"LDM training finished in {time.time() - t0:.1f}s")
        return self.state

    # ------------------------------------------------------------------
    # sampling + eval (sample :1049 / compute_pq :1185)
    # ------------------------------------------------------------------
    def _sample_decode_impl(self, unet_params, frozen, rgb_latents, key,
                            context=None, uncond_context=None,
                            num_inference_steps: int = 50,
                            repeat_noise: bool = False,
                            guidance_scale: float = 1.0):
        b, lh, lw, _ = rgb_latents.shape
        init = jax.random.normal(key, (b, lh, lw, 4))
        if repeat_noise:
            # share one noise map across the clip (:1097-1098)
            init = jnp.broadcast_to(init[:1], init.shape)

        def model_fn(latents, condition, t):
            return self._unet_apply(unet_params, latents, rgb_latents,
                                    condition, t, context, infer=True)

        if uncond_context is not None and guidance_scale != 1.0:
            # classifier-free guidance (reference :1147-1149)
            from ..diffusion.sampler import cfg_model_fn

            def uncond_fn(latents, condition, t):
                return self._unet_apply(unet_params, latents, rgb_latents,
                                        condition, t, uncond_context,
                                        infer=True)

            model_fn = cfg_model_fn(model_fn, uncond_fn, guidance_scale)

        sample_fn = dpmpp_2m_sample if self.sampler == "dpmpp_2m" \
            else ddim_sample
        x0 = sample_fn(self.sched, model_fn, init,
                       num_inference_steps=num_inference_steps,
                       self_condition=self.self_condition)
        # decode_latents (:399-427): unscale + seg-VAE decode to logits
        # (in the compute dtype — frozen params are cast at init)
        z = (x0 * (1.0 / self.seg_scale)).astype(self.compute_dtype)
        logits = self.vae_seg.apply(frozen["vae_seg"], z, True,
                                    method=SegVAE.decode)
        if self.spatial_parallel:
            # H-shard the full-res decode output; GSPMD propagates the
            # spec back through the decoder (conv halos inserted)
            from ..parallel.sp import spatial_constraint
            logits = spatial_constraint(logits, self.mesh)
        return logits.astype(jnp.float32), x0

    def sample_panoptic(self, batch: dict, key: jax.Array,
                        num_inference_steps: Optional[int] = None,
                        repeat_noise: bool = False,
                        guidance_scale: Optional[float] = None):
        """RGB batch -> sampled segmentation logits (full pipeline).

        Samples with the EMA shadow params when ``ema_on`` (reference
        evaluates EMAModelCPU weights, unet.py:443-459) and applies CFG
        when the descriptor produces a context and ``guidance_scale != 1``.

        Needs only ``batch['image']`` (+ caption keys for text
        descriptors): inference runs on unlabeled frames, exactly like
        the reference sampler (trainers_ldm_cond.py:1234-1242).
        """
        rgb_latents = self._encode_rgb(
            self.frozen_params, jnp.asarray(batch["image"]), key)
        db = self._device_batch(batch)
        context = self._context(self.frozen_params, db)
        gs = self.guidance_scale if guidance_scale is None else \
            float(guidance_scale)
        uncond = self._uncond_context(context, self.frozen_params) \
            if gs != 1.0 else None
        eval_params = self.state.eval_params()
        if self.int8_inference:
            self._ensure_int8_ready(batch, key)
            # one device pass re-quantizing weights, amortized over the
            # 50-step scan
            eval_params = self._prequant(eval_params)
        else:
            # cast once OUTSIDE the sampling scan (per-step casts are
            # not hoisted out of lax.scan)
            eval_params = _cast_f32(eval_params, self.compute_dtype)
        logits, x0 = self._sample_decode(
            eval_params, self.frozen_params, rgb_latents, key,
            context, uncond,
            num_inference_steps=num_inference_steps or
            self.num_inference_steps, repeat_noise=repeat_noise,
            guidance_scale=gs)
        return logits, x0

    def _sample_clip_impl(self, unet_params, frozen, batch, key,
                          context=None, uncond_context=None,
                          num_inference_steps: int = 50,
                          repeat_noise: bool = True,
                          pose_warp: bool = True,
                          refine_strength: float = 0.3,
                          warp_blend: float = 0.5,
                          guidance_scale: float = 1.0):
        """Device-side clip sampling: per-frame DDIM (optionally with
        clip-shared init noise), then — when a pose net is attached and
        ``pose_warp`` — warp the middle frame's x0 latent into every other
        frame (inverse predicted pose + GT depth), blend, and refine the
        whole clip with a partial DDIM tail (``ddim_refine``). This is the
        pose-consistent sampling the fork planned but never built
        (README.md:3-5; its only temporal tool is repeat_noise,
        trainers_ldm_cond.py:1097-1098)."""
        from ..diffusion import ddim_refine
        from ..losses.pose_consistency import (
            pose_vec_to_mat, invert_pose_mat, inverse_warp)

        imgs = batch["image"]
        bc, tt = imgs.shape[:2]
        flat_img = imgs.reshape((-1,) + imgs.shape[2:])
        rgb = 2.0 * _unnormalize_to01(
            flat_img).astype(self.compute_dtype) - 1.0
        post = self.vae_img.apply(frozen["vae_img"], rgb,
                                  method=ImageVAE.encode)
        rgb_latents = post.mode().astype(jnp.float32) * self.img_scale
        b, lh, lw, _ = rgb_latents.shape

        def model_fn(latents, condition, t):
            return self._unet_apply(unet_params, latents, rgb_latents,
                                    condition, t, context, infer=True)

        if uncond_context is not None and guidance_scale != 1.0:
            # classifier-free guidance, per flattened frame (same CFG
            # wrapper as _sample_decode_impl; also applied by ddim_refine)
            from ..diffusion.sampler import cfg_model_fn

            def uncond_fn(latents, condition, t):
                return self._unet_apply(unet_params, latents, rgb_latents,
                                        condition, t, uncond_context,
                                        infer=True)

            model_fn = cfg_model_fn(model_fn, uncond_fn, guidance_scale)

        k_init, k_refine = jax.random.split(key)
        init = jax.random.normal(k_init, (bc, 1 if repeat_noise else tt,
                                          lh, lw, 4))
        init = jnp.broadcast_to(init, (bc, tt, lh, lw, 4)).reshape(
            b, lh, lw, 4)
        sample_fn = dpmpp_2m_sample if self.sampler == "dpmpp_2m" \
            else ddim_sample
        x0 = sample_fn(self.sched, model_fn, init,
                       num_inference_steps=num_inference_steps,
                       self_condition=self.self_condition)

        if pose_warp and self.pose_model is not None:
            images_clip = flat_img.reshape(imgs.shape)
            poses, mid, ref_idx = self._clip_poses(frozen, images_clip)
            d_lat, f_lat = self._latent_depth_focal(
                batch["depth"], batch["focal"], lh, lw)
            x0c = x0.reshape((bc, tt) + x0.shape[1:])
            anchor = x0c[:, mid]
            frames = [x0c[:, i] for i in range(tt)]
            for i, r in enumerate(ref_idx):
                # anchor -> frame r needs the INVERSE of the predicted
                # target->ref pose
                minv = invert_pose_mat(pose_vec_to_mat(poses[:, i]))
                warped, valid = inverse_warp(anchor, d_lat[:, r], minv,
                                             f_lat)
                v = valid[..., None].astype(x0.dtype)
                frames[r] = (1 - v * warp_blend) * frames[r] + \
                    v * warp_blend * warped
            blended = jnp.stack(frames, axis=1).reshape(x0.shape)
            noise = jax.random.normal(k_refine, (bc, 1, lh, lw, 4))
            noise = jnp.broadcast_to(noise, (bc, tt, lh, lw, 4)).reshape(
                x0.shape)
            x0 = ddim_refine(self.sched, model_fn, blended, noise,
                             num_inference_steps=num_inference_steps,
                             strength=refine_strength,
                             self_condition=self.self_condition)

        z = (x0 * (1.0 / self.seg_scale)).astype(self.compute_dtype)
        logits = self.vae_seg.apply(frozen["vae_seg"], z, True,
                                    method=SegVAE.decode)
        return logits.astype(jnp.float32), x0

    def sample_panoptic_clip(self, batch: dict, key: jax.Array,
                             num_inference_steps: Optional[int] = None,
                             repeat_noise: bool = True,
                             pose_warp: bool = True,
                             refine_strength: float = 0.3,
                             warp_blend: float = 0.5,
                             guidance_scale: Optional[float] = None):
        """Clip batch ``[B, T, ...]`` -> per-frame logits/x0 (flattened to
        ``[B*T, ...]``), with pose-warped frame-consistent sampling when a
        pose net is attached (see ``_sample_clip_impl``). Descriptor
        conditioning + CFG apply per flattened frame, exactly as in
        :meth:`sample_panoptic`."""
        if not hasattr(self, "_sample_clip"):
            self._sample_clip = jax.jit(
                self._sample_clip_impl,
                static_argnames=("num_inference_steps", "repeat_noise",
                                 "pose_warp", "refine_strength",
                                 "warp_blend", "guidance_scale"))
        # descriptor context over the flattened frames ([B, T] -> [B*T]:
        # clip i's frames are contiguous, so per-clip text repeats T times)
        imgs = np.asarray(batch["image"])
        bc_, tt_ = imgs.shape[:2]
        flat_batch = {"image": imgs.reshape((-1,) + imgs.shape[2:])}
        if "text" in batch:
            # per-clip captions repeat per frame; already-flat [B*T]
            # lists pass through (same guard as text_tokens/context)
            flat_batch["text"] = [s for s in batch["text"]
                                  for _ in range(tt_)] \
                if len(batch["text"]) == bc_ else list(batch["text"])
        if "text_tokens" in batch:
            toks = np.asarray(batch["text_tokens"])
            flat_batch["text_tokens"] = np.repeat(toks, tt_, axis=0) \
                if toks.shape[0] == bc_ else toks
        if "context" in batch:
            ctx = np.asarray(batch["context"])
            flat_batch["context"] = np.repeat(ctx, tt_, axis=0) \
                if ctx.shape[0] == bc_ else ctx
        context = self._context(self.frozen_params,
                                self._device_batch(flat_batch))
        gs = self.guidance_scale if guidance_scale is None else \
            float(guidance_scale)
        uncond = self._uncond_context(context, self.frozen_params) \
            if gs != 1.0 else None
        db = {"image": jnp.asarray(batch["image"])}
        if self.pose_model is not None and pose_warp:
            db["depth"] = jnp.asarray(batch["depth"], jnp.float32)
            db["focal"] = jnp.asarray(
                [float((m[0] if isinstance(m, list) else m).get("focal")
                       or 707.0) for m in batch["meta"]], jnp.float32) \
                if batch.get("meta") else jnp.full(
                    (batch["image"].shape[0],), 707.0, jnp.float32)
        eval_params = self.state.eval_params()
        if self.int8_inference:
            self._ensure_int8_ready(batch, key)
            eval_params = self._prequant(eval_params)
        else:
            eval_params = _cast_f32(eval_params, self.compute_dtype)
        return self._sample_clip(
            eval_params, self.frozen_params, db, key,
            context, uncond,
            num_inference_steps=num_inference_steps or
            self.num_inference_steps,
            repeat_noise=repeat_noise,
            pose_warp=pose_warp and self.pose_model is not None,
            refine_strength=refine_strength, warp_blend=warp_blend,
            guidance_scale=gs)

    def _ensure_int8_ready(self, batch: dict, key):
        """Guard the int8 sampling path on trained weights.

        Random-init params are accuracy-gated with the global default
        act scales (tests/test_int8_inference.py), but on pretrained
        weights (resumed or imported checkpoints) per-site activation
        ranges spread and the global 0.05/0.1 defaults silently degrade
        accuracy (BENCH_NOTES r3). Default: auto-calibrate once on the
        first inference batch (``sampling_kwargs.int8_auto_calibrate``);
        opting out without scales is a hard error."""
        if self._int8_act_scales is not None or \
                not self._params_pretrained:
            return
        if self.p["sampling_kwargs"].get("int8_auto_calibrate", True):
            img = np.asarray(batch["image"])
            if img.ndim == 5:  # clip batch: calibrate on the frames
                img = img.reshape((-1,) + img.shape[2:])
            print("int8 inference on pretrained weights: calibrating "
                  "per-site activation scales on this batch")
            self.calibrate_int8({"image": img}, key)
        else:
            raise RuntimeError(
                "int8_inference=True on pretrained weights without "
                "calibrated activation scales: call calibrate_int8() "
                "or leave sampling_kwargs.int8_auto_calibrate enabled")

    def calibrate_int8(self, batch: dict, key=None,
                       percentile: Optional[float] = None) -> dict:
        """Measure per-site static int8 activation scales on a real batch
        (ops.quant.calibrate_act_scale_tree) and thread them through
        subsequent int8 sampling: the prequantized conv kernels gain
        per-site ``act_scale`` entries, replacing the global
        ``sampling_kwargs.int8_act_scale`` scalar. Returns the scales."""
        from ..ops.quant import calibrate_act_scale_tree, apply_act_scales
        assert self.int8_inference, "int8 inference not enabled"
        key = key if key is not None else jax.random.key(0)
        # calibration only needs RGB latents — works on unlabeled frames
        rgb_latents = self._encode_rgb(
            self.frozen_params, jnp.asarray(batch["image"]), key)
        b, lh, lw, _ = rgb_latents.shape
        noisy = jax.random.normal(key, (b, lh, lw, 4))
        inp = jnp.concatenate(
            [noisy.astype(self.compute_dtype),
             rgb_latents.astype(self.compute_dtype)], axis=-1)
        if self.unet_config.cond_channels:
            inp = jnp.concatenate(
                [inp, jnp.zeros((b, lh, lw, self.unet_config.cond_channels),
                                self.compute_dtype)], axis=-1)
        t = jnp.full((b,), self.sched.num_train_timesteps // 2, jnp.int32)
        # calibrate on the bf16 (unquantized) UNet so captured norms see
        # the true activation ranges
        scales = calibrate_act_scale_tree(
            functools.partial(self.unet.apply),
            self.state.eval_params(), (inp, t), percentile=percentile)
        self._int8_act_scales = scales
        # re-compose: quantize -> apply calibrated scales -> THEN pack
        # tiles (packed operands bake the x_scale values in)
        base = self._prequant_base
        self._prequant = jax.jit(lambda p: self._pack_tiles(
            apply_act_scales(base(p), scales)))
        return scales

    def compute_metrics(self, metrics=("pq",), **kw) -> dict:
        """Eval dispatcher (trainers_ldm_cond.py:990)."""
        out = {}
        if "pq" in metrics:
            out["pq"] = self.compute_pq(**kw)
        return out

    def compute_pq(self, num_inference_steps: Optional[int] = None,
                   max_batches: Optional[int] = None,
                   thing_ids=frozenset(), save_model: bool = False,
                   seed: int = 0,
                   log_images: Optional[bool] = None) -> dict:
        """Sampled-segmentation PQ on the val set (:1185-1375).

        ``log_images`` (default ``eval_kwargs.log_images``) writes the
        reference-style overview strip for the first val batch
        (``log_images_val``)."""
        if log_images is None:
            log_images = bool(self.p["eval_kwargs"].get("log_images",
                                                        False))
        from ..data import make_loader
        from ..evals import PanopticEvaluator
        from ..ops import panoptic_post_process
        assert self.ds_val is not None
        ev = PanopticEvaluator(thing_ids=set(thing_ids),
                               class_agnostic=not thing_ids,
                               ignore_label=self.ignore_label)
        loader = make_loader(self.ds_val, self.batch_size, shuffle=False,
                        drop_last=False)
        key = jax.random.key(seed)
        for i, batch in enumerate(loader.epoch(0)):
            key, sub = jax.random.split(key)
            logits, _ = self.sample_panoptic(
                batch, sub, num_inference_steps=num_inference_steps)
            if log_images and i == 0:
                step = int(self.state.step) if self.state is not None \
                    else 0
                self.log_images_val(batch, logits,
                                    identifier=f"_val{step}")
            metas = batch.get("meta")
            if metas and all("gt_sem" in m for m in metas):
                # per-image original-size restore (reference upsamples,
                # crops padding and resizes each prediction to its own
                # meta['im_size'], trainers_ldm_cond.py:1264-1284)
                self._eval_fullres(ev, logits, metas)
            else:
                h, w = batch["semseg"].shape[1:3]
                logits = jax.image.resize(
                    logits, (logits.shape[0], h, w, logits.shape[-1]),
                    "linear")
                cleaned, _ = panoptic_post_process(
                    logits, mask_th=self.mask_th, count_th=self.count_th,
                    overlap_th=self.overlap_th,
                    ignore_label=self.ignore_label,
                    valid_mask=jnp.asarray(batch["mask"]))
                cleaned = np.asarray(cleaned)
                for bi in range(cleaned.shape[0]):
                    ev.add_image(cleaned[bi], batch["semseg"][bi])
            if max_batches is not None and i + 1 >= max_batches:
                break
        results = ev.evaluate()
        if save_model and results["pq"] > self.best_pq:
            self.best_pq = results["pq"]
            self.save(step=None, tag="best_model")
        return results

    def _eval_fullres(self, ev, logits, metas, bucket: int = 128):
        """Restore each prediction to its own original resolution and
        score it against the full-res remapped GT (+ optional padding
        crop via meta['padding'] = (top, bottom, left, right), the
        reference crop_padding at trainers_ldm_cond.py:1175).

        Size-heterogeneous val sets (COCO) would recompile
        ``jax.image.resize`` + post-process per distinct (oh, ow); instead
        the bilinear restore is expressed as two host-built weight
        matrices (``ops.resize.resize_weight_matrix`` — exact
        ``jax.image.resize`` parity) contracted on device into a padded
        ``bucket``-rounded canvas, with the out-of-image region excluded
        via ``valid_mask``. Compiles once per bucket shape, not per
        image; the padding crop folds into the weight matrices.

        Images sharing a bucket shape (the common case — uniform val
        sets like KITTI/Cityscapes all round to one bucket) are BATCHED
        into a single device call (per-image weight-matrix stacks,
        ``group_max`` images per call bounds the f32 canvas), so a val
        batch costs one restore+post-process launch instead of B
        host round-trips."""
        from ..ops.resize import resize_weight_matrix
        ih, iw = logits.shape[1:3]
        groups: dict = {}
        for bi, m in enumerate(metas):
            t, b_, le, r = m.get("padding") or (0, 0, 0, 0)
            oh, ow = m["gt_sem"].shape
            bh = -(-oh // bucket) * bucket
            bw = -(-ow // bucket) * bucket
            # weight matrices over the CROPPED source geometry, embedded
            # in full-source x padded-output canvases (zeros elsewhere)
            wh = np.zeros((ih, bh), np.float32)
            wh[t:ih - b_, :oh] = resize_weight_matrix(ih - t - b_, oh)
            ww = np.zeros((iw, bw), np.float32)
            ww[le:iw - r, :ow] = resize_weight_matrix(iw - le - r, ow)
            valid = np.zeros((bh, bw), bool)
            gm = m.get("gt_mask")
            valid[:oh, :ow] = True if gm is None else \
                np.asarray(gm).astype(bool)
            groups.setdefault((bh, bw), []).append((bi, wh, ww, valid))
        group_max = 8
        for items in groups.values():
            for s in range(0, len(items), group_max):
                chunk = items[s:s + group_max]
                idx = np.asarray([it[0] for it in chunk])
                cleaned = np.asarray(self._fullres_post(
                    jnp.take(logits, idx, axis=0),
                    jnp.asarray(np.stack([it[1] for it in chunk])),
                    jnp.asarray(np.stack([it[2] for it in chunk])),
                    jnp.asarray(np.stack([it[3] for it in chunk]))))
                for k, (bi, *_unused) in enumerate(chunk):
                    m = metas[bi]
                    oh, ow = m["gt_sem"].shape
                    ev.add_image(cleaned[k, :oh, :ow], m["gt_sem"],
                                 m.get("gt_inst"))

    @functools.partial(jax.jit, static_argnums=0)
    def _fullres_post(self, li, wh, ww, valid):
        from ..ops import panoptic_post_process
        resized = jnp.einsum("bhwc,bhH,bwW->bHWc",
                             li.astype(jnp.float32),
                             wh, ww, precision="highest")
        cleaned, _ = panoptic_post_process(
            resized, mask_th=self.mask_th, count_th=self.count_th,
            overlap_th=self.overlap_th, ignore_label=self.ignore_label,
            valid_mask=valid)
        return cleaned

    # ------------------------------------------------------------------
    def save(self, step: Optional[int] = None, tag: Optional[str] = None):
        """Checkpoint {unet, opt, step} (+ frozen refs are re-derivable)
        (construct_save_dict :1844-1877)."""
        import orbax.checkpoint as ocp
        name = tag or f"step_{step or int(self.state.step)}"
        path = os.path.join(os.path.abspath(self.results_folder), name)
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": self.state.params,
                   "opt_state": self.state.opt_state,
                   "step": np.asarray(self.state.step),
                   "best_pq": np.asarray(self.best_pq, np.float32)}
        if self.state.ema_params is not None:
            payload["ema_params"] = self.state.ema_params
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        self._rotate_checkpoints()
        return path

    def export_reference(self, path: str, use_ema: bool = False):
        """Write the current model as the REFERENCE's torch stage-2 save
        dict ``{step, epoch, vae_image, vae_semseg, unet, ema?}``
        (trainers_ldm_cond.py:1844-1877) so a run trained here can be
        consumed by the torch stack — the inverse of
        ``pretrained_ldm_path`` ingestion. Bit-exact round-trip gated by
        tests/test_torch_export.py."""
        from ..models.torch_export import export_reference_ldm
        vk = self.p["vae_model_kwargs"]
        export_reference_ldm(
            path,
            jax.device_get(self.state.params),
            jax.device_get(self.frozen_params["vae_img"]),
            jax.device_get(self.frozen_params["vae_seg"]),
            self.unet_config,
            block_out_channels=tuple(vk["block_out_channels"]),
            num_upscalers=vk.get("num_upscalers", 1),
            ema_params=(jax.device_get(self.state.ema_params)
                        if use_ema and self.state.ema_params is not None
                        else None),
            step=int(self.state.step))
        return path

    def _rotate_checkpoints(self, keep: int = 3):
        """Keep only the newest ``keep`` step checkpoints (tagged ones
        like best_model are never removed)."""
        import shutil
        root = os.path.abspath(self.results_folder)
        steps = sorted(
            (d for d in os.listdir(root) if d.startswith("step_")),
            key=lambda d: int(d.split("_")[1]))
        for d in steps[:-keep]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    def resume(self, path: Optional[str] = None):
        import orbax.checkpoint as ocp
        root = os.path.abspath(self.results_folder)
        if path is None:
            cands = sorted(
                (d for d in os.listdir(root) if d.startswith("step_")),
                key=lambda d: int(d.split("_")[1]))
            if not cands:
                print("No checkpoint found; starting fresh")
                return None
            path = os.path.join(root, cands[-1])
        ckptr = ocp.StandardCheckpointer()
        target = {"params": self.state.params,
                  "opt_state": self.state.opt_state,
                  "step": np.asarray(self.state.step),
                  "best_pq": np.asarray(self.best_pq, np.float32)}
        if self.state.ema_params is not None:
            target["ema_params"] = self.state.ema_params
        # optional keys (best_pq, ema_params) defensively: checkpoints
        # written before these keys existed must still resume — probe the
        # on-disk structure instead of failing with a structure mismatch
        present = set(target)
        try:
            meta = ckptr.metadata(path)
            tree = getattr(meta, "item_metadata", None) or meta
            if hasattr(tree, "keys"):
                present = set(tree.keys())
        except Exception:
            pass
        target = {k: v for k, v in target.items() if k in present}
        # restore into ABSTRACT targets with the live shardings, and
        # free the init-time buffers first: a concrete-target restore
        # allocates a full second copy of the train state, and at
        # flagship scale (fp32 masters + adamw moments ~10 GB) two
        # copies exceed the 16 GB chip — caught by the r5 dress
        # rehearsal (RESOURCE_EXHAUSTED on resume)
        import gc

        def _abstract(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            return x
        abstract = jax.tree_util.tree_map(_abstract, target)
        keep_ema = self.state.ema_params
        if "ema_params" in target:
            keep_ema = None  # restored below; drop our copy too
        self.state = self.state.replace(params=None, opt_state=None,
                                        ema_params=None)
        del target
        gc.collect()
        restored = ckptr.restore(path, abstract)
        self.state = self.state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"]),
            ema_params=restored.get("ema_params", keep_ema))
        self.best_pq = float(restored.get("best_pq", self.best_pq))
        # trained weights: int8 sampling must not use the global default
        # act scales silently (see _ensure_int8_ready)
        self._params_pretrained = True
        print(f"Resumed from {path} at step {int(self.state.step)}")
        return path


def _unnormalize_to01(x: jnp.ndarray) -> jnp.ndarray:
    """Invert the ImageNet normalization back to [0,1] (the reference
    feeds 2*img-1 of the [0,1] image to the RGB VAE, encode_inputs :371)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], x.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], x.dtype)
    return jnp.clip(x * std + mean, 0.0, 1.0)
