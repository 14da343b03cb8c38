"""Stage-1 segmentation-VAE trainer.

Reference: ldmseg/trainers/trainers_ae.py (``TrainerAE``). The torch
god-object (dataloaders + DDP + AMP + python batch loop) becomes:

  * one pure jitted ``train_step`` (forward + point losses + KL + optax
    update) with donated state, compiled once,
  * batch sharding over the ``data`` mesh axis (DDP equivalent — XLA
    inserts the gradient all-reduce),
  * host-side loop for data, meters, checkpoints, eval.

Loss = weighted {ce, mask, kl} (trainers_ae.py:239-259) with the optional
input-corruption mask (prob_inpainting, :303-311) and latent valid mask
(:313-321). Eval: mIoU (:947) and panoptic quality via the greedy
evaluator (:624-727). Checkpoint/resume via orbax with the reference's
logical layout {step, epoch, vae, opt} (:534-587).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import SegVAE
from ..losses import PointLossConfig, point_losses
from ..parallel import make_mesh, replicate
from ..utils.meters import AverageMeter, ProgressMeter
from .optim import make_optimizer, make_lr_schedule
from .state import TrainState, cast_f32


class TrainerAE:
    def __init__(self, p: dict, dataset=None, val_dataset=None,
                 mesh=None, results_folder: Optional[str] = None):
        self.p = p
        tk = p["train_kwargs"]
        vk = dict(p["vae_model_kwargs"])
        vk.pop("pretrained_path", None)
        vk["block_out_channels"] = tuple(vk["block_out_channels"])
        self.vae = SegVAE(**vk)
        self.num_classes = vk["out_channels"]
        self.ignore_label = p["ignore_label"]
        self.batch_size = tk["batch_size"]
        self.train_num_steps = tk["train_num_steps"]
        self.prob_inpainting = tk.get("prob_inpainting", 0.0)
        self.latent_mask = tk.get("latent_mask", False)
        self.fuse_rgb = vk.get("fuse_rgb", False)
        self.accumulate = tk.get("accumulate", 1)
        self.loss_weights = p["loss_weights"]
        # "float16" (the reference's AMP dtype) maps to bf16 on TPU
        self.compute_dtype = jnp.bfloat16 if tk.get("weight_dtype") in \
            ("bfloat16", "float16") else jnp.float32
        self.loss_cfg = PointLossConfig(
            num_points=p["loss_kwargs"]["num_points"],
            oversample_ratio=p["loss_kwargs"]["oversample_ratio"],
            importance_sample_ratio=p["loss_kwargs"][
                "importance_sample_ratio"],
            ignore_label=self.ignore_label,
            temperature=p["loss_kwargs"]["temperature"],
            # top_k over the [B, num_classes] histogram: k can never
            # exceed num_classes (the reference default 128 assumes 128
            # VAE classes; smaller heads would crash lax.top_k)
            max_masks=min(p["loss_kwargs"].get("max_masks",
                                               self.num_classes),
                          self.num_classes),
        )
        if self.loss_cfg.max_masks < self.num_classes:
            print(f"WARNING: max_masks={self.loss_cfg.max_masks} < "
                  f"num_classes={self.num_classes}; the mask loss drops "
                  "the smallest segments on crowded scenes "
                  "(exact parity needs max_masks >= num_classes)")

        self.mesh = mesh if mesh is not None else make_mesh()
        self.ds = dataset
        self.ds_val = val_dataset
        self.results_folder = results_folder or p.get("checkpoint_dir",
                                                      "/tmp/ldmseg_ae")
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
        self.tx = make_optimizer(
            p.get("optimizer_name", "adamw"),
            learning_rate=schedule,
            betas=tuple(p["optimizer_kwargs"].get("betas", (0.9, 0.999))),
            weight_decay=p["optimizer_kwargs"].get("weight_decay", 0.0),
            weight_decay_norm=p["optimizer_kwargs"].get("weight_decay_norm"),
            clip_grad=tk.get("clip_grad", 0.0),
        )
        self.state = None
        self.best_pq = -1.0
        self.epoch = 0
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,))
        self._eval_decode = jax.jit(self._eval_decode_impl)

    # ------------------------------------------------------------------
    def init_state(self, sample_batch: dict, seed: int = 0) -> TrainState:
        x = jnp.asarray(sample_batch["image_semseg"][:1], self.compute_dtype)
        rgb = None
        if self.fuse_rgb:
            rgb = 2.0 * jnp.asarray(sample_batch["image"][:1],
                                    self.compute_dtype) - 1.0
        params = jax.jit(functools.partial(
            self.vae.init, sample_posterior=False))(
            {"params": jax.random.key(seed), "sample": jax.random.key(0)},
            2.0 * x - 1.0, rgb_sample=rgb)
        params = replicate(self.mesh, params)
        self.state = TrainState.create(
            params, self.tx, ema=self.p.get("ema_on", False),
            mesh=self.mesh,
            zero1=self.p.get("optimizer_zero_redundancy", False),
            accumulate=self.accumulate)
        return self.state

    # ------------------------------------------------------------------
    def _corrupt_inputs(self, key, images, targets):
        """Random sparse-visibility corruption (trainers_ae.py:303-311):
        per-sample strength, 32x32 noise upsampled; mask==1 marks the
        kept-and-supervised region, everything else is blanked and
        CE-ignored (images[~masks]=0, losses.py:325-326
        targets[~masks]=ignore). Returns (images, mask)."""
        b = images.shape[0]
        k1, k2 = jax.random.split(key)
        strengths = jax.random.uniform(k1, (b, 1, 1)) * self.prob_inpainting
        noise = jax.random.uniform(k2, (b, 32, 32)) < strengths
        h, w = images.shape[1:3]
        m = jax.image.resize(noise.astype(jnp.float32), (b, h, w), "nearest")
        m = jnp.where(targets == self.ignore_label, 0.0, m)
        images = jnp.where(m[..., None] > 0, images, 0.0)
        return images, m

    def _forward_loss(self, params, batch, key):
        # bf16 working copy of the fp32 masters when weight_dtype says so
        # (without the cast flax promotes fp32 params x bf16 inputs back
        # to an fp32 forward — the MXU runs at half rate)
        params = cast_f32(params, self.compute_dtype)
        key_sample, key_mask, key_points = jax.random.split(key, 3)
        images = 2.0 * batch["image_semseg"].astype(self.compute_dtype) - 1.0
        targets = batch["semseg"]

        rgbs = None
        if self.fuse_rgb:
            # feed the RGB frame alongside the bits (trainers_ae.py:299-301)
            rgbs = 2.0 * batch["image"].astype(self.compute_dtype) - 1.0

        corrupt_mask = None
        if self.prob_inpainting > 0:
            images, corrupt_mask = self._corrupt_inputs(key_mask, images,
                                                        targets)

        valid_mask = None
        if self.latent_mask:
            lh = images.shape[1] // self.vae.downsample_factor
            lw = images.shape[2] // self.vae.downsample_factor
            t = jax.image.resize(
                targets[..., None].astype(jnp.float32),
                (targets.shape[0], lh, lw, 1), "nearest")[..., 0]
            valid_mask = (t != self.ignore_label).astype(self.compute_dtype)

        logits, posterior = self.vae.apply(
            params, images, sample_posterior=True, rgb_sample=rgbs,
            valid_mask=valid_mask, rngs={"sample": key_sample})
        logits = logits.astype(jnp.float32)

        losses = point_losses(key_points, logits, targets, self.loss_cfg,
                              corrupt_mask=corrupt_mask)
        losses["kl"] = jnp.mean(posterior.kl())
        total = sum(self.loss_weights[k] * v for k, v in losses.items())
        return total, losses

    def _train_step_impl(self, state: TrainState, batch: dict,
                         key: jax.Array):
        (loss, parts), grads = jax.value_and_grad(
            self._forward_loss, has_aux=True)(state.params, batch, key)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, **parts}
        return new_state, metrics

    # ------------------------------------------------------------------
    def save_train_images(self, batch: dict, step: int):
        """Write an rgb/gt/pred panel (reference save_train_images,
        trainers_ae.py:884, artifacts like rgb_gt_pred_ae_*.jpg)."""
        from ..utils.visualization import save_train_panel
        logits = self._eval_logits(
            {k: v[:1] for k, v in batch.items() if k in
             ("image", "image_semseg")})
        h, w = batch["semseg"].shape[1:3]
        logits = jax.image.resize(
            logits, (1, h, w, logits.shape[-1]), "linear")
        pred = np.asarray(jnp.argmax(logits, axis=-1))[0]
        path = os.path.join(self.results_folder,
                            f"rgb_gt_pred_ae_{step}.jpg")
        out = save_train_panel(path, batch["image"][0],
                               batch["semseg"][0], pred)
        self.metrics.log_image(step, "train_panel", path)
        return out

    def _eval_during_training(self, step: int, eval_kw: dict):
        """Periodic in-training eval + best-PQ snapshot (the reference AE
        loop evaluates before training and per epoch, trainers_ae.py:398,
        :391-445)."""
        if self.ds_val is None:
            return None
        res = self.compute_metrics(("miou", "pq"), **eval_kw)
        pq = res["pq"]["pq"]
        if pq > self.best_pq:
            self.best_pq = pq
            self.save(step=None, tag="best_model")
        self.metrics.log(step, pq=pq, miou=res["miou"]["mIoU"],
                         best_pq=self.best_pq)
        print(f"[eval @ step {step}] PQ {pq:.2f} "
              f"mIoU {res['miou']['mIoU']:.4f} (best {self.best_pq:.2f})")
        return res

    def train_loop(self, seed: int = 0, log_every: int = 20,
                   save_every: int = 1000, max_steps: Optional[int] = None,
                   vis_every: Optional[int] = None,
                   eval_every: Optional[int] = None,
                   eval_kwargs: Optional[dict] = None):
        assert self.ds is not None, "no training dataset"
        from ..data import make_loader
        loader = make_loader(self.ds, self.batch_size, seed=seed)
        max_steps = max_steps or self.train_num_steps
        if eval_every is None:
            eval_every = self.p["eval_kwargs"].get("eval_every")
        eval_kw = dict(eval_kwargs or {})
        meters = {k: AverageMeter(k, ":.4f")
                  for k in ("loss", "ce", "mask", "kl")}
        pending = []
        key = jax.random.key(seed)

        step = int(self.state.step) if self.state is not None else 0
        if eval_every and self.state is not None:
            # eval-before-train smoke pass (reference trainers_ae.py:398)
            self._eval_during_training(step, eval_kw)
        epoch = 0
        t0 = time.time()
        from ..parallel import prefetch_to_device
        dev_keys = ("image_semseg", "semseg") + \
            (("image",) if self.fuse_rgb else ())
        while step < max_steps:
            # double-buffered H2D: collate + transfer of the next batch
            # overlap the device step (torch DataLoader pin_memory/prefetch
            # equivalent, reference trainers_ae.py:159-204); keys not
            # transferred (image w/o fuse_rgb, meta) stay host-side for
            # the vis panels
            for batch in prefetch_to_device(loader.epoch(epoch), self.mesh,
                                            size=2, keys=dev_keys):
                if self.state is None:
                    self.init_state(batch, seed)
                db = {k: batch[k] for k in dev_keys}
                key, sub = jax.random.split(key)
                self.state, metrics = self._train_step(self.state, db, sub)
                # keep every step's (device) metrics; fetch in one
                # device_get at log time so the running averages cover all
                # steps without a per-step host sync
                pending.append(metrics)
                step += 1
                if step % log_every == 0:
                    for m in jax.device_get(pending):
                        for k, meter in meters.items():
                            meter.update(float(m[k]), self.batch_size)
                    last = jax.device_get(pending[-1])
                    pending.clear()
                    prog = ProgressMeter(max_steps, list(meters.values()),
                                         prefix=f"Epoch [{epoch}]")
                    prog.display(step)
                    self.metrics.log(step, **{k: float(last[k])
                                              for k in meters})
                if step % save_every == 0:
                    self.save(step)
                if eval_every and step % eval_every == 0:
                    self._eval_during_training(step, eval_kw)
                if vis_every and step % vis_every == 0:
                    self.save_train_images(batch, step)
                if step >= max_steps:
                    break
            epoch += 1
        print(f"Training finished in {time.time() - t0:.1f}s")
        return self.state

    # ------------------------------------------------------------------
    def _eval_decode_impl(self, params, bits, rgb=None):
        """Full-res logits for eval: encode(mode) -> decode(interp)
        (trainers_ae.py:947-1010 path; rgb fused when fuse_rgb,
        :968-972)."""
        params = cast_f32(params, self.compute_dtype)
        images = 2.0 * bits.astype(self.compute_dtype) - 1.0
        if rgb is not None:
            rgbs = 2.0 * rgb.astype(self.compute_dtype) - 1.0
            images = jnp.concatenate([images, rgbs], axis=-1)
        posterior = self.vae.apply(params, images, method=SegVAE.encode)
        logits = self.vae.apply(params, posterior.mode(), True,
                                method=SegVAE.decode)
        return logits.astype(jnp.float32)

    def _eval_logits(self, batch: dict) -> jnp.ndarray:
        """Eval forward on a host batch; uses EMA params when kept."""
        rgb = jnp.asarray(batch["image"]) if self.fuse_rgb else None
        return self._eval_decode(self.state.eval_params(),
                                 jnp.asarray(batch["image_semseg"]),
                                 rgb)

    def compute_metrics(self, metrics=("miou", "pq"), **kw) -> dict:
        """Eval dispatcher (reference compute_metrics,
        trainers_ae.py:398 — also run at step 0 as a smoke test)."""
        out = {}
        if "miou" in metrics:
            out["miou"] = self.compute_miou(**kw)
        if "pq" in metrics:
            out["pq"] = self.compute_pq(
                **{k: v for k, v in kw.items() if k == "max_batches"})
        return out

    def compute_miou(self, max_batches: Optional[int] = None,
                     batch_size: Optional[int] = None) -> dict:
        """mIoU of reconstruction on the val set (trainers_ae.py:947)."""
        from ..data import make_loader
        from ..evals import SemsegMeter
        assert self.ds_val is not None
        meter = SemsegMeter(self.num_classes,
                            ignore_index=self.ignore_label)
        loader = make_loader(self.ds_val, batch_size or self.batch_size,
                        shuffle=False, drop_last=False)
        for i, batch in enumerate(loader.epoch(0)):
            logits = self._eval_logits(batch)
            h, w = batch["semseg"].shape[1:3]
            logits = jax.image.resize(
                logits, (logits.shape[0], h, w, logits.shape[-1]), "linear")
            pred = jnp.argmax(logits, axis=-1)
            meter.update(pred, jnp.asarray(batch["semseg"]))
            if max_batches is not None and i + 1 >= max_batches:
                break
        meter.synchronize()
        return meter.return_score()

    def compute_pq(self, mask_th: float = 0.5, count_th: int = 128,
                   overlap_th: float = 0.5,
                   max_batches: Optional[int] = None) -> dict:
        """Class-agnostic panoptic quality of reconstructions
        (trainers_ae.py:624-727)."""
        from ..data import make_loader
        from ..evals import PanopticEvaluator
        from ..ops import panoptic_post_process
        assert self.ds_val is not None
        ev = PanopticEvaluator(thing_ids=set(), class_agnostic=True,
                               ignore_label=self.ignore_label)
        loader = make_loader(self.ds_val, self.batch_size, shuffle=False,
                        drop_last=False)
        for i, batch in enumerate(loader.epoch(0)):
            logits = self._eval_logits(batch)
            metas = batch.get("meta")
            if metas and all("gt_sem" in m for m in metas):
                # per-image original-size restore (reference upsamples and
                # resizes each prediction to its own im_size before
                # scoring, trainers_ae.py:624-727 / trainers_ldm_cond.py
                # :1264-1284)
                c = logits.shape[-1]
                for bi, m in enumerate(metas):
                    oh, ow = m["gt_sem"].shape
                    li = jax.image.resize(
                        logits[bi:bi + 1].astype(jnp.float32),
                        (1, oh, ow, c), "linear")
                    vm = jnp.asarray(m["gt_mask"][None]) \
                        if m.get("gt_mask") is not None else None
                    cleaned, _ = panoptic_post_process(
                        li, mask_th=mask_th, count_th=count_th,
                        overlap_th=overlap_th,
                        ignore_label=self.ignore_label, valid_mask=vm)
                    ev.add_image(np.asarray(cleaned)[0], m["gt_sem"])
            else:
                h, w = batch["semseg"].shape[1:3]
                logits = jax.image.resize(
                    logits, (logits.shape[0], h, w, logits.shape[-1]),
                    "linear")
                cleaned, _ = panoptic_post_process(
                    logits, mask_th=mask_th, count_th=count_th,
                    overlap_th=overlap_th, ignore_label=self.ignore_label)
                cleaned = np.asarray(cleaned)
                for bi in range(cleaned.shape[0]):
                    ev.add_image(cleaned[bi], batch["semseg"][bi])
            if max_batches is not None and i + 1 >= max_batches:
                break
        return ev.evaluate()

    # ------------------------------------------------------------------
    def save(self, step: Optional[int] = None, tag: Optional[str] = None):
        """orbax checkpoint with the reference's logical content
        (trainers_ae.py:534-548: step/epoch/vae/opt)."""
        import orbax.checkpoint as ocp
        name = tag or f"step_{step or int(self.state.step)}"
        path = os.path.join(os.path.abspath(self.results_folder), name)
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": self.state.params,
                   "opt_state": self.state.opt_state,
                   "step": np.asarray(self.state.step)}
        if self.state.ema_params is not None:
            # reference saves the EMA shadow in the ckpt dict
            # (trainers_ldm_cond.py:1844-1877 'ema' entry)
            payload["ema_params"] = self.state.ema_params
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        self._rotate_checkpoints()
        return path

    def export_reference(self, path: str, use_ema: bool = False):
        """Write the current seg VAE as the REFERENCE's stage-1 torch
        save dict ``{'vae': <GeneralVAESeg state dict>, 'step': ...}``
        (trainers_ae.py:534-548) — consumable by the torch stack and by
        the reference's own stage-1→2 handoff. Round-trip gated in
        tests/test_torch_export.py."""
        import torch
        from ..models.torch_export import seg_vae_sd_from_params
        vk = self.p["vae_model_kwargs"]
        params = self.state.ema_params if (
            use_ema and self.state.ema_params is not None) \
            else self.state.params
        sd = seg_vae_sd_from_params(
            jax.device_get(params),
            tuple(vk["block_out_channels"]),
            num_upscalers=vk.get("num_upscalers", 1))
        torch.save({"vae": {k: torch.from_numpy(
            np.ascontiguousarray(v).copy()) for k, v in sd.items()},
            "step": int(self.state.step)}, path)
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
        """Restore latest checkpoint (trainers_ae.py:550-573)."""
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
                  "step": np.asarray(self.state.step)}
        if self.state.ema_params is not None:
            target["ema_params"] = self.state.ema_params
        # abstract-target restore after freeing the init-time buffers —
        # a concrete-target restore holds TWO full train states on the
        # chip at once (OOM at flagship scale; see trainer_ldm.resume)
        import gc

        def _abstract(x):
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            return x
        abstract = jax.tree_util.tree_map(_abstract, target)
        keep_ema = None if "ema_params" in target else \
            self.state.ema_params
        self.state = self.state.replace(params=None, opt_state=None,
                                        ema_params=None)
        del target
        gc.collect()
        restored = ckptr.restore(path, abstract)
        self.state = self.state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"]),
            ema_params=restored.get("ema_params", keep_ema))
        print(f"Resumed from {path} at step {int(self.state.step)}")
        return path
