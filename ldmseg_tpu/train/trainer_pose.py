"""Pose network trainer — the "pose-VAE" stage the fork left unfinished.

Trains :class:`PoseExpNet` on video clips with the SfMLearner photometric
objective (losses/pose_consistency.py), using the DVPS datasets' GT depth
and the focal length parsed from the depth filenames. The learned poses
feed (a) frame-consistent sampling (``repeat_noise`` + warped init
latents) and (b) the segmentation temporal-consistency loss.

Reference anchors: posenet/posenet.py (the model), Pose.ipynb cells 13-19
(the only usage), kitti depth/focal plumbing (semKITTI_dataset.py:117).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import PoseExpNet
from ..losses.pose_consistency import photometric_consistency_loss
from ..parallel import make_mesh, shard_batch, replicate
from ..utils.meters import AverageMeter
from .optim import make_optimizer, make_lr_schedule
from .state import TrainState


class TrainerPose:
    def __init__(self, p: dict, dataset=None, mesh=None,
                 results_folder: Optional[str] = None,
                 nb_ref_imgs: int = 2, output_exp: bool = True):
        self.p = p
        tk = p["train_kwargs"]
        self.nb_ref = nb_ref_imgs
        self.model = PoseExpNet(nb_ref_imgs=nb_ref_imgs,
                                output_exp=output_exp)
        self.output_exp = output_exp
        self.batch_size = tk["batch_size"]
        self.train_num_steps = tk["train_num_steps"]
        self.mesh = mesh if mesh is not None else make_mesh()
        self.ds = dataset
        self.results_folder = results_folder or "/tmp/ldmseg_pose"
        os.makedirs(self.results_folder, exist_ok=True)
        schedule = make_lr_schedule(
            p.get("lr_scheduler_name", "warmup"),
            p["optimizer_kwargs"]["lr"], self.train_num_steps,
            warmup_iters=p["lr_scheduler_kwargs"].get("warmup_iters", 200))
        self.tx = make_optimizer(
            "adamw", learning_rate=schedule,
            weight_decay=p["optimizer_kwargs"].get("weight_decay", 0.0),
            clip_grad=tk.get("clip_grad", 0.0))
        self.state: Optional[TrainState] = None
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _split_clip(self, batch):
        """Clip batch [B, T, ...] -> target = middle frame, refs = rest
        (first nb_ref others)."""
        imgs = batch["image"]
        t = imgs.shape[1]
        mid = t // 2
        target = imgs[:, mid]
        ref_idx = [i for i in range(t) if i != mid][: self.nb_ref]
        refs = jnp.stack([imgs[:, i] for i in ref_idx], axis=1)
        depth = batch["depth"][:, mid]
        return target, refs, depth

    def init_state(self, sample_batch, seed: int = 0):
        target, refs, _ = self._split_clip(
            jax.tree_util.tree_map(jnp.asarray, {
                "image": sample_batch["image"][:1],
                "depth": sample_batch["depth"][:1]}))
        params = jax.jit(self.model.init)(
            jax.random.key(seed), target,
            [refs[:, i] for i in range(self.nb_ref)])
        self.state = TrainState.create(replicate(self.mesh, params),
                                       self.tx)
        return self.state

    def _train_step_impl(self, state: TrainState, batch, key):
        def loss_fn(params):
            target, refs, depth = self._split_clip(batch)
            masks, pose = self.model.apply(
                params, target, [refs[:, i] for i in range(self.nb_ref)],
                train=True)
            exp = None
            if self.output_exp and masks[0] is not None:
                exp = masks[0]  # full-res explainability [B, H, W, R]
            losses = photometric_consistency_loss(
                target, refs, depth, pose, batch["focal"], exp_masks=exp)
            total = losses["photo"] + losses["mask_reg"]
            return total, {"photo": losses["photo"],
                           "mask_reg": losses["mask_reg"]}

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads), {"loss": loss, **parts}

    # ------------------------------------------------------------------
    def train_loop(self, seed: int = 0, max_steps: Optional[int] = None,
                   log_every: int = 20):
        assert self.ds is not None
        from ..data import make_loader
        loader = make_loader(self.ds, self.batch_size, seed=seed)
        max_steps = max_steps or self.train_num_steps
        meter = AverageMeter("loss", ":.4f")
        key = jax.random.key(seed)
        step = 0
        epoch = 0
        while step < max_steps:
            for batch in loader.epoch(epoch):
                def _focal(meta) -> float:
                    if isinstance(meta, list):
                        meta = meta[0]
                    return float(meta.get("focal") or 707.0)
                focal = np.asarray([_focal(m) for m in batch["meta"]],
                                   dtype=np.float32)
                db = shard_batch(self.mesh, {
                    "image": batch["image"].astype(np.float32),
                    "depth": batch["depth"].astype(np.float32),
                    "focal": focal,
                })
                if self.state is None:
                    self.init_state(db, seed)
                key, sub = jax.random.split(key)
                self.state, metrics = self._train_step(self.state, db, sub)
                step += 1
                if step % log_every == 0:
                    meter.update(float(jax.device_get(metrics["loss"])))
                    print(f"pose step {step}: {meter}")
                if step >= max_steps:
                    break
            epoch += 1
        return self.state

    def save(self, step: Optional[int] = None, tag: Optional[str] = None):
        """orbax checkpoint of the pose net (consumed by the stage-3
        handoff: TrainerDiffusion.attach_pose / main_ldm
        ``pose_model_kwargs.pretrained_path``)."""
        import orbax.checkpoint as ocp
        name = tag or f"step_{step if step is not None else 0}"
        path = os.path.join(os.path.abspath(self.results_folder), name)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"params": self.state.params,
                          "nb_ref": np.asarray(self.nb_ref)}, force=True)
        ckptr.wait_until_finished()
        return path

    def resume(self, path: str):
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(path)
        self.state = self.state.replace(params=jax.tree_util.tree_map(
            jnp.asarray, restored["params"]))
        return path

    def predict_poses(self, batch) -> jnp.ndarray:
        """[B, T, H, W, 3] clip -> [B, R, 6] poses for downstream
        frame-consistent sampling."""
        target, refs, _ = self._split_clip(
            jax.tree_util.tree_map(jnp.asarray, batch))
        _, pose = self.model.apply(
            self.state.params, target,
            [refs[:, i] for i in range(self.nb_ref)], train=False)
        return pose
