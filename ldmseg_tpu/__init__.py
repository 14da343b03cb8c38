"""ldmseg_tpu — TPU-native video latent-diffusion panoptic segmentation.

A brand-new JAX / Flax / pjit / Pallas framework with the capabilities of
the reference `weentiaan/Video-latent-diffusion-panoptic-segmentation`
(an LDMSeg-style research stack for depth-aware video panoptic segmentation
on SemKITTI-DVPS / Cityscapes-DVPS).

Layer map (TPU-first redesign, not a port):

  ops/        pure array ops: analog-bits codecs, point sampling (grid-sample
              equivalent), uncertainty sampling, panoptic post-processing,
              Pallas fused kernels
  models/     Flax modules: segmentation VAE, SD-style image VAE (AutoencoderKL),
              SD-style denoising UNet with surgery-at-init, PoseExpNet
  diffusion/  DDIM noise schedule tables + the full sampling loop as one lax.scan
  losses/     PointRend point losses (fixed-shape), diffusion MSE losses
  data/       host pipelines for KITTI-DVPS / Cityscapes-DVPS / COCO + synthetic
  parallel/   mesh construction, sharding rules, collective helpers
  train/      optax train states + AE / LDM trainers (pjit train steps)
  evals/      mIoU, PQ, vectorized (D)VPQ
  utils/      config dataclasses, meters, logging

Reference parity citations in docstrings use `path:line` into the upstream
repo (e.g. ``ldmseg/schedulers/ddim_scheduler.py:26``).
"""

__version__ = "0.1.0"
