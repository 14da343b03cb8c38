"""Standalone latent upscaler (decoder-only model).

Reference: ldmseg/models/upscaler.py:19-130 — the segmentation-VAE
decoder as an independent model, with optional RGB-latent fusion (channel
concat doubles the latent input, :41-44,:127-128) and the same
ConvTranspose/LayerNorm2d/GroupNorm head. Used to decode diffusion
latents straight to instance logits without a full VAE.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .seg_vae import SegDecoder


class Upscaler(nn.Module):
    latent_channels: int = 4
    int_channels: int = 256
    upscaler_channels: int = 256
    out_channels: int = 128
    num_mid_blocks: int = 0
    num_upscalers: int = 1
    fuse_rgb: bool = False
    downsample_factor: int = 8
    norm_num_groups: int = 32

    @property
    def interpolation_factor(self) -> int:
        return self.downsample_factor // (2 ** self.num_upscalers)

    def setup(self):
        self.decoder = SegDecoder(
            int_channels=self.int_channels,
            out_channels=self.out_channels,
            norm_num_groups=self.norm_num_groups,
            num_mid_blocks=self.num_mid_blocks,
            num_upscalers=self.num_upscalers,
            upscale_channels=self.upscaler_channels,
            name="decoder",
        )

    def decode(self, z: jnp.ndarray, interpolate: bool = True) -> jnp.ndarray:
        x = self.decoder(z)
        f = self.interpolation_factor
        if interpolate and f != 1:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * f, w * f, c), "linear")
        return x

    def __call__(self, z: jnp.ndarray, interpolate: bool = False,
                 z_rgb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if z_rgb is not None and self.fuse_rgb:
            z = jnp.concatenate([z, z_rgb], axis=-1)
        return self.decode(z, interpolate=interpolate)
