"""SD AutoencoderKL image VAE — Flax, channels-last.

The reference uses a frozen pretrained Stable-Diffusion v1-4
``AutoencoderKL`` as the RGB latent encoder, with the decoder replaced by
``nn.Identity`` and scaling factor 0.18215 (tools/main_ldm.py:138-140,
``GeneralVAEImage`` vae.py:36-39). We implement the full encoder/decoder so
the framework also covers image reconstruction; weights load from a
diffusers torch state_dict via ``convert_diffusers_vae`` in
``models/torch_import.py``.

Architecture (SD v1): 4 DownEncoderBlocks (128, 256, 512, 512) x2 resnets,
asymmetric-padded stride-2 downsamples, attention mid block, 2*4-ch
moments + 1x1 quant convs; mirror decoder with 3-resnet up blocks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ResnetBlock, AttentionBlock2D
from .seg_vae import DiagonalGaussian


class DownEncoderBlock(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    groups: int = 32
    use_int8: bool = False
    int8_act_scale: float | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, groups=self.groups, eps=1e-6,
                            use_int8=self.use_int8,
                            int8_act_scale=self.int8_act_scale,
                            name=f"resnet{i}")(x)
        if self.add_downsample:
            # diffusers VAE downsample: asymmetric (0,1) pad + stride-2 conv
            if self.use_int8:
                from ..ops.quant import QuantConv
                x = QuantConv(self.out_channels, (3, 3), strides=(2, 2),
                              padding=((0, 1), (0, 1)),
                              name="downsample")(x)
            else:
                x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), name="downsample")(x)
        return x


class UpDecoderBlock(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, groups=self.groups, eps=1e-6,
                            name=f"resnet{i}")(x)
        if self.add_upsample:
            from .unet import nearest_upsample_2x
            x = nearest_upsample_2x(x)
            x = nn.Conv(self.out_channels, (3, 3), padding=1,
                        name="upsample")(x)
        return x


class VAEEncoder(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    layers_per_block: int = 2
    groups: int = 32
    use_fused_attention: bool = False
    use_int8: bool = False  # s8 MXU resnet convs (inference-only)
    int8_act_scale: float | None = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(x)
        for i, cout in enumerate(self.block_out_channels):
            x = DownEncoderBlock(
                cout, self.layers_per_block,
                add_downsample=i < len(self.block_out_channels) - 1,
                groups=self.groups, use_int8=self.use_int8,
                int8_act_scale=self.int8_act_scale, name=f"down{i}")(x)
        c = self.block_out_channels[-1]
        x = ResnetBlock(c, groups=self.groups, eps=1e-6,
                        use_int8=self.use_int8,
                        int8_act_scale=self.int8_act_scale,
                        name="mid_resnet0")(x)
        x = AttentionBlock2D(c, groups=self.groups, eps=1e-6,
                             use_fused=self.use_fused_attention,
                             name="mid_attn")(x)
        x = ResnetBlock(c, groups=self.groups, eps=1e-6,
                        use_int8=self.use_int8,
                        int8_act_scale=self.int8_act_scale,
                        name="mid_resnet1")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                    name="conv_out")(x)
        return x


class VAEDecoder(nn.Module):
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    layers_per_block: int = 3
    out_channels: int = 3
    groups: int = 32

    @nn.compact
    def __call__(self, z):
        rev = tuple(reversed(self.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, name="conv_in")(z)
        x = ResnetBlock(rev[0], groups=self.groups, eps=1e-6,
                        name="mid_resnet0")(x)
        x = AttentionBlock2D(rev[0], groups=self.groups, eps=1e-6,
                             name="mid_attn")(x)
        x = ResnetBlock(rev[0], groups=self.groups, eps=1e-6,
                        name="mid_resnet1")(x)
        for i, cout in enumerate(rev):
            x = UpDecoderBlock(
                cout, self.layers_per_block,
                add_upsample=i < len(rev) - 1,
                groups=self.groups, name=f"up{i}")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       name="conv_out")(x)


class ImageVAE(nn.Module):
    """AutoencoderKL with the SD quant convs.

    ``encode`` returns a :class:`DiagonalGaussian`; multiply latents by
    ``scaling_factor`` (0.18215) at the call site exactly like the
    reference (trainers_ldm_cond.py:394).
    """

    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 4
    out_channels: int = 3
    scaling_factor: float = 0.18215
    decoder_enabled: bool = True
    groups: int = 32  # GN groups; shrink along with block_out_channels
    use_fused_attention: bool = False
    use_int8: bool = False  # s8 MXU encoder resnet convs (inference-only)
    int8_act_scale: float | None = None

    def setup(self):
        self.encoder = VAEEncoder(
            self.block_out_channels, self.latent_channels,
            groups=self.groups,
            use_fused_attention=self.use_fused_attention,
            use_int8=self.use_int8, int8_act_scale=self.int8_act_scale,
            name="encoder")
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  name="quant_conv")
        if self.decoder_enabled:
            self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                           name="post_quant_conv")
            self.decoder = VAEDecoder(self.block_out_channels,
                                      self.latent_channels,
                                      out_channels=self.out_channels,
                                      groups=self.groups,
                                      name="decoder")

    def encode(self, x: jnp.ndarray) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, sample_posterior: bool = False, rng=None):
        posterior = self.encode(x)
        if sample_posterior:
            z = posterior.sample(rng if rng is not None
                                 else self.make_rng("sample"))
        else:
            z = posterior.mode()
        return self.decode(z), posterior
