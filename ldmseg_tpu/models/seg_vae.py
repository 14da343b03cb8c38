"""Segmentation VAE — Flax redesign of the reference ``GeneralVAESeg``
(ldmseg/models/vae.py:42-307).

Compresses analog-bits panoptic maps into a 4-channel latent at 1/8
resolution and decodes to per-instance logits. Channels-last throughout.

Capabilities mirrored:
  * shallow conv encoder with 3 stride-2 stages (vae.py:175-245), optional
    mid resnet blocks, optional ``skip_encoder`` (8x8/8 conv, :187-189) and
    ``resize_input`` (bilinear /8 + convs, :209-212) variants, optional RGB
    fusion by channel concat (:87-89 + forward :287-288)
  * four bottleneck parametrizations: gaussian / auto / gumbel-softmax /
    discrete codebook (vae.py:326-570), incl. act_fn range mapping and
    clamp_output
  * decoder with ConvTranspose upscalers + LayerNorm2d + GroupNorm head
    (:124-173), and bilinear x``interpolation_factor`` on decode (:268-272)

Note on ``resize_input``: the reference wires ``block_out_channels[-1]`` as
the input width of the post-resize conv even though the in-block emits
``int_channels`` (vae.py:192,215) — it only works when the two are equal.
We use ``int_channels`` consistently.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm2d, MidBlock2D


def _to_range(x: jnp.ndarray, act_fn: str, clip_range: float = 1.0) -> jnp.ndarray:
    """Bottleneck activation mapping (vae.py:340-352)."""
    if act_fn == "sigmoid":
        return 2.0 * jax.nn.sigmoid(x) - 1.0
    if act_fn == "tanh":
        return jnp.tanh(x)
    if act_fn == "clip":
        return jnp.clip(x, -clip_range, clip_range)
    if act_fn == "l2":
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-12)
    if act_fn == "none":
        return x
    raise NotImplementedError(act_fn)


@dataclasses.dataclass
class DiagonalGaussian:
    """Diagonal Gaussian posterior (vae.py:371-425); moments channels-last."""

    mean: jnp.ndarray
    logvar: jnp.ndarray

    @classmethod
    def from_moments(cls, moments, clamp_output=False, act_fn="none"):
        if clamp_output:
            moments = jnp.clip(moments, -5.0, 5.0)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        mean = _to_range(mean, act_fn)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return cls(mean=mean, logvar=logvar)

    def mode(self):
        return self.mean

    def sample(self, key):
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(key, self.mean.shape,
                                                   self.mean.dtype)

    def kl(self):
        """KL to N(0, I), summed over all but batch (vae.py:417-418)."""
        var = jnp.exp(self.logvar)
        return 0.5 * jnp.sum(self.mean**2 + var - 1.0 - self.logvar,
                             axis=tuple(range(1, self.mean.ndim)))


@dataclasses.dataclass
class AutoBottleneck:
    """Plain AE bottleneck (vae.py:326-368); kl() is an L2 penalty."""

    mean: jnp.ndarray

    @classmethod
    def from_moments(cls, moments, clamp_output=False, act_fn="none"):
        return cls(mean=_to_range(moments, act_fn, clip_range=5.0))

    def mode(self):
        return self.mean

    def sample(self, key):
        return self.mean

    def kl(self):
        return jnp.sum(self.mean**2, axis=tuple(range(1, self.mean.ndim)))


def _codebook_project(one_hot: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,N] x [N,D] -> [B,H,W,D] (vae.py:470-471 einsum, NHWC)."""
    return jnp.einsum("bhwn,nd->bhwd", one_hot, codebook)


@dataclasses.dataclass
class GumbelSoftmaxBottleneck:
    """Straight-through gumbel-softmax over a codebook (vae.py:428-497)."""

    logits: jnp.ndarray
    codebook: jnp.ndarray
    temp: float = 0.2

    @classmethod
    def from_moments(cls, moments, codebook, clamp_output=False,
                     act_fn="none"):
        if clamp_output:
            moments = jnp.clip(moments, -5.0, 5.0)
        return cls(logits=moments, codebook=codebook)

    def mode(self):
        idx = jnp.argmax(self.logits, axis=-1)
        one_hot = jax.nn.one_hot(idx, self.codebook.shape[0],
                                 dtype=self.codebook.dtype)
        return _codebook_project(one_hot, self.codebook)

    def sample(self, key):
        g = jax.random.gumbel(key, self.logits.shape, self.logits.dtype)
        y_soft = jax.nn.softmax((self.logits + g) / self.temp, axis=-1)
        idx = jnp.argmax(y_soft, axis=-1)
        y_hard = jax.nn.one_hot(idx, self.logits.shape[-1], dtype=y_soft.dtype)
        # straight-through estimator (torch F.gumbel_softmax hard=True)
        y = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        return _codebook_project(y, self.codebook)

    def kl(self):
        """KL(q || uniform) batchmean (vae.py:484-490)."""
        n = self.logits.shape[-1]
        logq = jax.nn.log_softmax(self.logits, axis=-1)
        q = jnp.exp(logq)
        kl = jnp.sum(q * (logq - jnp.log(1.0 / n)), axis=-1)
        return jnp.mean(kl)


@dataclasses.dataclass
class CodebookBottleneck:
    """Hard argmax codebook assignment with straight-through gradients
    (vae.py:500-570)."""

    logits: jnp.ndarray
    codebook: jnp.ndarray

    @classmethod
    def from_moments(cls, moments, codebook, clamp_output=False,
                     act_fn="none"):
        if clamp_output:
            moments = jnp.clip(moments, -5.0, 5.0)
        return cls(logits=moments, codebook=codebook)

    def mode(self):
        idx = jnp.argmax(self.logits, axis=-1)
        one_hot = jax.nn.one_hot(idx, self.codebook.shape[0],
                                 dtype=self.codebook.dtype)
        return _codebook_project(one_hot, self.codebook)

    def sample(self, key):
        idx = jnp.argmax(self.logits, axis=-1)
        y_hard = jax.nn.one_hot(idx, self.logits.shape[-1],
                                dtype=self.logits.dtype)
        y = jax.lax.stop_gradient(y_hard - self.logits) + self.logits
        return _codebook_project(y, self.codebook)

    def kl(self):
        n = self.logits.shape[-1]
        logq = jax.nn.log_softmax(self.logits, axis=-1)
        q = jnp.exp(logq)
        kl = jnp.sum(q * (logq - jnp.log(1.0 / n)), axis=-1)
        return jnp.mean(kl)


class SegEncoder(nn.Module):
    """Encoder half (vae.py:175-245)."""

    block_out_channels: Tuple[int, ...]
    int_channels: int
    out_channels: int
    norm_num_groups: int
    num_mid_blocks: int
    resize_input: bool
    skip_encoder: bool
    downsample_factor: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.skip_encoder:
            f = self.downsample_factor
            return nn.Conv(self.out_channels, (f, f), strides=(f, f),
                           padding="VALID", name="skip_conv")(x)

        if self.resize_input:
            h = nn.Conv(self.int_channels, (3, 3), padding=1,
                        name="in_conv")(x)
            h = nn.silu(h)
            b, hh, ww, c = h.shape
            f = self.downsample_factor
            h = jax.image.resize(h, (b, hh // f, ww // f, c), "linear")
        else:
            h = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                        name="in_conv")(x)
            h = nn.silu(h)
            for i in range(len(self.block_out_channels) - 1):
                cin = self.block_out_channels[i]
                h = nn.Conv(cin, (3, 3), padding=1, name=f"down{i}_conv1")(h)
                h = nn.Conv(self.block_out_channels[i + 1], (3, 3),
                            strides=(2, 2), padding=1,
                            name=f"down{i}_conv2")(h)
                h = nn.silu(h)
        h = nn.Conv(self.int_channels, (3, 3), padding=1, name="out_conv1")(h)
        for i in range(self.num_mid_blocks):
            h = MidBlock2D(self.int_channels, groups=self.norm_num_groups,
                           name=f"mid{i}")(h)
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         name="norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="out_conv2")(h)
        return h


class SegDecoder(nn.Module):
    """Decoder half (vae.py:124-173).

    ``use_int8`` routes the convs and the conv-transpose matmuls through
    the s8 MXU path (inference-only; the train graph keeps bf16).
    """

    int_channels: int
    out_channels: int
    norm_num_groups: int
    num_mid_blocks: int
    num_upscalers: int
    upscale_channels: int
    use_int8: bool = False
    int8_act_scale: Optional[float] = None

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        if self.use_int8:
            import functools
            from ..ops.quant import QuantConv
            Conv3 = functools.partial(QuantConv,
                                      act_scale=self.int8_act_scale)
        else:
            Conv3 = nn.Conv
        h = Conv3(self.int_channels, (3, 3), padding=1, name="in_conv")(z)
        if self.num_mid_blocks > 0:
            h = MidBlock2D(self.int_channels, groups=self.norm_num_groups,
                           name="mid")(h)
        dim = self.upscale_channels
        for i in range(self.num_upscalers):
            # pixel-shuffle form of ConvTranspose 2x2/s2 (same params,
            # bit-exact; avoids XLA's zero-insertion copy lowering)
            from .layers import ConvTranspose2x
            h = ConvTranspose2x(dim, use_int8=self.use_int8,
                                act_scale=self.int8_act_scale,
                                name=f"up{i}_convt")(h)
            h = LayerNorm2d(name=f"up{i}_ln")(h)
            h = nn.silu(h)
        # torch nn.GroupNorm default eps (1e-5) in the decoder head
        # (vae.py:163)
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-5,
                         name="norm")(h)
        h = nn.silu(h)
        h = Conv3(self.out_channels, (3, 3), padding=1, name="out_conv")(h)
        return h


class SegVAE(nn.Module):
    """The stage-1 segmentation (V)AE.

    Defaults mirror tools/configs/base/base.yaml:14-33 (16 bit channels in,
    128 instance logits out, 4-ch latent, two upscalers).
    """

    in_channels: int = 16
    int_channels: int = 256
    out_channels: int = 128
    block_out_channels: Tuple[int, ...] = (32, 64, 128, 256)
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.2
    num_mid_blocks: int = 0
    num_latents: int = 2
    num_upscalers: int = 1
    upscale_channels: int = 256
    parametrization: str = "gaussian"
    act_fn: str = "none"
    clamp_output: bool = False
    freeze_codebook: bool = False
    fuse_rgb: bool = False
    resize_input: bool = False
    skip_encoder: bool = False
    image_encoder: bool = False  # share the SD AutoencoderKL encoder
    num_embeddings: int = 128
    use_int8: bool = False  # s8 MXU decoder convs (inference-only)
    int8_act_scale: Optional[float] = None

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @property
    def interpolation_factor(self) -> int:
        return self.downsample_factor // (2 ** self.num_upscalers)

    def _effective_num_latents(self) -> int:
        if "discrete" in self.parametrization:
            return self.num_embeddings // self.latent_channels
        if self.parametrization == "auto":
            return 1
        return self.num_latents

    def setup(self):
        enc_out = self.latent_channels * self._effective_num_latents()
        if "discrete" in self.parametrization:
            enc_out = self.num_embeddings
            if self.freeze_codebook:
                # deterministic orthogonal codebook (vae.py:77-80)
                def init(key):
                    q, _ = jnp.linalg.qr(
                        jax.random.normal(key, (self.num_embeddings,
                                                self.latent_channels)))
                    return q.astype(jnp.float32)
                self._codebook_var = self.variable(
                    "constants", "codebook", init,
                    jax.random.key(42))
            else:
                self._codebook_param = self.param(
                    "codebook", nn.initializers.normal(1.0),
                    (self.num_embeddings, self.latent_channels))
        if self.image_encoder:
            # shared_vae_encoder option (base.yaml:13; vae.py:87-95 passes
            # an external frozen encoder): the SD AutoencoderKL encoder
            # topology, so pretrained SD weights drop in via
            # torch_import.load_diffusers_vae's encoder subtree.
            from .image_vae import VAEEncoder
            assert self.parametrization == "gaussian" and \
                self._effective_num_latents() == 2, \
                "image_encoder implies gaussian moments (2x latent)"
            self.encoder = VAEEncoder(latent_channels=self.latent_channels,
                                      name="encoder")
        else:
            self.encoder = SegEncoder(
                block_out_channels=self.block_out_channels,
                int_channels=self.int_channels,
                out_channels=enc_out,
                norm_num_groups=self.norm_num_groups,
                num_mid_blocks=self.num_mid_blocks,
                resize_input=self.resize_input,
                skip_encoder=self.skip_encoder,
                downsample_factor=self.downsample_factor,
                name="encoder",
            )
        self.decoder = SegDecoder(
            int_channels=self.int_channels,
            out_channels=self.out_channels,
            norm_num_groups=self.norm_num_groups,
            num_mid_blocks=self.num_mid_blocks,
            num_upscalers=self.num_upscalers,
            upscale_channels=self.upscale_channels,
            use_int8=self.use_int8,
            int8_act_scale=self.int8_act_scale,
            name="decoder",
        )

    def _get_codebook(self):
        if self.freeze_codebook:
            return jax.lax.stop_gradient(self._codebook_var.value)
        return self._codebook_param

    def _make_posterior(self, moments):
        if self.parametrization == "gaussian":
            return DiagonalGaussian.from_moments(
                moments, clamp_output=self.clamp_output, act_fn=self.act_fn)
        if self.parametrization == "auto":
            return AutoBottleneck.from_moments(
                moments, clamp_output=self.clamp_output, act_fn=self.act_fn)
        if self.parametrization == "discrete_gumbel_softmax":
            return GumbelSoftmaxBottleneck.from_moments(
                moments, self._get_codebook(), clamp_output=self.clamp_output)
        if self.parametrization == "discrete_codebook":
            return CodebookBottleneck.from_moments(
                moments, self._get_codebook(), clamp_output=self.clamp_output)
        raise NotImplementedError(self.parametrization)

    def encode(self, x: jnp.ndarray):
        """x ``[B,H,W,Cin]`` -> posterior over ``[B,H/8,W/8,latent]``."""
        moments = self.encoder(x)
        return self._make_posterior(moments)

    def decode(self, z: jnp.ndarray, interpolate: bool = True) -> jnp.ndarray:
        """Latent -> logits ``[B,h,w,out_channels]``; bilinear x
        ``interpolation_factor`` when ``interpolate`` (vae.py:268-272)."""
        x = self.decoder(z)
        f = self.interpolation_factor
        if interpolate and f != 1:
            if f == 2:
                # gather-free fast path (exact same half-pixel bilinear)
                from ..ops.resize import bilinear_upsample_2x
                x = bilinear_upsample_2x(x)
            else:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * f, w * f, c), "linear")
        return x

    def __call__(
        self,
        sample: jnp.ndarray,
        sample_posterior: bool = True,
        rgb_sample: Optional[jnp.ndarray] = None,
        valid_mask: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ):
        """Full AE pass (vae.py:274-307). Returns (logits, posterior).

        ``valid_mask``: ``[B, h_latent, w_latent]`` float; zeros out invalid
        latent positions (vae.py:299-300).
        """
        x = sample
        if rgb_sample is not None:
            x = jnp.concatenate([x, rgb_sample], axis=-1)
        posterior = self.encode(x)
        if sample_posterior:
            if rng is None:
                rng = self.make_rng("sample")
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        if valid_mask is not None:
            z = z * valid_mask[..., None]
        dec = self.decode(z, interpolate=False)
        return dec, posterior
