"""Shared Flax building blocks (NHWC, TPU-native).

These cover the small set of layers the reference pulls from torch /
diffusers: LayerNorm2d (detectron2 style, vae.py:310-323), the
ResnetBlock2D / UNetMidBlock2D pair (diffusers, used by the VAEs), and
timestep embeddings (diffusers ``Timesteps`` + ``TimestepEmbedding``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class LayerNorm2d(nn.Module):
    """Per-pixel channel layer norm (reference vae.py:310-323).

    In NHWC this is a plain LayerNorm over the trailing channel axis.
    """

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.eps, use_bias=True, use_scale=True,
                            name="ln")(x)


class GroupNormSiLU(nn.Module):
    """GN + SiLU with the same param layout as ``nn.GroupNorm``
    (params/<name>/{scale,bias}) so checkpoints are interchangeable.
    Dispatches to the fused Pallas kernel when ``use_pallas`` and the
    image tile fits in VMEM, else the XLA path."""

    groups: int = 32
    eps: float = 1e-6
    use_pallas: bool = False
    quantize: bool = False  # emit (int8, per-image scale); inference only
    # inference-only low-precision mode: stats ACCUMULATE in f32 but the
    # tensor is never materialized in f32 — the convert+center+square
    # chain fuses into the reduction reading bf16, and the normalize
    # applies as a per-(image,channel) bf16 affine. Halves the HBM
    # traffic of the GN producer chains feeding the s8 convs (the
    # `convert_reduce_fusion` trace hotspot, BENCH_NOTES r3); below the
    # int8 path's own quant noise. Training keeps the f32 path (torch
    # numerics parity).
    lowp: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.quantize:
            from ..ops.pallas.groupnorm_silu import group_norm_silu_quant
            return group_norm_silu_quant(x, scale, bias, self.groups,
                                         self.eps)
        if self.use_pallas:
            from ..ops.pallas.groupnorm_silu import group_norm_silu
            return group_norm_silu(x, scale, bias, self.groups, self.eps)
        cg = c // self.groups
        xs = x.shape
        if self.lowp and x.dtype != jnp.float32:
            xr = x.reshape(xs[0], -1, self.groups, cg)
            mean = jnp.mean(xr, axis=(1, 3), keepdims=True,
                            dtype=jnp.float32)
            var = jnp.mean(jnp.square(xr.astype(jnp.float32) - mean),
                           axis=(1, 3), keepdims=True)
            inv = jax.lax.rsqrt(var + self.eps)      # [B,1,G,1] f32
            w = scale.reshape(1, 1, self.groups, cg) * inv
            b = bias.reshape(1, 1, self.groups, cg) - mean * w
            y = x * w.reshape(xs[0], 1, 1, c).astype(x.dtype) \
                + b.reshape(xs[0], 1, 1, c).astype(x.dtype)
            return nn.silu(y)
        xf = x.astype(jnp.float32).reshape(xs[0], -1, self.groups, cg)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=(1, 3), keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(xs)
        y = y * scale + bias
        return nn.silu(y).astype(x.dtype)


class ResnetBlock(nn.Module):
    """diffusers-style ResnetBlock2D: GN-silu-conv ×2 + skip, optional
    time-embedding bias added between the halves.

    ``use_pallas_gn`` routes the GN+SiLU pairs through the fused Pallas
    kernel (ops/pallas/groupnorm_silu.py); parameters stay identical, so
    the flag can be flipped on loaded checkpoints.
    """

    out_channels: int
    groups: int = 32
    eps: float = 1e-6
    use_conv_shortcut: bool = False
    output_scale_factor: float = 1.0
    use_pallas_gn: bool = False
    use_int8: bool = False  # int8 MXU fast path for the 3x3 convs
    int8_act_scale: Optional[float] = None  # static activation scale
    # fuse quantization into the GN+SiLU Pallas pass (per-image dynamic
    # scale at zero extra HBM traffic; INFERENCE-ONLY — int8 tensors carry
    # no tangent). False -> in-graph quantization with straight-through
    # gradients (train-safe).
    int8_fuse_gn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.use_int8:
            import functools
            from ..ops.quant import QuantConv
            Conv3 = functools.partial(QuantConv,
                                      act_scale=self.int8_act_scale)
        else:
            Conv3 = nn.Conv
        quant_gn = self.use_int8 and self.int8_fuse_gn
        # use_int8 marks the inference-only path: its GN producers run
        # bf16-elementwise with f32-accumulated stats (lowp)
        in_channels = x.shape[-1]
        h = GroupNormSiLU(groups=self.groups, eps=self.eps,
                          use_pallas=self.use_pallas_gn,
                          quantize=quant_gn, lowp=self.use_int8,
                          name="norm1")(x)
        h = Conv3(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
            # keep the activation dtype: an f32 temb here would promote h
            # (and the rest of the network) to f32
            h = h + t.astype(h.dtype)[:, None, None, :]
        h = GroupNormSiLU(groups=self.groups, eps=self.eps,
                          use_pallas=self.use_pallas_gn,
                          quantize=quant_gn, lowp=self.use_int8,
                          name="norm2")(h)
        h = Conv3(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if in_channels != self.out_channels:
            if self.use_conv_shortcut:
                x = nn.Conv(self.out_channels, (3, 3), padding=1,
                            name="conv_shortcut")(x)
            else:
                x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return (x + h) / self.output_scale_factor


class AttentionBlock2D(nn.Module):
    """Single-head spatial self-attention over HW tokens (diffusers VAE
    mid-block attention). ``use_fused`` routes through the Pallas
    VMEM-softmax kernel (D=512 is lane-aligned — zero padding waste)."""

    channels: int
    groups: int = 32
    eps: float = 1e-6
    num_heads: int = 1
    use_fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(y)
        k = nn.Dense(c, name="to_k")(y)
        v = nn.Dense(c, name="to_v")(y)
        hd = c // self.num_heads
        q = q.reshape(b, -1, self.num_heads, hd)
        k = k.reshape(b, -1, self.num_heads, hd)
        v = v.reshape(b, -1, self.num_heads, hd)
        if self.use_fused:
            from ..ops.pallas.attention import fused_self_attention
            y = fused_self_attention(q, k, v, 1.0 / math.sqrt(hd),
                                     block_q=512)
            y = y.reshape(b, h * w, c)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            attn = nn.softmax(attn, axis=-1)
            y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h * w, c)
        y = nn.Dense(c, name="to_out")(y)
        return residual + y.reshape(b, h, w, c)


class MidBlock2D(nn.Module):
    """diffusers UNetMidBlock2D without cross-attention: resnet (+ optional
    self-attn) + resnet. Used by the VAEs (vae.py:137-146, add_attention
    False for the seg VAE; True with one head for AutoencoderKL)."""

    channels: int
    groups: int = 32
    eps: float = 1e-6
    add_attention: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = ResnetBlock(self.channels, groups=self.groups, eps=self.eps,
                        name="resnet0")(x, temb)
        if self.add_attention:
            x = AttentionBlock2D(self.channels, groups=self.groups,
                                 eps=self.eps, name="attn0")(x)
        x = ResnetBlock(self.channels, groups=self.groups, eps=self.eps,
                        name="resnet1")(x, temb)
        return x


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers ``get_timestep_embedding``
    with the SD flags flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP on top of the sinusoidal embedding (diffusers)."""

    dim: int

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Dense(self.dim, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, name="linear_2")(emb)
        return emb

class ConvTranspose2x(nn.Module):
    """``nn.ConvTranspose(features, (2,2), strides=(2,2), padding=VALID)``
    computed as a 1x1 matmul to ``4*features`` + pixel shuffle.

    XLA lowers stride-2 conv-transpose via zero-insertion padding, which
    shows up as the dominant ``copy`` ops in the SegVAE decode trace
    (11.5 ms/call of 23.4 at b16 256x512). With kernel == stride the
    output blocks are independent, so the op is exactly one MXU matmul
    plus an interleaving reshape. Param layout is IDENTICAL to
    ``nn.ConvTranspose`` (kernel ``(2, 2, Cin, Cout)``, bias) so existing
    checkpoints and ``torch_import`` keep working; numerics match
    bit-for-bit (the lax.conv_transpose convention mirrors the kernel,
    hence the ``[::-1, ::-1]`` flip).

    ``use_int8`` (or a prequantized ``{"q","scale"}`` kernel leaf from
    ``ops.quant.prequantize_conv_tree``) routes the matmul through the
    s8 MXU path: inference-only, accuracy-gated like the other int8
    sites (tests/test_int8_inference.py).
    """

    features: int
    use_int8: bool = False
    act_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        o = self.features
        x2 = x.reshape(b * h * w, c)
        if isinstance(kernel, dict):
            # pre-quantized (2,2,C,O) int8 kernel with per-O scale
            w_q, w_scale = kernel["q"], kernel["scale"]
            w2q = w_q[::-1, ::-1].transpose(2, 0, 1, 3).reshape(c, 4 * o)
            # column order after the reshape is (kh, kw, o) -> the per-O
            # scale tiles 4x along the columns
            col_scale = jnp.tile(w_scale, 4)
            site_scale = kernel.get("x_scale", self.act_scale)
            x_f = x2.astype(jnp.float32)
            if site_scale is None:
                x_scale = jnp.maximum(jnp.max(jnp.abs(x_f)), 1e-8) / 127.0
            else:
                x_scale = jnp.float32(site_scale)
            x_q = jnp.clip(jnp.round(x_f / x_scale), -127,
                           127).astype(jnp.int8)
            y = jax.lax.dot_general(
                x_q, w2q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * (x_scale * col_scale)
                 ).astype(x.dtype)
        else:
            w2 = kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(c, 4 * o)
            if self.use_int8:
                from ..ops.quant import int8_dot
                y = int8_dot(x2, w2, self.act_scale)
            else:
                y = jnp.dot(x2, w2.astype(x.dtype))
        y = y.reshape(b, h, w, 2, 2, o).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, 2 * h, 2 * w, o) + bias.astype(x.dtype)
