"""Pallas TPU kernel: fused s8 GEGLU feed-forward.

The transformer FF is the UNet's biggest single HBM consumer at b16: the
proj_in matmul writes a [16, 2048, 2560] bf16 intermediate (168 MB per
2048-token layer), a standalone kLoop fusion re-reads it to compute
``h * gelu(gate)`` + the s8 quantize for proj_out (the trace's 0.67 ms
``clamp_convert_fusion`` per layer), and proj_out reads the s8 result
back. XLA cannot fuse the GEGLU into the matmul epilogue because the
gating mixes the two HALVES of the output (out[:, :M] * gelu(out[:, M:]))
— not an elementwise access pattern.

This kernel keeps the whole chain in VMEM per (batch, token-block) grid
step: x (bf16) -> static-scale s8 quantize -> s8 matmul W1 -> dequant ->
h * gelu(gate) -> dynamic-amax s8 quantize -> s8 matmul W2 -> bf16 out.
Only x and the final output touch HBM. Both matmuls run s8 on the MXU
with NO lane padding (C=320, 2M=2560, M=1280 are all fine tile sizes —
unlike attention's D=40 heads).

Weights ride pre-quantized (per-out-channel scales) in the SAME
``{"q", "scale"}`` format ``prequantize_conv_tree(quantize_ff=True)``
already emits for QuantDense — the kernel is a drop-in for the s8
feed-forward path. Inference-only (training uses the bf16 graph).

Reference parity: diffusers GEGLU (ldmseg's UNet feed-forward,
ldmseg/models/unet.py via diffusers FeedForward: proj to 2*4*dim, exact
gelu gate); numerics gated in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_exact(x):
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def _gelu_tanh(x):
    """tanh-approximate gelu, written with exp (Mosaic lowers exp but not
    erf). 0.5*x*(1+tanh(z)) == x*sigmoid(2z) exactly, which saves three
    VPU passes vs the expanded tanh form. Max deviation from exact gelu
    ~3e-3 — far below the s8 quantization error this kernel already
    carries; the XLA fallback keeps the exact form."""
    z = 0.7978845608028654 * (x + 0.044715 * x * x * x)
    return x / (1.0 + jnp.exp(-2.0 * z))


def _quantize_inner(g, sc_ref, static_g: bool):
    """Quantize the gated interior for the second s8 matmul. With a
    calibrated static scale (sc tile [0, 1]) the full-[BQ, M] amax
    reduce pass disappears — only the divide/round that any scale needs
    remains; clip guards saturation (the dynamic path's own amax can't
    exceed 127 by construction)."""
    if static_g:
        gs = sc_ref[0, 1]
        return jnp.clip(jnp.round(g / gs), -127, 127).astype(jnp.int8), gs
    gs = jnp.maximum(jnp.max(jnp.abs(g)), 1e-6) / 127.0
    return jnp.round(g / gs).astype(jnp.int8), gs


def _geglu_kernel(x_ref, w1_ref, w2_ref, s1_ref, s2_ref, sc_ref, o_ref,
                  *, static_g: bool = False):
    x = x_ref[0]                                  # [BQ, C] bf16
    xs = sc_ref[0, 0]
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                  -127, 127).astype(jnp.int8)
    u32 = jax.lax.dot_general(
        x8, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)         # [BQ, 2M]
    u = u32.astype(jnp.float32) * (xs * s1_ref[0]) + s1_ref[1]
    m = u.shape[-1] // 2
    h = u[:, :m]
    gate = u[:, m:]
    g = h * _gelu_tanh(gate)                      # [BQ, M]
    g8, gs = _quantize_inner(g, sc_ref, static_g)
    y32 = jax.lax.dot_general(
        g8, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)         # [BQ, C]
    y = y32.astype(jnp.float32) * (gs * s2_ref[0])
    o_ref[0] = y.astype(o_ref.dtype)


def _geglu_impl(x, w1q, w2q, s1, s2, sc, block_t, static_g=False):
    b, t, c = x.shape
    m2 = w1q.shape[1]
    block_t = min(block_t, t)
    grid = (b, t // block_t)
    return pl.pallas_call(
        functools.partial(_geglu_kernel, static_g=static_g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1q.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2q.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s1.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s2.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w1q, w2q, s1, s2, sc)


def _geglu_ln_kernel(x_ref, w1_ref, w2_ref, s1_ref, s2_ref, g_ref,
                     sc_ref, o_ref, *, eps: float,
                     static_g: bool = False):
    """LN3 + GEGLU + proj_out bias + residual in one VMEM pass.

    Same math as :func:`_geglu_kernel` with the transformer block's
    surrounding elementwise ops absorbed: the pre-FF LayerNorm (whose
    [B,T,C] output otherwise round-trips HBM), the proj_out bias, and
    the residual add (another full [B,T,C] read+write). ``g`` tile rows:
    0=ln scale, 1=ln bias, 2=proj_out bias."""
    xf = x_ref[0].astype(jnp.float32)             # [BQ, C]
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + g_ref[1]
    xs = sc_ref[0, 0]
    x8 = jnp.clip(jnp.round(h / xs), -127, 127).astype(jnp.int8)
    u32 = jax.lax.dot_general(
        x8, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)         # [BQ, 2M]
    u = u32.astype(jnp.float32) * (xs * s1_ref[0]) + s1_ref[1]
    m = u.shape[-1] // 2
    g = u[:, :m] * _gelu_tanh(u[:, m:])           # [BQ, M]
    g8, gs = _quantize_inner(g, sc_ref, static_g)
    y32 = jax.lax.dot_general(
        g8, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)         # [BQ, C]
    y = xf + y32.astype(jnp.float32) * (gs * s2_ref[0]) + g_ref[2]
    o_ref[0] = y.astype(o_ref.dtype)


def _geglu_ln_impl(x, w1q, w2q, s1, s2, g, sc, block_t, eps,
                   static_g=False):
    b, t, c = x.shape
    block_t = min(block_t, t)
    grid = (b, t // block_t)
    return pl.pallas_call(
        functools.partial(_geglu_ln_kernel, eps=eps, static_g=static_g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1q.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2q.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s1.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s2.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w1q, w2q, s1, s2, g, sc)


def _xla_geglu_ln_s8(x, ln_scale, ln_bias, w1q, w2q, s1, s2, b2,
                     act_scale, eps, g_scale=None):
    """Fallback: same LN + quantized-FF + residual math in XLA."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = (xc * jax.lax.rsqrt(var + eps) * ln_scale.astype(jnp.float32)
         + ln_bias.astype(jnp.float32)).astype(x.dtype)
    y = _xla_geglu_s8(h, w1q, w2q, s1, s2, act_scale, g_scale=g_scale)
    return (xf + y.astype(jnp.float32)
            + b2.astype(jnp.float32)).astype(x.dtype)


def fused_geglu_ln_s8(
    x: jnp.ndarray, ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
    w1q: jnp.ndarray, s1: jnp.ndarray, b1: jnp.ndarray,
    w2q: jnp.ndarray, s2: jnp.ndarray, b2: jnp.ndarray,
    act_scale: float, eps: float = 1e-6, block_t: int = 512,
    g_scale=None,
) -> jnp.ndarray:
    """``x + proj_out(geglu(proj_in(LN(x))))`` in one fused s8 kernel.

    Same weight format as :func:`fused_geglu_s8` plus the block's
    pre-FF LayerNorm params and the proj_out bias ``b2 [C]`` (both
    previously applied by separate XLA passes over the full [B, T, C]
    activation). ``g_scale``: calibrated static scale for the gated
    interior (skips the per-block amax pass; None keeps dynamic)."""
    b, t, c = x.shape
    if (t % 8 != 0 or t % min(block_t, t) != 0
            or jax.default_backend() == "cpu"):
        return _xla_geglu_ln_s8(x, ln_scale, ln_bias, w1q, w2q,
                                jnp.stack([s1, b1.astype(jnp.float32)]),
                                s2[None], b2, act_scale, eps,
                                g_scale=g_scale)
    s1t = jnp.zeros((8, s1.shape[0]), jnp.float32).at[0].set(
        s1).at[1].set(b1.astype(jnp.float32))
    s2t = jnp.zeros((8, s2.shape[0]), jnp.float32).at[0].set(s2)
    g = jnp.zeros((8, c), jnp.float32)
    g = g.at[0].set(ln_scale.astype(jnp.float32))
    g = g.at[1].set(ln_bias.astype(jnp.float32))
    g = g.at[2].set(b2.astype(jnp.float32))
    sc = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(
        jnp.float32(act_scale))
    if g_scale is not None:
        sc = sc.at[0, 1].set(jnp.float32(g_scale))
    return _geglu_ln_impl(x, w1q, w2q, s1t, s2t, g, sc,
                          min(block_t, t), eps,
                          static_g=g_scale is not None).astype(x.dtype)


def _xla_geglu_s8(x, w1q, w2q, s1, s2, act_scale, g_scale=None):
    """Fallback with the same quantization math (QuantDense semantics)."""
    xs = jnp.float32(act_scale)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                  -127, 127).astype(jnp.int8)
    u = jax.lax.dot_general(
        x8, w1q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) \
        * (xs * s1[0]) + s1[1]
    h, gate = jnp.split(u, 2, axis=-1)
    g = h * _gelu_exact(gate)
    if g_scale is not None:
        gs = jnp.float32(g_scale)
        g8 = jnp.clip(jnp.round(g / gs), -127, 127).astype(jnp.int8)
    else:
        gs = jnp.maximum(jnp.max(jnp.abs(g)), 1e-6) / 127.0
        g8 = jnp.round(g / gs).astype(jnp.int8)
    y = jax.lax.dot_general(
        g8, w2q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * (gs * s2[0])
    return y.astype(x.dtype)


def fused_geglu_s8(
    x: jnp.ndarray,
    w1q: jnp.ndarray, s1: jnp.ndarray, b1: jnp.ndarray,
    w2q: jnp.ndarray, s2: jnp.ndarray,
    act_scale: float,
    block_t: int = 512,
    g_scale=None,
) -> jnp.ndarray:
    """Fused s8 GEGLU feed-forward. ``x [B, T, C]``; ``w1q [C, 2M]`` /
    ``w2q [M, C]`` int8 with per-out-channel scales ``s1 [2M]`` /
    ``s2 [C]`` (the prequantize_conv_tree QuantDense format); ``b1``:
    proj_in bias (applied before the gate, in-kernel); ``act_scale``:
    static x scale; ``g_scale``: calibrated static interior scale (skips
    the per-block amax pass). The proj_out bias adds at the call site
    (XLA fuses it into the residual add)."""
    b, t, c = x.shape
    if (t % 8 != 0 or t % min(block_t, t) != 0
            or jax.default_backend() == "cpu"):
        return _xla_geglu_s8(x, w1q, w2q,
                             jnp.stack([s1, b1.astype(jnp.float32)]),
                             s2[None], act_scale, g_scale=g_scale)
    # scales+bias ride as [8, width] tiles (rows 0/1) — 1-D VMEM
    # operands hit the second-minor tiling rule
    s1t = jnp.zeros((8, s1.shape[0]), jnp.float32).at[0].set(
        s1).at[1].set(b1.astype(jnp.float32))
    s2t = jnp.zeros((8, s2.shape[0]), jnp.float32).at[0].set(s2)
    sc = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(
        jnp.float32(act_scale))
    if g_scale is not None:
        sc = sc.at[0, 1].set(jnp.float32(g_scale))
    return _geglu_impl(x, w1q, w2q, s1t, s2t, sc,
                       min(block_t, t),
                       static_g=g_scale is not None).astype(x.dtype)
