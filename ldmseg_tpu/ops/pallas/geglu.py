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


def _ff_interior(x8, xs, w1_ref, w2_ref, s1_ref, sc_ref, *,
                 static_g: bool, nc: int):
    """quant-FF core: s8 W1 matmul -> dequant -> h*gelu(gate) -> quant ->
    s8 W2 matmul, in ``nc`` chunks over the interior dim M.

    Monolithically (nc=1) the MXU sits idle through the whole [BQ, M]
    VPU gating pass between the two matmuls. Chunking unrolls the chain
    into nc independent (W1-matmul, gate, W2-matmul) strands so Mosaic's
    scheduler can overlap chunk k's VPU gating with chunk k±1's MXU
    matmuls. Standalone micro at T=2048/C=320/M=1280 on v5e: 1.042 ->
    0.510 ms with PREBUILT scale tiles (nc=4); with in-graph tile
    builds the gain shrinks to ~4% and measured e2e NEGATIVE (10.31 ->
    10.06 f/s, BENCH_NOTES r4), so the default stays nc=1 — revisit on
    top of pack_inference_tiles. h and gate columns are sliced per
    chunk from the UNCHANGED [C, 2M] weight layout; the W2 contraction
    accumulates per-chunk partials in f32 (exact: scales are per-chunk).
    Dynamic-scale mode quantizes per chunk — finer amax granularity
    than the monolithic kernel, same semantics otherwise.

    Returns yf [BQ, C] f32, scaled by the interior scale(s) but NOT yet
    by W2's per-channel scale (callers apply ``* s2_ref[0]``)."""
    m2 = w1_ref.shape[1]
    m = m2 // 2
    if nc <= 1 or m % nc != 0:
        u32 = jax.lax.dot_general(
            x8, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)     # [BQ, 2M]
        u = u32.astype(jnp.float32) * (xs * s1_ref[0]) + s1_ref[1]
        g = u[:, :m] * _gelu_tanh(u[:, m:])       # [BQ, M]
        g8, gs = _quantize_inner(g, sc_ref, static_g)
        y32 = jax.lax.dot_general(
            g8, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)     # [BQ, C]
        return y32.astype(jnp.float32) * gs
    mc = m // nc
    yf = jnp.zeros((x8.shape[0], w2_ref.shape[1]), jnp.float32)
    for k in range(nc):
        uh = jax.lax.dot_general(
            x8, w1_ref[:, k * mc:(k + 1) * mc],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        ug = jax.lax.dot_general(
            x8, w1_ref[:, m + k * mc:m + (k + 1) * mc],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        h = (uh.astype(jnp.float32) * (xs * s1_ref[0, k * mc:(k + 1) * mc])
             + s1_ref[1, k * mc:(k + 1) * mc])
        gate = (ug.astype(jnp.float32)
                * (xs * s1_ref[0, m + k * mc:m + (k + 1) * mc])
                + s1_ref[1, m + k * mc:m + (k + 1) * mc])
        g = h * _gelu_tanh(gate)                  # [BQ, Mc]
        g8, gs = _quantize_inner(g, sc_ref, static_g)
        y32 = jax.lax.dot_general(
            g8, w2_ref[k * mc:(k + 1) * mc, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        yf = yf + y32.astype(jnp.float32) * gs
    return yf


def _geglu_kernel(x_ref, w1_ref, w2_ref, s1_ref, s2_ref, sc_ref, o_ref,
                  *, static_g: bool = False, nc: int = 1):
    x = x_ref[0]                                  # [BQ, C] bf16
    xs = sc_ref[0, 0]
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                  -127, 127).astype(jnp.int8)
    yf = _ff_interior(x8, xs, w1_ref, w2_ref, s1_ref, sc_ref,
                      static_g=static_g, nc=nc)
    o_ref[0] = (yf * s2_ref[0]).astype(o_ref.dtype)


def _geglu_impl(x, w1q, w2q, s1, s2, sc, block_t, static_g=False, nc=1):
    b, t, c = x.shape
    m2 = w1q.shape[1]
    block_t = min(block_t, t)
    grid = (b, t // block_t)
    return pl.pallas_call(
        functools.partial(_geglu_kernel, static_g=static_g, nc=nc),
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
                     static_g: bool = False, nc: int = 1):
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
    yf = _ff_interior(x8, xs, w1_ref, w2_ref, s1_ref, sc_ref,
                      static_g=static_g, nc=nc)
    o_ref[0] = (xf + yf * s2_ref[0] + g_ref[2]).astype(o_ref.dtype)


def _geglu_ln_pout_kernel(x_ref, w1_ref, w2_ref, wpo_ref, s1_ref, s2_ref,
                          g_ref, sc_ref, o_ref, *, eps: float,
                          static_g: bool = False, nc: int = 1):
    """LN3 + GEGLU + residual + Transformer2D ``proj_out`` in one pass.

    Extends :func:`_geglu_ln_kernel` with the block's trailing 1x1
    proj_out conv as a bf16 MXU epilogue (``wpo [C, C]`` bf16, bias in
    ``g`` row 3): outside the kernel that matmul runs at ~20% MFU on the
    custom-call-forced layout (BENCH_NOTES r4). The kernel then returns
    proj_out(tokens) + bias; the Transformer2D residual add stays in
    XLA (elementwise, fuses freely)."""
    xf = x_ref[0].astype(jnp.float32)             # [BQ, C]
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + g_ref[1]
    xs = sc_ref[0, 0]
    x8 = jnp.clip(jnp.round(h / xs), -127, 127).astype(jnp.int8)
    yf = _ff_interior(x8, xs, w1_ref, w2_ref, s1_ref, sc_ref,
                      static_g=static_g, nc=nc)
    r = (xf + yf * s2_ref[0] + g_ref[2]).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        r, wpo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)       # [BQ, C]
    o_ref[0] = (out + g_ref[3]).astype(o_ref.dtype)


def _geglu_ln_pout_impl(x, w1q, w2q, wpo, s1, s2, g, sc, block_t, eps,
                        static_g=False, nc=1):
    b, t, c = x.shape
    block_t = min(block_t, t)
    grid = (b, t // block_t)
    return pl.pallas_call(
        functools.partial(_geglu_ln_pout_kernel, eps=eps,
                          static_g=static_g, nc=nc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1q.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2q.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wpo.shape, lambda i, j: (0, 0),
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
    )(x, w1q, w2q, wpo, s1, s2, g, sc)


def _geglu_ln_impl(x, w1q, w2q, s1, s2, g, sc, block_t, eps,
                   static_g=False, nc=1):
    b, t, c = x.shape
    block_t = min(block_t, t)
    grid = (b, t // block_t)
    return pl.pallas_call(
        functools.partial(_geglu_ln_kernel, eps=eps, static_g=static_g,
                          nc=nc),
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


def pack_geglu_ln_tiles(s1, b1, s2, b2, ln_scale, ln_bias, act_scale,
                        g_scale=None, proj_out_bias=None):
    """Build the loop-invariant VMEM tiles of the fused LN+GEGLU kernel.

    These tiles depend only on params + calibrated scales, yet when
    built inside the jitted UNet apply they re-materialize EVERY step of
    the 50-step sampling scan (XLA does not hoist loop-invariant code
    out of ``lax.scan``) — ~10 tiny serialized ops per FF site per step.
    ``ops.quant.pack_inference_tiles`` calls this once, outside the
    scan, and stores the result in the param tree;
    :func:`fused_geglu_ln_s8` consumes it via ``pack=``. Rows: s1t
    0=W1 col scales, 1=proj_in bias; s2t 0=W2 col scales; g 0=LN scale,
    1=LN bias, 2=proj_out bias; sc [0,0]=x scale, [0,1]=interior scale
    (0 when dynamic)."""
    s1t = jnp.zeros((8, s1.shape[0]), jnp.float32).at[0].set(
        s1).at[1].set(b1.astype(jnp.float32))
    s2t = jnp.zeros((8, s2.shape[0]), jnp.float32).at[0].set(s2)
    g = jnp.zeros((8, ln_scale.shape[0]), jnp.float32)
    g = g.at[0].set(ln_scale.astype(jnp.float32))
    g = g.at[1].set(ln_bias.astype(jnp.float32))
    g = g.at[2].set(b2.astype(jnp.float32))
    if proj_out_bias is not None:
        # row 3: Transformer2D proj_out bias (the _pout kernel absorbs
        # the trailing 1x1 proj conv as a bf16 epilogue matmul)
        g = g.at[3].set(proj_out_bias.astype(jnp.float32))
    sc = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(
        jnp.float32(act_scale))
    if g_scale is not None:
        sc = sc.at[0, 1].set(jnp.float32(g_scale))
    return {"s1t": s1t, "s2t": s2t, "g": g, "sc": sc}


def fused_geglu_ln_s8(
    x: jnp.ndarray, ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
    w1q: jnp.ndarray, s1: jnp.ndarray, b1: jnp.ndarray,
    w2q: jnp.ndarray, s2: jnp.ndarray, b2: jnp.ndarray,
    act_scale: float, eps: float = 1e-6, block_t: int = 512,
    g_scale=None, pack=None, proj_out=None,
) -> jnp.ndarray:
    """``x + proj_out(geglu(proj_in(LN(x))))`` in one fused s8 kernel.

    Same weight format as :func:`fused_geglu_s8` plus the block's
    pre-FF LayerNorm params and the proj_out bias ``b2 [C]`` (both
    previously applied by separate XLA passes over the full [B, T, C]
    activation). ``g_scale``: calibrated static scale for the gated
    interior (skips the per-block amax pass; None keeps dynamic).
    ``pack``: prepacked tiles from :func:`pack_geglu_ln_tiles` (stored
    in the tree by ``pack_inference_tiles``); when given, the raw
    scale/bias/LN args only feed the fallback branch and dead-code
    eliminate on the kernel path. ``proj_out``: optional
    ``(w [C, C] bf16, b [C])`` — the TRANSFORMER2D trailing proj_out
    1x1 conv absorbed as a bf16 epilogue matmul (the return value is
    then the proj output, NOT the residual stream; the caller adds the
    outer Transformer2D residual). With ``pack``, its ``g`` row 3 must
    already hold that bias (``pack_inference_tiles(fuse_projs=True)``)."""
    b, t, c = x.shape
    if (t % 8 != 0 or t % min(block_t, t) != 0
            or jax.default_backend() == "cpu"):
        r = _xla_geglu_ln_s8(x, ln_scale, ln_bias, w1q, w2q,
                             jnp.stack([s1, b1.astype(jnp.float32)]),
                             s2[None], b2, act_scale, eps,
                             g_scale=g_scale)
        if proj_out is not None:
            r = (jnp.einsum("btc,co->bto", r.astype(jnp.float32),
                            proj_out[0].astype(jnp.float32))
                 + proj_out[1].astype(jnp.float32)).astype(x.dtype)
        return r
    if pack is None:
        pack = pack_geglu_ln_tiles(
            s1, b1, s2, b2, ln_scale, ln_bias, act_scale, g_scale,
            proj_out_bias=None if proj_out is None else proj_out[1])
    if proj_out is not None:
        return _geglu_ln_pout_impl(
            x, w1q, w2q, proj_out[0].astype(jnp.bfloat16),
            pack["s1t"], pack["s2t"], pack["g"], pack["sc"],
            min(block_t, t), eps,
            static_g=g_scale is not None).astype(x.dtype)
    return _geglu_ln_impl(x, w1q, w2q, pack["s1t"], pack["s2t"],
                          pack["g"], pack["sc"], min(block_t, t), eps,
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
