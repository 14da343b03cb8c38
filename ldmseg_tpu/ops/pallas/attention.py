"""Pallas TPU kernel: self-attention with VMEM-resident softmax.

The UNet's hot attention shape is [B=8, H=8, T=2048, D=40] (32x64 latent,
320ch / 8 heads). XLA materializes the [B, H, T, T] fp32 score tensor in
HBM (~1 GB -> ~3.7 ms, bandwidth-bound). Flash attention's streaming
machinery is unnecessary here: a full score ROW BLOCK [BQ, T] fits in
VMEM, so the kernel computes QK^T -> softmax -> PV per (batch*head,
q-block) grid step with K/V held resident — zero HBM score traffic.

Cost model: both matmuls pad D=40 to the 128 lane width; total padded
FLOPs ~2x137 GFLOP for the 2048-token layer vs ~2.7 GB of HBM traffic
saved. Forward-only (inference sampler); training falls back to XLA via
``custom_vjp``'s recompute path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 int8: bool = False):
    q = q_ref[0]                       # [BQ, D]
    k = k_ref[0]                       # [T, D]
    v = v_ref[0]
    if int8:
        _attn_body_int8(q, k, v, o_ref, scale)
    else:
        _attn_body(q, k, v, o_ref, scale)


def _attn_body(q, k, v, o_ref, scale):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale     # [BQ, T]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v,
                preferred_element_type=jnp.float32)      # [BQ, D]
    o_ref[...] = o.reshape(o_ref.shape).astype(o_ref.dtype)


def _attn_body_int8(q, k, v, o_ref, scale):
    """Same math with both matmuls on the s8 MXU path (2x the bf16 rate
    on v5e). Quantization happens on VMEM-resident blocks — unlike the
    XLA-graph int8 path there is no extra HBM sweep for the amax. Scales
    are per-block scalars; the softmax keeps f32."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qs = jnp.maximum(jnp.max(jnp.abs(qf)), 1e-6) / 127.0
    ks = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-6) / 127.0
    q8 = jnp.round(qf / qs).astype(jnp.int8)
    k8 = jnp.round(kf / ks).astype(jnp.int8)
    s32 = jax.lax.dot_general(
        q8, k8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                # [BQ, T]
    s = s32.astype(jnp.float32) * (qs * ks * scale)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    # p in [0, pmax]: dynamic per-block scale keeps diffuse rows accurate
    ps = jnp.maximum(jnp.max(p), 1e-6) / 127.0
    p8 = jnp.round(p / ps).astype(jnp.int8)
    vf = v.astype(jnp.float32)
    vs = jnp.maximum(jnp.max(jnp.abs(vf)), 1e-6) / 127.0
    v8 = jnp.round(vf / vs).astype(jnp.int8)
    o32 = jnp.dot(p8, v8, preferred_element_type=jnp.int32)
    o = o32.astype(jnp.float32) * (ps * vs)
    o_ref[...] = o.reshape(o_ref.shape).astype(o_ref.dtype)


def _attn_kernel_bthd(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Blocks taken directly from the [B, T, H, D] layout (no host-side
    transpose): q [1, BQ, 1, D], k/v [1, T, 1, D]."""
    q = q_ref[0, :, 0, :]
    k = k_ref[0, :, 0, :]
    v = v_ref[0, :, 0, :]
    _attn_body(q, k, v, o_ref, scale)


def _fused_impl(q, k, v, scale, block_q, int8=False):
    bh, t, d = q.shape
    block_q = min(block_q, t)
    grid = (bh, t // block_q)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, int8=int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


def _xla_reference(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_self_attention_flat(q, k, v, scale, block_q, int8=False):
    return _fused_impl(q, k, v, scale, block_q, int8)


def _fwd(q, k, v, scale, block_q, int8=False):
    return _fused_impl(q, k, v, scale, block_q, int8), (q, k, v)


def _bwd(scale, block_q, int8, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, scale),
                     q, k, v)
    return vjp(g)


_fused_self_attention_flat.defvjp(_fwd, _bwd)


def _fused_impl_bthd(q, k, v, scale, block_q):
    """Kernel over the native [B, T, H, D] layout — no transposes, so the
    surrounding graph needs no layout copies."""
    b, t, h, d = q.shape
    block_q = min(block_q, t)
    grid = (b, h, t // block_q)
    qspec = pl.BlockSpec((1, block_q, 1, d), lambda i, j, l: (i, l, j, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, t, 1, d), lambda i, j, l: (i, 0, j, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_bthd, scale=scale),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_self_attention_bthd(q, k, v, scale, block_q):
    return _fused_impl_bthd(q, k, v, scale, block_q)


def _xla_bthd(q, k, v, scale):
    b, t, h, dh = q.shape
    flat = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, dh)  # noqa
    out = _xla_reference(flat(q), flat(k), flat(v), scale)
    return out.reshape(b, h, t, dh).transpose(0, 2, 1, 3)


def _fwd_bthd(q, k, v, scale, block_q):
    return _fused_impl_bthd(q, k, v, scale, block_q), (q, k, v)


def _bwd_bthd(scale, block_q, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_bthd(a, b, c, scale), q, k, v)
    return vjp(g)


_fused_self_attention_bthd.defvjp(_fwd_bthd, _bwd_bthd)


def _attn_kernel_btc(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                     scale: float):
    """Packed-layout kernel: q/k/v blocks are ``[1, T, C]`` in the
    network's NATIVE token layout (C = heads * d in lanes). Heads are
    extracted with one-hot selection matmuls on the MXU — a VMEM-local
    permutation that replaces the host-side [B,T,H,D] -> [BH,T,D]
    transposes AND the layout constraints the flat kernel forces on the
    surrounding graph (profiled as the dominant convert/copy fusions in
    the UNet step: 8.3 ms/fwd of relayouting norm fusions)."""
    q = q_ref[0]                       # [T, C] bf16
    k = k_ref[0]
    v = v_ref[0]
    t, c = q.shape
    d = c // heads
    dp = ((d + 127) // 128) * 128      # padded head width (lane tiles)

    row = jax.lax.broadcasted_iota(jnp.int32, (c, dp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, dp), 1)

    acc = jnp.zeros((t, c), jnp.float32)
    for h in range(heads):
        sel = ((row == h * d + col) & (col < d)).astype(q.dtype)  # [C, Dp]
        qh = jax.lax.dot_general(
            q, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(q.dtype)
        kh = jax.lax.dot_general(
            k, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(q.dtype)
        vh = jax.lax.dot_general(
            v, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(q.dtype)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale          # [T, T]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        oh = jnp.dot(p.astype(q.dtype), vh,
                     preferred_element_type=jnp.float32)          # [T, Dp]
        acc = acc + jax.lax.dot_general(
            oh.astype(q.dtype), sel, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                   # [T, C]
    o_ref[0] = acc.astype(o_ref.dtype)


def _packed_impl(q, k, v, heads, scale):
    b, t, c = q.shape
    spec = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_btc, heads=heads, scale=scale),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(q, k, v)


def _xla_btc(q, k, v, heads, scale):
    b, t, c = q.shape
    d = c // heads
    split = lambda x: x.reshape(b, t, heads, d)  # noqa: E731
    out = _xla_bthd(split(q), split(k), split(v), scale)
    return out.reshape(b, t, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_self_attention_packed(q, k, v, heads, scale):
    return _packed_impl(q, k, v, heads, scale)


def _fwd_packed(q, k, v, heads, scale):
    return _packed_impl(q, k, v, heads, scale), (q, k, v)


def _bwd_packed(heads, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_btc(a, b, c, heads, scale),
                     q, k, v)
    return vjp(g)


_fused_self_attention_packed.defvjp(_fwd_packed, _bwd_packed)


def fused_self_attention_packed(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    heads: int, scale: float, max_seq: int = 2048,
) -> jnp.ndarray:
    """Multi-head self-attention on the packed ``[B, T, C]`` layout
    (C = heads * head_dim). Unlike :func:`fused_self_attention` this
    keeps the network's native activation layout on both sides of the
    kernel, so XLA inserts no transposes/relayouts around it. Falls back
    to XLA when T exceeds the VMEM score budget or shapes misalign."""
    b, t, c = q.shape
    if (t > max_seq or t % 8 != 0 or c % heads != 0
            or jax.default_backend() == "cpu"):  # no compiled pallas on CPU
        return _xla_btc(q, k, v, heads, scale)
    return _fused_self_attention_packed(q, k, v, heads, scale)


def fused_self_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: float, block_q: int = 1024,
    max_seq: int = 4096,
    int8: bool = False,
) -> jnp.ndarray:
    """Multi-head self-attention, inputs ``[B, T, H, Dh]`` (the UNet's
    layout before the einsum). Falls back to XLA when the sequence is too
    long for the VMEM-resident row block or not block-divisible.

    Note: a direct [B, T, H, D]-layout kernel (``_fused_impl_bthd``) is
    blocked by the Mosaic constraint that the second-minor block dim be
    divisible by 8 — H cannot be sliced to 1 — so the dispatch flattens
    heads into the batch grid instead (one transpose each way).
    """
    b, t, h, dh = q.shape
    if t > max_seq or t % min(block_q, t) != 0:
        return _xla_bthd(q, k, v, scale)
    flat = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, dh)  # noqa
    out = _fused_self_attention_flat(flat(q), flat(k), flat(v), scale,
                                     min(block_q, t), int8)
    return out.reshape(b, h, t, dh).transpose(0, 2, 1, 3)
