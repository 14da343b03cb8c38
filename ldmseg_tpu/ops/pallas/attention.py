"""Pallas TPU kernel: self-attention with VMEM-resident softmax.

The UNet's hot attention shape is [B=8, H=8, T=2048, D=40] (32x64 latent,
320ch / 8 heads). XLA materializes the [B, H, T, T] fp32 score tensor in
HBM (~1 GB -> ~3.7 ms, bandwidth-bound). Flash attention's streaming
machinery is unnecessary here: a full score ROW BLOCK [BQ, T] fits in
VMEM, so the kernel computes QK^T -> softmax -> PV per (batch*head,
q-block) grid step with K/V held resident — zero HBM score traffic.

Cost model: both matmuls pad D=40 to the 128 lane width; total padded
FLOPs ~2x137 GFLOP for the 2048-token layer vs ~2.7 GB of HBM traffic
saved. Training uses the flash-style backward kernel (``_flash_bwd``:
recompute the P row block in VMEM, accumulate dK/dV in fp32 across
q-blocks) — the XLA vjp fallback (CPU) round-trips the [BH, T, T] fp32
softmax through HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                       # [BQ, D]
    k = k_ref[0]                       # [T, D]
    v = v_ref[0]
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


def _attn_kernel_s8(q_ref, k_ref, v_ref, sc_ref, o_ref):
    """Pre-quantized s8 attention: q/k/v arrive as int8 (quantized in the
    producing Dense epilogues, where XLA fuses the round/clip/convert for
    free), so the kernel runs both matmuls on the s8 MXU path (2x bf16
    rate on v5e) with NO in-kernel quantization sweeps — the failure mode
    of the first int8 kernel (_attn_body_int8), which spent more VPU time
    quantizing VMEM blocks than the MXU saved. Scales ride in a tiny VMEM
    tile: sc[0,0] = q_scale*k_scale*softmax_scale, sc[0,1] = v_scale/127
    (p is quantized with the static scale 1/127 — softmax output is in
    [0,1] by construction)."""
    q = q_ref[0]                       # [BQ, D] int8
    k = k_ref[0]                       # [T, D] int8
    v = v_ref[0]
    s32 = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                # [BQ, T]
    s = s32.astype(jnp.float32) * sc_ref[0, 0]
    # quantize the UNNORMALIZED exp (spans (0, 127] by construction with
    # ln(127) absorbed into the exp argument — one fewer [BQ, T] VPU
    # multiply pass than e*127) and normalize after the matmul — a static
    # scale on softmax output itself collapses diffuse rows to 1-2 codes
    s = s - jnp.max(s, axis=-1, keepdims=True) + 4.844187086458591
    e = jnp.exp(s)                                       # rowmax(e) == 127
    denom = jnp.sum(e, axis=-1, keepdims=True)           # = 127 * sum(exp)
    e8 = jnp.round(e).astype(jnp.int8)
    o32 = jax.lax.dot_general(
        e8, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                # [BQ, D]
    o = o32.astype(jnp.float32) * (sc_ref[0, 1] * 127.0 / denom)
    o_ref[...] = o.reshape(o_ref.shape).astype(o_ref.dtype)


def _fused_impl_s8(q8, k8, v8, sc, block_q):
    bh, t, d = q8.shape
    block_q = min(block_q, t)
    grid = (bh, t // block_q)
    return pl.pallas_call(
        _attn_kernel_s8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q8.shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q8, k8, v8, sc)


def fused_self_attention_s8(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: float, block_q: int = 1024, max_seq: int = 4096,
    act_scale: float | None = None,
) -> jnp.ndarray:
    """s8-MXU self-attention, inputs ``[B, T, H, Dh]`` float. Per-tensor
    dynamic amax quantization of q/k/v happens OUTSIDE the pallas call so
    XLA fuses it into the producing projections; inference-only (no VJP —
    guard with ``jax.lax.stop_gradient`` upstream or train via the bf16
    path).

    ``act_scale`` replaces the three dynamic amax sweeps with one static
    scale (values beyond ``127*act_scale`` saturate) — the amax reduces
    re-read each projection output and cost ~1.8 ms/fwd in the profiled
    b16 step; accuracy stays gated by tests/test_int8_inference.py."""
    b, t, h, dh = q.shape
    if (t > max_seq or t % min(block_q, t) != 0 or t % 8 != 0
            or jax.default_backend() == "cpu"):  # no compiled pallas on CPU
        return _xla_bthd(q, k, v, scale)
    if act_scale is not None:
        qs = ks = vs = jnp.float32(act_scale)
    else:
        qs = jnp.maximum(jnp.max(jnp.abs(q)),
                         1e-6).astype(jnp.float32) / 127.0
        ks = jnp.maximum(jnp.max(jnp.abs(k)),
                         1e-6).astype(jnp.float32) / 127.0
        vs = jnp.maximum(jnp.max(jnp.abs(v)),
                         1e-6).astype(jnp.float32) / 127.0
    quant = lambda x, s: jnp.clip(  # noqa: E731
        jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    flat = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, dh)  # noqa
    sc = jnp.zeros((8, 128), jnp.float32)
    sc = sc.at[0, 0].set(qs * ks * scale).at[0, 1].set(vs / 127.0)
    out = _fused_impl_s8(flat(quant(q, qs)), flat(quant(k, ks)),
                         flat(quant(v, vs)), sc, min(block_q, t))
    return out.reshape(b, h, t, dh).transpose(0, 2, 1, 3).astype(q.dtype)


def _attn_kernel_btc_s8(q_ref, k_ref, v_ref, sc_ref, o_ref, *,
                        heads: int):
    """Packed [B,T,C] layout AND s8 MXU: q/k/v arrive int8 in the native
    token layout; heads are extracted with one-hot s8 selection matmuls
    (exact — the one-hot entries are ±1 codes), scores and PV run s8 at
    2x the bf16 MXU rate, and the unnormalized-exp trick from
    :func:`_attn_kernel_s8` keeps the probability quantization accurate.
    Combines the layout win of ``_attn_kernel_btc`` (no transposes, no
    custom-call layout constraints leaking into the surrounding graph)
    with the throughput win of the s8 path."""
    q = q_ref[0]                       # [T, C] int8
    k = k_ref[0]
    v = v_ref[0]
    t, c = q.shape
    d = c // heads
    dp = ((d + 127) // 128) * 128

    row = jax.lax.broadcasted_iota(jnp.int32, (c, dp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, dp), 1)

    acc = jnp.zeros((t, c), jnp.float32)
    for h in range(heads):
        sel = ((row == h * d + col) & (col < d)).astype(jnp.int8)
        qh = jax.lax.dot_general(
            q, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8)
        kh = jax.lax.dot_general(
            k, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8)
        vh = jax.lax.dot_general(
            v, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8)
        s32 = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)             # [T, T]
        s = s32.astype(jnp.float32) * sc_ref[0, 0]
        s = s - jnp.max(s, axis=-1, keepdims=True) + 4.844187086458591
        e = jnp.exp(s)                                    # rowmax == 127
        denom = jnp.sum(e, axis=-1, keepdims=True)
        e8 = jnp.round(e).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            e8, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # [T, Dp]
        oh = o32.astype(jnp.float32) * (sc_ref[0, 1] * 127.0 / denom)
        acc = acc + jax.lax.dot_general(
            oh.astype(jnp.bfloat16), sel.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [T, C]
    o_ref[0] = acc.astype(o_ref.dtype)


def _packed_s8_impl(q8, k8, v8, sc, heads):
    b, t, c = q8.shape
    spec = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_btc_s8, heads=heads),
        grid=(b,),
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q8.shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(q8, k8, v8, sc)


def fused_self_attention_packed_s8(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    heads: int, scale: float, max_seq: int = 2048,
) -> jnp.ndarray:
    """s8 multi-head self-attention on the packed ``[B, T, C]`` layout.
    Quantization of q/k/v happens outside the kernel (fused into the
    producing projections); inference-only."""
    b, t, c = q.shape
    if (t > max_seq or t % 8 != 0 or c % heads != 0
            or jax.default_backend() == "cpu"):
        return _xla_btc(q, k, v, heads, scale)
    d = c // heads
    qs = jnp.maximum(jnp.max(jnp.abs(q)), 1e-6).astype(jnp.float32) / 127.0
    ks = jnp.maximum(jnp.max(jnp.abs(k)), 1e-6).astype(jnp.float32) / 127.0
    vs = jnp.maximum(jnp.max(jnp.abs(v)), 1e-6).astype(jnp.float32) / 127.0
    quant = lambda x, s: jnp.clip(  # noqa: E731
        jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    sc = jnp.zeros((8, 128), jnp.float32)
    sc = sc.at[0, 0].set(qs * ks * (d ** -0.5 if scale is None else scale))
    sc = sc.at[0, 1].set(vs / 127.0)
    out = _packed_s8_impl(quant(q, qs), quant(k, ks), quant(v, vs), sc,
                          heads)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Absorbed-projection attention: to_q/k/v and to_out live INSIDE the kernel
# ---------------------------------------------------------------------------

def _attn_kernel_absorbed(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, o_ref,
                          acc_ref, *, scale: float, heads: int):
    """One (batch, head) grid step: project the native-layout token block
    ``x [T, C]`` with this head's weight slices, run attention, and
    accumulate ``oh @ Wo[h]`` into a fp32 VMEM scratch; the output block
    is written once on the last head.

    Why: the flat kernel's [B,T,H,D]->[BH,T,D] transposes force layout
    {1,2,0} on the XLA matmuls around the custom call (profiled ~20% MFU
    on to_q/k/v/to_out + feed-forward, BENCH_NOTES.md "where the time
    goes"). With the projections absorbed, the custom call consumes and
    produces the network's NATIVE [B, T, C] layout — no transposes, no
    layout constraints leak into the surrounding graph, and the
    projection matmuls ride the MXU inside the kernel."""
    h = pl.program_id(1)
    x = x_ref[0]                        # [T, C]
    qh = jnp.dot(x, wq_ref[0],
                 preferred_element_type=jnp.float32)        # [T, D]
    kh = jnp.dot(x, wk_ref[0],
                 preferred_element_type=jnp.float32)
    vh = jnp.dot(x, wv_ref[0],
                 preferred_element_type=jnp.float32).astype(x.dtype)
    s = jax.lax.dot_general(
        qh.astype(x.dtype), kh.astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale         # [T, T]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    oh = jnp.dot(p.astype(x.dtype), vh,
                 preferred_element_type=jnp.float32)        # [T, D]
    contrib = jnp.dot(oh.astype(x.dtype), wo_ref[0],
                      preferred_element_type=jnp.float32)   # [T, C]

    @pl.when(h == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(h > 0)
    def _acc():
        acc_ref[...] = acc_ref[...] + contrib

    @pl.when(h == heads - 1)
    def _out():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _absorbed_impl(x, wq, wk, wv, wo, scale):
    b, t, c = x.shape
    heads, _, d = wq.shape
    return pl.pallas_call(
        functools.partial(_attn_kernel_absorbed, scale=scale, heads=heads),
        grid=(b, heads),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, c), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((t, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, wq, wk, wv, wo)


def _xla_absorbed(x, wq, wk, wv, wo, scale):
    heads, c, d = wq.shape
    q = jnp.einsum("btc,hcd->bthd", x, wq)
    k = jnp.einsum("btc,hcd->bthd", x, wk)
    v = jnp.einsum("btc,hcd->bthd", x, wv)
    out = _xla_bthd(q, k, v, scale)
    return jnp.einsum("bthd,hdc->btc", out, wo).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _absorbed_attention(x, wq, wk, wv, wo, scale):
    return _absorbed_impl(x, wq, wk, wv, wo, scale)


def _fwd_absorbed(x, wq, wk, wv, wo, scale):
    return _absorbed_impl(x, wq, wk, wv, wo, scale), (x, wq, wk, wv, wo)


def _bwd_absorbed(scale, res, g):
    x, wq, wk, wv, wo = res
    _, vjp = jax.vjp(
        lambda a, b, c, d_, e: _xla_absorbed(a, b, c, d_, e, scale),
        x, wq, wk, wv, wo)
    return vjp(g)


_absorbed_attention.defvjp(_fwd_absorbed, _bwd_absorbed)


def absorbed_self_attention(
    x: jnp.ndarray,
    wq: jnp.ndarray, wk: jnp.ndarray, wv: jnp.ndarray, wo: jnp.ndarray,
    heads: int, scale: float, max_seq: int = 2048,
) -> jnp.ndarray:
    """Self-attention with projections absorbed: ``x [B, T, C]`` (native
    token layout), weights as per-head slices ``wq/wk/wv [H, C, D]``,
    ``wo [H, D, C]`` (reshaped from the ``nn.Dense`` [C, C] kernels).
    Returns ``x_out [B, T, C]`` = attention(x) @ Wo (to_out bias is added
    by the caller). Falls back to an einsum formulation off-TPU or on
    shapes the kernel can't tile."""
    b, t, c = x.shape
    d = c // heads
    if (t > max_seq or t % 8 != 0 or c % heads != 0 or d % 8 != 0
            or jax.default_backend() == "cpu"):
        return _xla_absorbed(x, wq, wk, wv, wo, scale)
    return _absorbed_attention(x, wq, wk, wv, wo, scale)


def _attn_kernel_absorbed_s8(x_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                             sc_ref, o_ref, acc_ref, *, scale: float,
                             heads: int):
    """s8 absorbed-projection attention. The token block ``x`` arrives
    int8 (ONE static-scale quantize per layer instead of three per-tensor
    quantizes of q/k/v — the b16 trace shows those standalone
    clamp+convert sweeps cost 7.3 ms/fwd); weights arrive pre-quantized
    per-head per-tensor. All five matmuls ride the s8 MXU; the
    intermediate [T, D] head tensors are re-quantized in VMEM (cheap VPU
    work — 50x smaller than the [T, T] score tensors that made in-kernel
    quantization lose in round 2)."""
    h = pl.program_id(1)
    x = x_ref[0]                        # [T, C] int8
    xs = sc_ref[0, 0, 4]

    def proj(w_ref, widx):
        y32 = jax.lax.dot_general(
            x, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, D]
        y = y32.astype(jnp.float32) * (xs * sc_ref[0, 0, widx])
        amax = jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)
        ys = amax / 127.0
        y8 = jnp.round(y / ys).astype(jnp.int8)
        return y8, ys

    q8, qs = proj(wq_ref, 0)
    k8, ks = proj(wk_ref, 1)
    v8, vs = proj(wv_ref, 2)
    s32 = jax.lax.dot_general(
        q8, k8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                   # [T, T]
    s = s32.astype(jnp.float32) * (qs * ks * scale)
    s = s - jnp.max(s, axis=-1, keepdims=True) + 4.844187086458591
    e = jnp.exp(s)                                          # rowmax == 127
    denom = jnp.sum(e, axis=-1, keepdims=True)
    e8 = jnp.round(e).astype(jnp.int8)
    o32 = jax.lax.dot_general(
        e8, v8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                   # [T, D]
    oh = o32.astype(jnp.float32) * vs / denom
    oamax = jnp.maximum(jnp.max(jnp.abs(oh)), 1e-6)
    os_ = oamax / 127.0
    oh8 = jnp.round(oh / os_).astype(jnp.int8)
    c32 = jax.lax.dot_general(
        oh8, wo_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                   # [T, C]
    contrib = c32.astype(jnp.float32) * (os_ * sc_ref[0, 0, 3])

    @pl.when(h == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(h > 0)
    def _acc():
        acc_ref[...] = acc_ref[...] + contrib

    @pl.when(h == heads - 1)
    def _out():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _absorbed_s8_impl(x8, wq8, wk8, wv8, wo8, sc, scale):
    b, t, c = x8.shape
    heads, _, d = wq8.shape
    return pl.pallas_call(
        functools.partial(_attn_kernel_absorbed_s8, scale=scale,
                          heads=heads),
        grid=(b, heads),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, c), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x8.shape, jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((t, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x8, wq8, wk8, wv8, wo8, sc)


def quantize_head_weights(wq, wk, wv, wo, heads):
    """Host/prequant-time: split the [C, C] Dense kernels into per-head
    s8 slices + a per-head scale tile for the absorbed s8 kernel.

    Returns (wq8/wk8/wv8 [H, C, D] int8, wo8 [H, D, C] int8,
    scales [H, 8, 128] f32 with lanes (wq, wk, wv, wo) at [h, 0, 0..3];
    the caller writes the x act scale at [h, 0, 4])."""
    c = wq.shape[0]
    d = c // heads
    hsplit = lambda w: w.reshape(c, heads, d).transpose(1, 0, 2)  # noqa
    out8 = []
    scales = jnp.zeros((heads, 8, 128), jnp.float32)
    for i, w in enumerate((hsplit(wq), hsplit(wk), hsplit(wv),
                           wo.reshape(heads, d, c))):
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(1, 2))
        s = jnp.maximum(amax, 1e-8) / 127.0
        out8.append(jnp.round(w.astype(jnp.float32)
                              / s[:, None, None]).astype(jnp.int8))
        scales = scales.at[:, 0, i].set(s)
    return (*out8, scales)


def absorbed_self_attention_s8(
    x: jnp.ndarray, wq8, wk8, wv8, wo8, scales,
    heads: int, scale: float, act_scale: float,
    max_seq: int = 2048,
) -> jnp.ndarray:
    """s8 absorbed-projection self-attention. ``x [B, T, C]`` float in
    the native token layout; weights from :func:`quantize_head_weights`
    (``wq8/wk8/wv8 [H, C, D]``, ``wo8 [H, D, C]``, per-head scales tile).
    ``act_scale``: static per-tensor scale for x (one quantize per
    layer). Off-TPU / misaligned shapes fall back to the dequantized
    einsum formulation (same weights, float math)."""
    b, t, c = x.shape
    d = c // heads
    if (t > max_seq or t % 8 != 0 or c % heads != 0 or d % 8 != 0
            or jax.default_backend() == "cpu"):
        deq = lambda w8, i, tr=False: (  # noqa: E731
            w8.astype(jnp.float32)
            * scales[:, 0, i][:, None, None])
        return _xla_absorbed(x, deq(wq8, 0), deq(wk8, 1), deq(wv8, 2),
                             deq(wo8, 3), scale).astype(x.dtype)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                  -127, 127).astype(jnp.int8)
    sc = scales.at[:, 0, 4].set(jnp.float32(act_scale))
    return _absorbed_s8_impl(x8, wq8, wk8, wv8, wo8, sc,
                             scale).astype(x.dtype)


def _attn_kernel_absorbed_fullc_s8(x_ref, wq_ref, wk_ref, wv_ref, wop_ref,
                                   sc_ref, o_ref, *, scale: float,
                                   heads: int):
    """Absorbed-projection s8 attention, full-C projections.

    The round-2 absorbed kernel projected PER HEAD ([C]->[D=40] slices),
    paying the 128-lane pad on every projection matmul (attn custom
    calls 9.0 -> 14.3 ms/fwd, BENCH_NOTES.md). Here to_q/k/v run at the
    FULL width ([T,C]@[C,C], C=320/640/1280 — no pad waste), heads are
    then extracted with one-hot s8 selection matmuls (exact: +-1 codes),
    and to_out is applied per head via a pre-padded ``wop [H, 128, C]``
    (rows >= D zero) so the [T, Dpad] head outputs contract directly.
    Like the other absorbed kernels the custom call consumes/produces
    the native [B, T, C] layout: no transposes or layout constraints
    leak into the surrounding XLA graph."""
    x = x_ref[0]                        # [T, C] int8
    xs = sc_ref[0, 0]
    t, c = x.shape
    d = c // heads
    dp = ((d + 127) // 128) * 128

    def proj(w_ref, widx):
        y32 = jax.lax.dot_general(
            x, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, C]
        y = y32.astype(jnp.float32) * (xs * sc_ref[0, 1 + widx])
        amax = jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)
        ys = amax / 127.0
        y8 = jnp.round(y / ys).astype(jnp.int8)
        return y8, ys

    q8, qs = proj(wq_ref, 0)
    k8, ks = proj(wk_ref, 1)
    v8, vs = proj(wv_ref, 2)

    row = jax.lax.broadcasted_iota(jnp.int32, (c, dp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, dp), 1)

    acc = jnp.zeros((t, c), jnp.float32)
    for h in range(heads):
        sel = ((row == h * d + col) & (col < d)).astype(jnp.int8)
        pick = lambda y8: jax.lax.dot_general(  # noqa: E731
            y8, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.int8)
        qh = pick(q8)                   # [T, Dp] (cols >= d zero)
        kh = pick(k8)
        vh = pick(v8)
        s32 = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, T]
        s = s32.astype(jnp.float32) * (qs * ks * scale)
        s = s - jnp.max(s, axis=-1, keepdims=True) + 4.844187086458591
        e = jnp.exp(s)                                      # rowmax == 127
        denom = jnp.sum(e, axis=-1, keepdims=True)
        e8 = jnp.round(e).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            e8, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, Dp]
        oh = o32.astype(jnp.float32) * vs / denom
        oamax = jnp.maximum(jnp.max(jnp.abs(oh)), 1e-6)
        os_ = oamax / 127.0
        oh8 = jnp.round(oh / os_).astype(jnp.int8)
        c32 = jax.lax.dot_general(
            oh8, wop_ref[0][h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, C]
        acc = acc + c32.astype(jnp.float32) * (os_ * sc_ref[0, 4])
    o_ref[0] = acc.astype(o_ref.dtype)


def _absorbed_fullc_s8_impl(x8, wq8, wk8, wv8, wop8, sc, scale, heads):
    b, t, c = x8.shape
    wspec = pl.BlockSpec((1,) + wq8.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel_absorbed_fullc_s8, scale=scale,
                          heads=heads),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec,
            pl.BlockSpec((1,) + wop8.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x8.shape, jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x8, wq8[None], wk8[None], wv8[None], wop8[None], sc)


def quantize_fullc_weights(wq, wk, wv, wo, heads):
    """Host/prequant-time weights for the full-C absorbed s8 kernel:
    wq/wk/wv stay [C, C] s8 (one per-tensor scale each); wo becomes
    ``wop [H, 128, C]`` s8 — head h's [D, C] slice in rows 0..D, zeros
    above — so the kernel's padded [T, Dp] head outputs contract with it
    directly. Returns (wq8, wk8, wv8, wop8, scales[8,128])."""
    c = wq.shape[0]
    d = c // heads
    dp = ((d + 127) // 128) * 128
    sc = jnp.zeros((8, 128), jnp.float32)
    out8 = []
    for i, w in enumerate((wq, wk, wv)):
        w = w.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(w)), 1e-8) / 127.0
        out8.append(jnp.round(w / s).astype(jnp.int8))
        sc = sc.at[0, 1 + i].set(s)
    wo = wo.astype(jnp.float32)
    so = jnp.maximum(jnp.max(jnp.abs(wo)), 1e-8) / 127.0
    wop = jnp.zeros((heads, dp, c), jnp.float32)
    wop = wop.at[:, :d, :].set(wo.reshape(heads, d, c))
    out8.append(jnp.round(wop / so).astype(jnp.int8))
    sc = sc.at[0, 4].set(so)
    return (*out8, sc)


def absorbed_fullc_self_attention_s8(
    x: jnp.ndarray, wq8, wk8, wv8, wop8, scales,
    heads: int, scale: float, act_scale: float,
    max_seq: int = 2048,
) -> jnp.ndarray:
    """Full-C absorbed s8 self-attention (see kernel docstring).
    ``x [B, T, C]`` float; weights from :func:`quantize_fullc_weights`.
    Off-TPU / misaligned shapes fall back to dequantized float math."""
    b, t, c = x.shape
    d = c // heads
    if (t > max_seq or t % 8 != 0 or c % heads != 0 or d % 8 != 0
            or jax.default_backend() == "cpu"):
        deq = lambda w8, i: w8.astype(jnp.float32) * scales[0, i]  # noqa
        wo = deq(wop8, 4)[:, :d, :].reshape(c, c)
        q = x.astype(jnp.float32) @ deq(wq8, 1)
        k = x.astype(jnp.float32) @ deq(wk8, 2)
        v = x.astype(jnp.float32) @ deq(wv8, 3)
        r = lambda y: y.reshape(b, t, heads, d)  # noqa: E731
        out = _xla_bthd(r(q), r(k), r(v), scale)
        return (out.reshape(b, t, c) @ wo).astype(x.dtype)
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                  -127, 127).astype(jnp.int8)
    sc = scales.at[0, 0].set(jnp.float32(act_scale))
    return _absorbed_fullc_s8_impl(x8, wq8, wk8, wv8, wop8, sc, scale,
                                   heads).astype(x.dtype)


def _attn_kernel_abs_padded_s8(x_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                               m_ref, sc_ref, o_ref, of_ref, *,
                               heads: int):
    """Head-PADDED absorbed s8 attention — the variant that fixes both
    earlier absorbed kernels' failure modes (BENCH_NOTES.md round 3):

      * per-head projections ([C]->[D] slices) padded D=40/80/160 to the
        128-lane width on EVERY projection matmul (absorbed-s8: attn
        custom calls 9.0 -> 14.3 ms/fwd);
      * full-C projections needed 24 one-hot selection matmuls per layer
        to extract heads at non-128-aligned offsets (fullc: 3.54 vs
        3.29 ms/layer).

    Here the weights arrive PADDED to 128-aligned head offsets:
    ``wq/wk/wv [C, H*dp]`` with head h's D columns at ``h*dp`` and dead
    lanes exact zeros, ``wo [H*dp, C]`` likewise on rows. One full-width
    s8 matmul projects ALL heads; head slices are free aligned lane
    slices; dead lanes stay exact zeros through QK^T / PV / to_out. The
    extra padded columns are nearly free on the MXU (the per-head QK^T
    contraction pads D to 128 in every variant anyway).

    PV requantization uses the exact int8 convex combination
    ``of8 = round(o32 / denom)`` (|o32/denom| <= 127 since v8 codes are
    int8 and sum(e8) ~ denom) — no amax sweep. Per-head to_out scales
    fold in as ``of8 = round(o32 * (wos[h]/wos_max) / denom)`` so the
    single ``of8 @ wo8`` matmul stays exact per head.

    Scales: ``m [8, HP]`` rows 0..2 = per-column xs*ws/as for q/k/v
    (garbage on dead lanes is harmless — the int32 there is exact 0);
    ``sc [8, 128]``: [0,0] = as^2 * softmax_scale, [0,1] = as * wos_max,
    [1, h] = wos[h] / wos_max."""
    x = x_ref[0]                        # [T, C] int8
    hp = wq_ref.shape[-1]
    dp = hp // heads

    def proj(w_ref, row):
        y32 = jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, HP]
        return jnp.clip(jnp.round(y32.astype(jnp.float32) * m_ref[row]),
                        -127, 127).astype(jnp.int8)

    q8 = proj(wq_ref, 0)
    k8 = proj(wk_ref, 1)
    v8 = proj(wv_ref, 2)
    for h in range(heads):
        qh = q8[:, h * dp:(h + 1) * dp]
        kh = k8[:, h * dp:(h + 1) * dp]
        vh = v8[:, h * dp:(h + 1) * dp]
        s32 = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, T]
        s = s32.astype(jnp.float32) * sc_ref[0, 0]
        s = s - jnp.max(s, axis=-1, keepdims=True) + 4.844187086458591
        e = jnp.exp(s)                                      # rowmax == 127
        denom = jnp.sum(e, axis=-1, keepdims=True)
        e8 = jnp.round(e).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            e8, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, dp]
        of_ref[:, h * dp:(h + 1) * dp] = jnp.clip(
            jnp.round(o32.astype(jnp.float32) * (sc_ref[1, h] / denom)),
            -127, 127).astype(jnp.int8)
    out32 = jax.lax.dot_general(
        of_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                   # [T, C]
    o_ref[0] = (out32.astype(jnp.float32) * sc_ref[0, 1]).astype(
        o_ref.dtype)


def _attn_kernel_abs_padded_ln_s8(x_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                                  m_ref, g_ref, sc_ref, o_ref, of_ref, *,
                                  heads: int, eps: float,
                                  v_bf16: bool = False):
    """:func:`_attn_kernel_abs_padded_s8` with the transformer block's
    surrounding elementwise ops absorbed: the pre-attention LayerNorm
    (in fp32, then static-scale s8 quantize in VMEM), the to_out bias
    and the residual add — so the block's attention half is ONE custom
    call with no [B,T,C] activation round-trips between LN, projections
    and residual. ``g`` tile rows: 0=ln scale, 1=ln bias, 2=to_out bias;
    ``sc[0, 2]`` carries the static x act scale for the in-kernel
    quantize. Everything else matches the non-LN kernel.

    ``v_bf16``: keep V, the probabilities and to_out in bf16 — V
    dequantizes through ``m`` row 3 (real-unit per-column scales), the
    unnormalized exp goes straight to bf16 (no e8/of8 round+clip VPU
    sweeps — the projection quantize chain is the kernel's measured
    bottleneck, BENCH_NOTES round 3), PV and to_out run bf16 MXU, and
    ``wo_ref`` arrives pre-dequantized bf16. More accurate AND faster:
    1.48 vs 1.63 ms for the T=2048 layer."""
    xf = x_ref[0].astype(jnp.float32)   # [T, C]
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    hn = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + g_ref[1]
    xs = sc_ref[0, 2]
    x = jnp.clip(jnp.round(hn / xs), -127, 127).astype(jnp.int8)
    hp = wq_ref.shape[-1]
    dp = hp // heads

    def proj(w_ref, row):
        y32 = jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, HP]
        return jnp.clip(jnp.round(y32.astype(jnp.float32) * m_ref[row]),
                        -127, 127).astype(jnp.int8)

    q8 = proj(wq_ref, 0)
    k8 = proj(wk_ref, 1)
    if v_bf16:
        v32 = jax.lax.dot_general(
            x, wv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        vb = (v32.astype(jnp.float32) * m_ref[3]).astype(jnp.bfloat16)
        for h in range(heads):
            qh = q8[:, h * dp:(h + 1) * dp]
            kh = k8[:, h * dp:(h + 1) * dp]
            vh = vb[:, h * dp:(h + 1) * dp]
            s32 = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)           # [T, T]
            s = s32.astype(jnp.float32) * sc_ref[0, 0]
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s).astype(jnp.bfloat16)
            denom = jnp.sum(e.astype(jnp.float32), axis=-1,
                            keepdims=True)
            ov = jax.lax.dot_general(
                e, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [T, dp]
            of_ref[:, h * dp:(h + 1) * dp] = (ov / denom).astype(
                jnp.bfloat16)
        out = jax.lax.dot_general(
            of_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [T, C]
        o_ref[0] = (xf + out + g_ref[2]).astype(o_ref.dtype)
        return
    v8 = proj(wv_ref, 2)
    for h in range(heads):
        qh = q8[:, h * dp:(h + 1) * dp]
        kh = k8[:, h * dp:(h + 1) * dp]
        vh = v8[:, h * dp:(h + 1) * dp]
        s32 = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, T]
        s = s32.astype(jnp.float32) * sc_ref[0, 0]
        s = s - jnp.max(s, axis=-1, keepdims=True) + 4.844187086458591
        e = jnp.exp(s)                                      # rowmax == 127
        denom = jnp.sum(e, axis=-1, keepdims=True)
        e8 = jnp.round(e).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            e8, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, dp]
        of_ref[:, h * dp:(h + 1) * dp] = jnp.clip(
            jnp.round(o32.astype(jnp.float32) * (sc_ref[1, h] / denom)),
            -127, 127).astype(jnp.int8)
    out32 = jax.lax.dot_general(
        of_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                   # [T, C]
    o_ref[0] = (xf + out32.astype(jnp.float32) * sc_ref[0, 1]
                + g_ref[2]).astype(o_ref.dtype)


def _abs_padded_ln_s8_impl(x, wqp, wkp, wvp, wop, m, g, sc, heads, eps,
                           v_bf16=False, interpret=False):
    b, t, c = x.shape
    hp = wqp.shape[-1]
    return pl.pallas_call(
        functools.partial(_attn_kernel_abs_padded_ln_s8, heads=heads,
                          eps=eps, v_bf16=v_bf16),
        grid=(b,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wqp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wkp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wvp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wop.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(m.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM(
            (t, hp), jnp.bfloat16 if v_bf16 else jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x, wqp, wkp, wvp, wop, m, g, sc)


def _attn_kernel_abs_padded_ln_s8_vt(x_ref, wq_ref, wk_ref, wvt_ref,
                                     wo_ref, m_ref, g_ref, sc_ref, o_ref,
                                     ot_ref, *, heads: int, eps: float):
    """Transposed-VALUE variant of the ``v_bf16`` LN kernel: the value
    path runs K-major so the PV matmul contracts over the full T dim
    instead of producing d→128 lane-padded outputs (d=40 heads waste
    3.2× of the bf16 PV MXU time in the row-major form — the LN
    kernel's largest single cost at T=2048, see BENCH_NOTES round 3).

    Per head: ``S^T = K Qᵀ`` (the same rhs-transposed s8 matmul as the
    row-major QKᵀ, operands swapped), softmax over axis 0 (keys),
    ``Oᵀ = Vᵀ Pᵀ`` with Vᵀ ``[d, T]`` — contraction T, NO padding —
    accumulated into a ``[C, T]`` scratch, and the epilogue returns to
    row-major for free via an lhs-transposed dot:
    ``out[t, c] = Σ_r Oᵀ[r, t]·wo[r, c]``. No explicit transposes
    anywhere; Mosaic lowers all three non-standard contraction orders
    natively (probed on-chip). Vᵀ itself comes from ONE rhs-transposed
    s8 matmul on the UNPADDED pre-transposed value weights
    ``wvt [C, C]`` (cheaper than the padded [C, HP] projection).

    ``sc`` extends the v_bf16 layout with row 2 = per-head real-unit V
    dequant scales (``scales[:, 0, 2] * act_scale``); ``wo`` arrives
    pre-dequantized bf16 UNPADDED ``[C, C]`` (rows grouped per head,
    matching the scratch row groups)."""
    xf = x_ref[0].astype(jnp.float32)   # [T, C]
    _abs_padded_ln_s8_vt_body(xf, wq_ref, wk_ref, wvt_ref, wo_ref,
                              m_ref, g_ref, sc_ref, o_ref, ot_ref,
                              heads=heads, eps=eps)


def _attn_kernel_abs_padded_ln_s8_vt_pin(x_ref, wpi_ref, wq_ref, wk_ref,
                                         wvt_ref, wo_ref, m_ref, g_ref,
                                         sc_ref, o_ref, ot_ref, *,
                                         heads: int, eps: float):
    """vt kernel with the Transformer2D ``proj_in`` 1x1 conv absorbed as
    a bf16 MXU prologue: ``x`` arrives as the GroupNorm output and the
    kernel computes the residual stream ``h = x @ wpi + bpi`` itself
    (``g`` row 3 = proj_in bias). Outside the kernel that matmul ran at
    ~20% MFU — the custom call forces a {1,2,0} layout on its operand
    and XLA schedules the proj as a standalone token matmul + copy
    (BENCH_NOTES r4 "Where the time goes"); in VMEM it is MXU-trivial
    (C=320: 0.4 GFLOP per image vs the kernel's ~50)."""
    xf = jax.lax.dot_general(
        x_ref[0], wpi_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + g_ref[3]       # [T, C]
    _abs_padded_ln_s8_vt_body(xf, wq_ref, wk_ref, wvt_ref, wo_ref,
                              m_ref, g_ref, sc_ref, o_ref, ot_ref,
                              heads=heads, eps=eps)


def _abs_padded_ln_s8_vt_body(xf, wq_ref, wk_ref, wvt_ref, wo_ref,
                              m_ref, g_ref, sc_ref, o_ref, ot_ref, *,
                              heads: int, eps: float):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    hn = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + g_ref[1]
    xs = sc_ref[0, 2]
    x = jnp.clip(jnp.round(hn / xs), -127, 127).astype(jnp.int8)
    hp = wq_ref.shape[-1]
    dp = hp // heads
    c = xf.shape[-1]
    d = c // heads

    def proj(w_ref, row):
        y32 = jax.lax.dot_general(
            x, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)               # [T, HP]
        return jnp.clip(jnp.round(y32.astype(jnp.float32) * m_ref[row]),
                        -127, 127).astype(jnp.int8)

    q8 = proj(wq_ref, 0)
    k8 = proj(wk_ref, 1)
    v32t = jax.lax.dot_general(                             # Vᵀ [C, T]
        wvt_ref[...], x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    for h in range(heads):
        qh = q8[:, h * dp:(h + 1) * dp]
        kh = k8[:, h * dp:(h + 1) * dp]
        st32 = jax.lax.dot_general(                         # Sᵀ [Tk, Tq]
            kh, qh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        # NOTE: doing max+subtract in the int32 domain measured FASTER
        # standalone (3.00 vs 3.22 ms/layer) but consistently SLOWER
        # e2e (9.97/10.00 vs 10.11 f/s) — same lesson as the MXU-LN
        # stats experiment (BENCH_NOTES): kernel-internal reorderings
        # must be confirmed e2e.
        # r5: the per-column max pass is GONE — softmax is shift-
        # invariant, so subtracting a STATIC offset (sc[0,4], default 0)
        # is mathematically exact while the denominator ones-rows
        # normalize; a clamp at +80 guards f32/bf16 exp overflow (s8
        # scores at bench scales stay far below it, and a binding clamp
        # is a mild score clip, not a NaN). Kills a [T,T] cross-sublane
        # reduce + broadcast-subtract per head per call.
        s = jnp.minimum(
            st32.astype(jnp.float32) * sc_ref[0, 0] - sc_ref[0, 4], 80.0)
        e = jnp.exp(s).astype(jnp.bfloat16)
        vbt = (v32t[h * d:(h + 1) * d].astype(jnp.float32)
               * sc_ref[2, h]).astype(jnp.bfloat16)         # [d, Tk]
        # 8 ones rows ride along so the SAME matmul yields the softmax
        # denominator (row d) — no [T,T] cross-sublane VPU sum
        vbt = jnp.concatenate(
            [vbt, jnp.ones((8, vbt.shape[1]), jnp.bfloat16)], axis=0)
        ovt = jax.lax.dot_general(                          # Oᵀ [d+8, Tq]
            vbt, e, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        denom = ovt[d]
        ot_ref[h * d:(h + 1) * d, :] = (ovt[:d] / denom).astype(
            jnp.bfloat16)
    out = jax.lax.dot_general(                              # [T, C]
        ot_ref[...], wo_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (xf + out + g_ref[2]).astype(o_ref.dtype)


def _abs_padded_ln_s8_vt_impl(x, wqp, wkp, wvt8, wo_dq, m, g, sc, heads,
                              eps, interpret=False):
    b, t, c = x.shape
    return pl.pallas_call(
        functools.partial(_attn_kernel_abs_padded_ln_s8_vt, heads=heads,
                          eps=eps),
        grid=(b,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wqp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wkp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wvt8.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wo_dq.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(m.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((c, t), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x, wqp, wkp, wvt8, wo_dq, m, g, sc)


def _abs_padded_ln_s8_vt_pin_impl(x, wpi, wqp, wkp, wvt8, wo_dq, m, g,
                                  sc, heads, eps, interpret=False):
    b, t, c = x.shape
    return pl.pallas_call(
        functools.partial(_attn_kernel_abs_padded_ln_s8_vt_pin,
                          heads=heads, eps=eps),
        grid=(b,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wpi.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wqp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wkp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wvt8.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wo_dq.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(m.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((c, t), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x, wpi, wqp, wkp, wvt8, wo_dq, m, g, sc)


def pack_padded_ln_vt_tiles(wq8, wk8, wv8, wo8, scales, heads,
                            softmax_scale, act_scale, ln_scale, ln_bias,
                            out_bias, attn_scale: float = 0.1,
                            proj_in_bias=None):
    """Build the loop-invariant operands of the padded-LN vt attention
    kernel (the default fused-norms path): head-padded Q/K weights,
    pre-transposed V weights, pre-dequantized bf16 to_out weights and
    the m/g/sc scale tiles.

    Built in-graph these re-materialize every step of the sampling scan
    (XLA does not hoist out of ``lax.scan``) — ~1 MB of zero+set copies
    per attention site per step. ``ops.quant.pack_inference_tiles``
    calls this once outside the scan and stores the result in the param
    tree; :func:`absorbed_padded_ln_self_attention_s8` consumes it via
    ``pack=``."""
    c = wq8.shape[0]
    d = c // heads
    wqp, wkp, _wvp, _wop, m, sc = _abs_padded_prep(
        wq8, wk8, wv8, wo8, scales, heads, act_scale, attn_scale,
        softmax_scale)
    sc = sc.at[0, 2].set(jnp.float32(act_scale))
    sc = sc.at[2, :heads].set(scales[:, 0, 2] * jnp.float32(act_scale))
    g = jnp.zeros((8, c), jnp.float32)
    g = g.at[0].set(ln_scale.astype(jnp.float32))
    g = g.at[1].set(ln_bias.astype(jnp.float32))
    g = g.at[2].set(out_bias.astype(jnp.float32))
    if proj_in_bias is not None:
        # row 3: Transformer2D proj_in bias (the _pin kernel absorbs the
        # 1x1 proj conv as a bf16 prologue matmul)
        g = g.at[3].set(proj_in_bias.astype(jnp.float32))
    wvt8 = wv8.T
    wo_dq = (wo8.astype(jnp.float32)
             * jnp.repeat(scales[:, 0, 3], d)[:, None]
             ).astype(jnp.bfloat16)
    return {"wqp": wqp, "wkp": wkp, "wvt": wvt8, "wo": wo_dq,
            "m": m, "g": g, "sc": sc}


def absorbed_padded_ln_self_attention_s8(
    x: jnp.ndarray, ln_scale, ln_bias, out_bias,
    wq8, wk8, wv8, wo8, scales,
    heads: int, scale: float, act_scale: float,
    attn_scale: float = 0.1, eps: float = 1e-6, max_seq: int = 2048,
    v_bf16: bool = True, v_transposed: bool = True, pack=None,
    proj_in=None,
) -> jnp.ndarray:
    """``x + to_out(attn(LN(x)))`` in one fused s8 kernel — the padded
    absorbed kernel plus the block's pre-attention LayerNorm, to_out
    bias and residual add (see the kernel docstring). Same prequantized
    weight storage as :func:`absorbed_padded_self_attention_s8`.
    ``v_bf16`` (default): V/probabilities/to_out in bf16 — faster (the
    VPU quantize chain dominates the kernel) and more accurate.
    ``pack``: prepacked operands from :func:`pack_padded_ln_vt_tiles`
    (vt path only); when given, the raw weight/scale args only feed the
    fallback branch and dead-code eliminate on the kernel path.
    ``proj_in``: optional ``(w [C, C] bf16, b [C])`` — the Transformer2D
    proj_in 1x1 conv absorbed as a bf16 prologue matmul (``x`` then
    arrives as the GroupNorm output and the kernel builds the residual
    stream itself; vt path only). When ``pack`` is given alongside, its
    ``g`` row 3 must already hold the proj_in bias
    (``pack_inference_tiles(fuse_projs=True)``)."""
    b, t, c = x.shape
    d = c // heads

    def _ln(xx):
        xf = xx.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        return (xc * jax.lax.rsqrt(var + eps)
                * ln_scale.astype(jnp.float32)
                + ln_bias.astype(jnp.float32)).astype(xx.dtype)

    if (t > max_seq or t % 8 != 0 or c % heads != 0 or d % 8 != 0
            or jax.default_backend() == "cpu"):
        if proj_in is not None:
            # same math as the _pin prologue, in XLA
            x = (jnp.einsum("btc,co->bto", x.astype(jnp.float32),
                            proj_in[0].astype(jnp.float32))
                 + proj_in[1].astype(jnp.float32)).astype(x.dtype)
        h = _ln(x)
        attn = absorbed_padded_self_attention_s8(
            h, wq8, wk8, wv8, wo8, scales, heads, scale, act_scale,
            attn_scale, max_seq)
        return (x.astype(jnp.float32) + attn.astype(jnp.float32)
                + out_bias.astype(jnp.float32)).astype(x.dtype)

    if v_transposed and v_bf16:
        # K-major value path (see _attn_kernel_abs_padded_ln_s8_vt):
        # unpadded pre-transposed value weights, unpadded bf16 wo (rows
        # grouped per head), per-head real-unit V scales in sc row 2.
        # Only a refinement of the bf16-V path — an explicit
        # v_bf16=False still selects the pure-s8 V kernel below.
        if pack is None:
            pack = pack_padded_ln_vt_tiles(
                wq8, wk8, wv8, wo8, scales, heads, scale, act_scale,
                ln_scale, ln_bias, out_bias, attn_scale,
                proj_in_bias=None if proj_in is None else proj_in[1])
        if proj_in is not None:
            return _abs_padded_ln_s8_vt_pin_impl(
                x, proj_in[0].astype(jnp.bfloat16),
                pack["wqp"], pack["wkp"], pack["wvt"], pack["wo"],
                pack["m"], pack["g"], pack["sc"], heads,
                eps).astype(x.dtype)
        return _abs_padded_ln_s8_vt_impl(
            x, pack["wqp"], pack["wkp"], pack["wvt"], pack["wo"],
            pack["m"], pack["g"], pack["sc"], heads,
            eps).astype(x.dtype)
    assert proj_in is None, "proj_in absorption requires the vt path"
    wqp, wkp, wvp, wop, m, sc = _abs_padded_prep(
        wq8, wk8, wv8, wo8, scales, heads, act_scale, attn_scale, scale)
    sc = sc.at[0, 2].set(jnp.float32(act_scale))
    if v_bf16:
        # real-unit V dequant scales (m row 3) + pre-dequantized bf16 wo
        dp = wqp.shape[-1] // heads
        m = m.at[3].set(jnp.repeat(scales[:, 0, 2], dp)
                        * jnp.float32(act_scale))
        wop = (wop.astype(jnp.float32)
               * jnp.repeat(scales[:, 0, 3], dp)[:, None]
               ).astype(jnp.bfloat16)
    g = jnp.zeros((8, c), jnp.float32)
    g = g.at[0].set(ln_scale.astype(jnp.float32))
    g = g.at[1].set(ln_bias.astype(jnp.float32))
    g = g.at[2].set(out_bias.astype(jnp.float32))
    return _abs_padded_ln_s8_impl(x, wqp, wkp, wvp, wop, m, g, sc,
                                  heads, eps,
                                  v_bf16=v_bf16).astype(x.dtype)


def _abs_padded_prep(wq8, wk8, wv8, wo8, scales, heads,
                     act_scale, attn_scale, softmax_scale):
    """Loop-invariant prep for the padded absorbed s8 kernel: pad the
    [C, C] prequantized kernels to 128-aligned head offsets and build
    the per-column / scalar scale tiles (see the kernel docstring)."""
    c = wq8.shape[0]
    d = c // heads
    dp = ((d + 127) // 128) * 128
    hp = heads * dp

    def pad_cols(w8):                   # [C, C] -> [C, HP]
        wp = jnp.zeros((c, heads, dp), jnp.int8)
        return wp.at[:, :, :d].set(w8.reshape(c, heads, d)).reshape(c, hp)

    wqp, wkp, wvp = pad_cols(wq8), pad_cols(wk8), pad_cols(wv8)
    wop = jnp.zeros((heads, dp, c), jnp.int8)
    wop = wop.at[:, :d, :].set(wo8.reshape(heads, d, c)).reshape(hp, c)

    xs = jnp.float32(act_scale)
    as_ = jnp.float32(attn_scale)
    mrows = jnp.stack([scales[:, 0, i] for i in range(3)]) * (xs / as_)
    m = jnp.zeros((8, hp), jnp.float32)
    m = m.at[:3].set(jnp.repeat(mrows, dp, axis=1))         # [3, HP]
    wos = scales[:, 0, 3]
    wos_max = jnp.maximum(jnp.max(wos), 1e-8)
    sc = jnp.zeros((8, 128), jnp.float32)
    sc = sc.at[0, 0].set(as_ * as_ * softmax_scale)
    sc = sc.at[0, 1].set(as_ * wos_max)
    sc = sc.at[1, :heads].set(wos / wos_max)
    return wqp, wkp, wvp, wop, m, sc


def _abs_padded_s8_impl(x8, wqp, wkp, wvp, wop, m, sc, heads,
                        interpret=False):
    b, t, c = x8.shape
    hp = wqp.shape[-1]
    return pl.pallas_call(
        functools.partial(_attn_kernel_abs_padded_s8, heads=heads),
        grid=(b,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wqp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wkp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wvp.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wop.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(m.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x8.shape, jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((t, hp), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x8, wqp, wkp, wvp, wop, m, sc)


def absorbed_padded_self_attention_s8(
    x: jnp.ndarray, wq8, wk8, wv8, wo8, scales,
    heads: int, scale: float, act_scale: float,
    attn_scale: float = 0.1, max_seq: int = 2048,
) -> jnp.ndarray:
    """Padded-layout absorbed s8 self-attention (see the kernel
    docstring). Takes the SAME prequantized storage as
    :func:`absorbed_self_attention_s8` — ``wq8/wk8/wv8 [C, C]`` int8 in
    the original Dense layout with per-head scales
    ``scales [H, 8, 128]`` (lanes 0..3 = wq/wk/wv/wo, from
    :func:`quantize_head_weights` via ``prequantize_conv_tree``) and
    ``wo8 [C, C]`` (rows grouped per head) — and pads to 128-aligned
    head offsets in-graph (a loop-invariant int8 copy, ~0.2% of a
    forward). ``act_scale`` quantizes x once per layer (static);
    ``attn_scale`` is the static q/k/v scale shared with the flat s8
    path. Off-TPU / misaligned shapes fall back to dequantized float
    math."""
    b, t, c = x.shape
    d = c // heads
    if (t > max_seq or t % 8 != 0 or c % heads != 0 or d % 8 != 0
            or jax.default_backend() == "cpu"):
        deq = lambda w8, i: (w8.astype(jnp.float32)  # noqa: E731
                             .reshape(c, heads, d)
                             * scales[:, 0, i][None, :, None]
                             ).reshape(c, c)
        wo = (wo8.astype(jnp.float32).reshape(heads, d, c)
              * scales[:, 0, 3][:, None, None]).reshape(c, c)
        q = x.astype(jnp.float32) @ deq(wq8, 0)
        k = x.astype(jnp.float32) @ deq(wk8, 1)
        v = x.astype(jnp.float32) @ deq(wv8, 2)
        r = lambda y: y.reshape(b, t, heads, d)  # noqa: E731
        out = _xla_bthd(r(q), r(k), r(v), scale)
        return (out.reshape(b, t, c) @ wo).astype(x.dtype)

    wqp, wkp, wvp, wop, m, sc = _abs_padded_prep(
        wq8, wk8, wv8, wo8, scales, heads, act_scale, attn_scale, scale)

    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / jnp.float32(act_scale)),
                  -127, 127).astype(jnp.int8)
    return _abs_padded_s8_impl(x8, wqp, wkp, wvp, wop, m, sc,
                               heads).astype(x.dtype)


def _fused_impl(q, k, v, scale, block_q):
    bh, t, d = q.shape
    block_q = min(block_q, t)
    grid = (bh, t // block_q)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
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


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float):
    """Flash-style attention backward, one (batch*head, q-block) grid
    step: recompute the softmax row block P in VMEM (same cost model as
    the forward — zero HBM score traffic), then

        dV += P^T dO,  dP = dO V^T,  dS = P (dP - rowsum(dP P)),
        dQ  = dS K * scale,  dK += dS^T Q * scale.

    dK/dV blocks map every q-step to the same (i, 0, 0) slot; TPU grid
    iteration is sequential with the q axis innermost, so the revisited
    block accumulates in fp32 across q-blocks (initialized at j == 0).

    All five matmuls keep their OPERANDS in the input dtype (bf16 when
    training) with fp32 accumulation — fp32-operand MXU matmuls run at
    ~1/8 the bf16 rate on v5e, and the first version of this kernel
    upcast everything before the dots (4.6 ms/layer at the T=2048 hot
    shape vs 2.0 for the forward). Softmax and the dS algebra stay
    fp32; P/dS are rounded to the input dtype only as matmul operands,
    matching the XLA vjp's own bf16 einsum operands."""
    j = pl.program_id(1)
    q = q_ref[0]                           # [BQ, D]
    k = k_ref[0]                           # [T, D]
    v = v_ref[0]
    do = do_ref[0]                         # [BQ, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # [BQ, T]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)             # [BQ, T] fp32
    pb = p.astype(q.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # [BQ, T]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # [BQ, D]
    dq_ref[...] = dq.reshape(dq_ref.shape).astype(dq_ref.dtype)
    part_k = (jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale)       # [T, D]
    part_v = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # [T, D]

    @pl.when(j == 0)
    def _init():
        dk_ref[...] = part_k.reshape(dk_ref.shape)
        dv_ref[...] = part_v.reshape(dv_ref.shape)

    @pl.when(j > 0)
    def _acc():
        dk_ref[...] += part_k.reshape(dk_ref.shape)
        dv_ref[...] += part_v.reshape(dv_ref.shape)


def _flash_bwd(q, k, v, do, scale, block_q, interpret=False):
    """dQ/dK/dV for ``_fused_self_attention_flat`` inputs ``[BH, T, D]``
    without materializing scores in HBM (the XLA vjp round-trips a
    [BH, T, T] fp32 softmax — ~2 GB per 2048-token layer at b16, the
    dominant cost of the training step's attention)."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    block_q = min(block_q, tq)
    grid = (bh, tq // block_q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_self_attention_flat(q, k, v, scale, block_q):
    return _fused_impl(q, k, v, scale, block_q)


def _fwd(q, k, v, scale, block_q):
    return _fused_impl(q, k, v, scale, block_q), (q, k, v)


def _bwd(scale, block_q, res, g):
    q, k, v = res
    if jax.default_backend() == "cpu":
        _, vjp = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, scale),
                         q, k, v)
        return vjp(g)
    return _flash_bwd(q, k, v, g, scale, block_q)


_fused_self_attention_flat.defvjp(_fwd, _bwd)


def _xla_bthd(q, k, v, scale):
    b, t, h, dh = q.shape
    flat = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, dh)  # noqa
    out = _xla_reference(flat(q), flat(k), flat(v), scale)
    return out.reshape(b, h, t, dh).transpose(0, 2, 1, 3)


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
    if (t > max_seq or t % min(block_q, t) != 0 or t % 8 != 0
            or jax.default_backend() == "cpu"):
        return _xla_bthd(q, k, v, scale)
    flat = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, dh)  # noqa
    out = _fused_self_attention_flat(flat(q), flat(k), flat(v), scale,
                                     min(block_q, t))
    return out.reshape(b, h, t, dh).transpose(0, 2, 1, 3)
