"""Pallas TPU kernel: fused GroupNorm + SiLU.

Every ResnetBlock in the UNet/VAEs runs GN -> SiLU -> conv twice
(models/layers.py); the GN+SiLU pair is VPU/bandwidth bound and benefits
from a single VMEM-resident pass instead of separate mean/var/normalize/
activation HLOs. The kernel processes one batch element per grid step
with the full (H, W, C) tile in VMEM (all UNet feature maps at 1/8-1/64
resolution fit comfortably; callers fall back to XLA when they don't).

Layout: channels-last ``[B, H, W, C]``; groups partition C contiguously
(matching flax/torch GroupNorm). Forward-mode kernel with a custom VJP
that recomputes statistics (cheap, keeps residuals small).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gn_silu_rows(xf, scale, bias, groups: int, eps: float):
    """GroupNorm + SiLU over flattened ``[HW, C]`` fp32 rows — THE single
    definition of the in-kernel GN numerics, shared by all three fused
    kernels (plain, +quant, +conv). Mosaic cannot shape-cast across the
    lane (channel) dim, so group statistics are computed with a ``[C, G]``
    one-hot matmul instead of a reshape into ``(G, C/G)``."""
    hw, c = xf.shape
    cg = c // groups
    chan_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (chan_group == group_ids).astype(jnp.float32)  # [C, G]

    s1 = jnp.sum(xf, axis=0, keepdims=True)            # [1, C]
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
    n = jnp.float32(hw * cg)
    mean_g = jnp.dot(s1, m, preferred_element_type=jnp.float32) / n
    ex2_g = jnp.dot(s2, m, preferred_element_type=jnp.float32) / n
    var_g = ex2_g - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)                 # [1, G]
    mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, m.T, preferred_element_type=jnp.float32)

    y = (xf - mean_c) * inv_c
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y * jax.nn.sigmoid(y)              # SiLU


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, out_ref, *, groups: int,
                    eps: float):
    x = x_ref[0].astype(jnp.float32)          # [H, W, C]
    h, w, c = x.shape
    y = gn_silu_rows(x.reshape(h * w, c), scale_ref[:], bias_ref[:],
                     groups, eps)
    out_ref[0] = y.reshape(h, w, c).astype(out_ref.dtype)


def _vmem_bytes(shape, dtype):
    import numpy as np
    return int(np.prod(shape)) * np.dtype(dtype).itemsize


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm_silu(x, scale, bias, groups: int = 32,
                          eps: float = 1e-5):
    """``silu(group_norm(x) * scale + bias)`` in one Pallas pass.

    Args:
      x: ``[B, H, W, C]``; C must divide by ``groups``.
      scale/bias: ``[C]``.
    """
    return _forward(x, scale, bias, groups, eps)


def _forward(x, scale, bias, groups, eps):
    b, h, w, c = x.shape
    assert c % groups == 0
    kernel = functools.partial(_gn_silu_kernel, groups=groups, eps=eps)
    # fp32 working set: in + out + several fused temporaries
    limit = 8 * _vmem_bytes((h, w, c), jnp.float32) + (2 << 20)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(limit, 128 * 1024 * 1024)),
    )(x, scale, bias)


def _reference(x, scale, bias, groups, eps):
    """XLA fallback / VJP recompute path (same math)."""
    b, h, w, c = x.shape
    cg = c // groups
    xg = x.astype(jnp.float32).reshape(b, h * w, groups, cg)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def _fwd(x, scale, bias, groups, eps):
    return _forward(x, scale, bias, groups, eps), (x, scale, bias)


def _bwd(groups, eps, residuals, g):
    x, scale, bias = residuals
    # recompute-based VJP via the XLA reference (GN stats are cheap); the
    # heavy fusion win is the forward inference path
    _, vjp = jax.vjp(
        lambda xx, ss, bb: _reference(xx, ss, bb, groups, eps),
        x, scale, bias)
    return vjp(g)


fused_group_norm_silu.defvjp(_fwd, _bwd)


def group_norm_silu(x, scale, bias, groups: int = 32, eps: float = 1e-5,
                    max_vmem_tile_bytes: int = 8 * 1024 * 1024):
    """Dispatch: Pallas when one image tile fits in VMEM, else XLA.
    Off-TPU backends always take the XLA path (compiled pallas_call
    cannot lower on the CPU test mesh)."""
    _, h, w, c = x.shape
    if (jax.default_backend() != "cpu"
            and _vmem_bytes((h, w, c), jnp.float32) <= max_vmem_tile_bytes):
        return fused_group_norm_silu(x, scale, bias, groups, eps)
    return _reference(x, scale, bias, groups, eps)


# ---------------------------------------------------------------------------
# quantizing variant: GN + SiLU + per-image symmetric int8 quantization in
# the same VMEM pass. The amax sweep costs nothing extra (the activation is
# already resident) and the int8 write HALVES the bandwidth of the pass —
# this is what makes the int8 conv path actually pay off (the XLA-graph
# dynamic-amax version spends an extra HBM sweep per conv, see ops/quant.py).
# INFERENCE-ONLY: int8 outputs carry no tangent; train with the bf16 path.
# ---------------------------------------------------------------------------

def _gn_silu_quant_kernel(x_ref, scale_ref, bias_ref, q_ref, s_ref, *,
                          groups: int, eps: float):
    x = x_ref[0].astype(jnp.float32)          # [H, W, C]
    h, w, c = x.shape
    y = gn_silu_rows(x.reshape(h * w, c), scale_ref[:], bias_ref[:],
                     groups, eps)

    amax = jnp.maximum(jnp.max(jnp.abs(y)), 1e-6)
    s = amax / 127.0
    q = jnp.round(y / s)
    q_ref[0] = q.reshape(h, w, c).astype(jnp.int8)
    # scalar broadcast into an (8, 128) tile — Mosaic requires output
    # blocks to tile 8x128, so a true (1,) scalar output is not legal
    s_ref[0] = jnp.full((8, 128), s, jnp.float32)


def _pallas_available() -> bool:
    # compiled pallas needs a real TPU backend; CPU only has interpret mode
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def group_norm_silu_quant(x, scale, bias, groups: int = 32,
                          eps: float = 1e-5,
                          max_vmem_tile_bytes: int = 8 * 1024 * 1024):
    """``silu(gn(x))`` quantized to int8 with a per-image scale.

    Returns ``(q int8 [B,H,W,C], s float32 [B])`` with
    ``q * s[:,None,None,None] ~= silu(gn(x))``. Falls back to the XLA
    reference + jnp per-image amax when the tile exceeds VMEM.
    """
    b, h, w, c = x.shape
    assert c % groups == 0
    if _pallas_available() and \
            _vmem_bytes((h, w, c), jnp.float32) <= max_vmem_tile_bytes:
        kernel = functools.partial(_gn_silu_quant_kernel, groups=groups,
                                   eps=eps)
        limit = 8 * _vmem_bytes((h, w, c), jnp.float32) + (2 << 20)
        q, s = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, w, c), jnp.int8),
                jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(limit, 128 * 1024 * 1024)),
        )(x, scale, bias)
        return q, s[:, 0, 0]
    y = _reference(x, scale, bias, groups, eps).astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(y), axis=(1, 2, 3)), 1e-6)
    s = amax / 127.0
    q = jnp.round(y / s[:, None, None, None]).astype(jnp.int8)
    return q, s
