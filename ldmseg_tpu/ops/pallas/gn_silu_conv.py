"""Pallas TPU kernel: fused GroupNorm + SiLU + 3x3 conv.

Every ResnetBlock half is GN -> SiLU -> conv3x3; XLA keeps them as
separate fusions with an HBM round trip of the normalized activation in
between. This kernel does the whole half per batch image in VMEM:

  * GN statistics via the one-hot group matmul (no lane shape casts),
  * normalize + scale/shift + SiLU into a zero-padded scratch
    [H+2, W+2, C],
  * the 3x3 conv as 9 shifted [H*(W+2), Cin] @ [Cin, Cout] MXU matmuls
    accumulated in fp32 — slices stay static, reshapes only merge
    leading (sublane) dims.

Applicable when one image's activations fit in VMEM (all UNet feature
maps at 1/8-1/64 of 256x512 do); callers fall back to XLA otherwise.
Forward-optimized; the custom VJP recomputes via the XLA reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, out_ref, pad_ref,
            acc_ref, *, groups: int, eps: float):
    x = x_ref[0].astype(jnp.float32)              # [H, W, C]
    h, w, c = x.shape
    cout = out_ref.shape[-1]

    # --- GroupNorm + SiLU (shared one-hot-matmul stats helper) ---
    from .groupnorm_silu import gn_silu_rows
    y = gn_silu_rows(x.reshape(h * w, c), scale_ref[:], bias_ref[:],
                     groups, eps)

    # --- zero-padded activation scratch [H+2, W+2, C] ---
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[1:h + 1, 1:w + 1, :] = y.reshape(h, w, c).astype(pad_ref.dtype)

    # --- 3x3 conv as 9 shifted matmuls, accumulated in fp32 ---
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        rows = pad_ref[dy:dy + h, :, :]           # [H, W+2, C]
        rows2d = rows.reshape(h * (w + 2), c)
        for dx in range(3):
            wk = w_ref[dy, dx].astype(rows2d.dtype)   # [C, Cout]
            mres = jnp.dot(rows2d, wk,
                           preferred_element_type=jnp.float32)
            mres = mres.reshape(h, w + 2, cout)
            acc_ref[:, 0:w, :] += mres[:, dx:dx + w, :]

    out = acc_ref[:, 0:w, :] + b_ref[:].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _vbytes(shape, dtype):
    return int(np.prod(shape)) * np.dtype(dtype).itemsize


def _forward(x, scale, bias, w, b, groups, eps):
    bsz, h, wd, c = x.shape
    cout = w.shape[-1]
    kernel = functools.partial(_kernel, groups=groups, eps=eps)
    limit = (6 * _vbytes((h, wd, c), jnp.float32)
             + 3 * _vbytes((h, wd + 2, cout), jnp.float32)
             + _vbytes(w.shape, jnp.float32) + (4 << 20))
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, wd, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, wd + 2, c), x.dtype),
            pltpu.VMEM((h, wd + 2, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(limit, 120 * 1024 * 1024)),
    )(x, scale, bias, w, b)


def _reference(x, scale, bias, w, b, groups, eps):
    from .groupnorm_silu import _reference as gn_ref
    y = gn_ref(x, scale, bias, groups, eps)
    out = jax.lax.conv_general_dilated(
        y.astype(x.dtype), w.astype(x.dtype), (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (out + b.astype(out.dtype)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_gn_silu_conv(x, scale, bias, w, b, groups: int = 32,
                       eps: float = 1e-5):
    """``conv3x3(silu(group_norm(x) * scale + bias), w) + b`` in one pass.

    Args:
      x: ``[B, H, W, Cin]``; w: ``[3, 3, Cin, Cout]``; b: ``[Cout]``.
    """
    return _forward(x, scale, bias, w, b, groups, eps)


def _fwd(x, scale, bias, w, b, groups, eps):
    return _forward(x, scale, bias, w, b, groups, eps), \
        (x, scale, bias, w, b)


def _bwd(groups, eps, res, g):
    x, scale, bias, w, b = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, groups, eps), x, scale, bias, w, b)
    return vjp(g)


fused_gn_silu_conv.defvjp(_fwd, _bwd)


def gn_silu_conv(x, scale, bias, w, b, groups: int = 32, eps: float = 1e-5,
                 max_vmem_tile_bytes: int = 6 * 1024 * 1024):
    """Dispatch: Pallas when the image tile fits, else XLA. Off-TPU
    backends always take the XLA path (compiled pallas_call cannot
    lower on the CPU test mesh)."""
    _, h, wd, c = x.shape
    cout = w.shape[-1]
    need = max(_vbytes((h, wd, c), jnp.float32),
               _vbytes((h, wd, cout), jnp.float32))
    if jax.default_backend() != "cpu" and need <= max_vmem_tile_bytes:
        return fused_gn_silu_conv(x, scale, bias, w, b, groups, eps)
    return _reference(x, scale, bias, w, b, groups, eps)
