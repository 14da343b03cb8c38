"""SD-style denoising UNet — Flax redesign of the reference ``UNet``
(ldmseg/models/unet.py:24-436, a surgered diffusers UNet2DConditionModel).

Architecture (Stable-Diffusion v1-4): conv_in -> 3x CrossAttnDownBlock +
DownBlock -> mid (resnet/attn/resnet) -> UpBlock + 3x CrossAttnUpBlock ->
GN/silu/conv_out, with sinusoidal time embeddings. Channels-last, bf16
friendly, everything static-shaped.

Reference surgery mapped to config + param-tree transforms (not runtime
mutation):
  * ``modify_encoder`` 4->8(+cond) channel ``conv_in`` with per-slice init
    modes copy/zero/mean/div/random (unet.py:124-233)
    -> :func:`expand_conv_in` param transform.
  * ``remove_cross_attention`` (unet.py:83-105) -> ``use_cross_attention=
    False`` builds transformer blocks without attn2/norm2.
  * ``separate_conv`` (unet.py:140-173): seg/img conv_in pair summed
    (forward :352-355).
  * ``separate_encoder`` (unet.py:42-63): duplicated image down path with
    its own time embedding; image residuals added to seg skip connections
    (forward :309-355), optional zero-init adaptor convs.
  * ``define_upscaler`` (unet.py:65-81): upscaler head replacing conv_out.
  * ``object_queries`` / ``encoder_hid_proj`` / input dropout
    (unet.py:26-40, :121-122, :319-326).
  * ``freeze_layers`` (unet.py:235-279) is an optimizer concern ->
    :func:`freeze_filter` path predicates for optax masking.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import ResnetBlock, timestep_embedding, TimestepEmbedding


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD-1.4 defaults; see modify-able fields for the surgery knobs."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8  # = num heads (SD v1 semantics)
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    use_cross_attention: bool = True
    # which blocks get transformers (SD: all but the last down / first up)
    attn_down: Tuple[bool, ...] = (True, True, True, False)
    # surgery knobs
    cond_channels: int = 0
    separate_conv: bool = False
    separate_encoder: bool = False
    add_adaptor: bool = False
    upscaler_classes: int = 0  # >0 replaces conv_out with the upscaler head
    upscaler_dim: int = 256
    num_object_queries: int = 0
    encoder_hid_dim: int = 0  # >0 adds encoder_hid_proj Linear
    dropout: float = 0.0
    dropout_mode: str = "standard"  # 'standard' | 'gaussian'
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    use_pallas_gn: bool = False  # fused Pallas GroupNorm+SiLU in resnets
    use_fused_attention: bool = False  # Pallas VMEM-softmax self-attn
    use_packed_attention: bool = False  # [B,T,C]-layout Pallas self-attn
    use_absorbed_attention: bool = False  # projections inside the kernel
    # head-PADDED absorbed s8 attention: projections + attention +
    # to_out in one kernel on the native [B,T,C] layout, weights padded
    # to 128-aligned head offsets (fixes the per-head-padding and
    # one-hot-selection costs of the other absorbed variants)
    use_padded_attention: bool = False
    use_int8_conv: bool = False  # int8 MXU fast path for resnet 3x3 convs
    use_int8_attention: bool = False  # s8 matmuls inside the attn kernel
    use_int8_ff: bool = False  # s8 transformer feed-forward matmuls
    use_fused_ff: bool = False  # fused s8 GEGLU Pallas kernel
    # absorb the transformer LayerNorms, out-proj biases and residual
    # adds into the padded-attention / fused-GEGLU kernels (inference):
    # the self-attn block becomes exactly two custom calls
    use_fused_norms: bool = False
    # absorb the Transformer2D 1x1 proj convs as bf16 prologue/
    # epilogue matmuls of those two kernels (needs fused_norms)
    use_fused_projs: bool = False
    int8_act_scale: Optional[float] = None  # static act scale for int8
    # static q/k/v scale for the s8 attention kernel (None = dynamic
    # amax; attention inputs span wider ranges than GN+SiLU outputs)
    int8_attn_act_scale: Optional[float] = None
    int8_fuse_gn: bool = False  # fused GN+quant pass (inference only)
    gradient_checkpointing: bool = False  # remat down/mid/up blocks
    # jax.checkpoint_policies name for the remat sites (e.g.
    # 'dots_with_no_batch_dims_saveable' keeps weight-matmul outputs and
    # only recomputes elementwise/norm work in the backward pass). None =
    # save nothing (diffusers-equivalent full recompute).
    remat_policy: Optional[str] = None


class _DenseParams(nn.Module):
    """Parameter-only stand-in for ``nn.Dense`` (same name/shape tree) —
    lets the absorbed-attention path hand the raw kernels to the Pallas
    kernel while staying checkpoint-compatible with the Dense layout."""

    features: int
    in_features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features))
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _ConvParams(nn.Module):
    """Parameter-only stand-in for a 1x1 ``nn.Conv`` (same name/shape
    tree) — lets the fused-projs path hand the Transformer2D proj convs
    to the Pallas kernels while staying checkpoint-compatible."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # [1, 1, Cin, Cout] -> [Cin, Cout]: a free row-major reshape;
        # y = x @ w matches the 1x1 conv exactly
        return kernel.reshape(self.in_features, self.features), bias


class _LNParams(nn.Module):
    """Parameter-only stand-in for ``nn.LayerNorm`` (same name/shape
    tree) — lets the fused-norms path hand scale/bias to a Pallas kernel
    that computes the LayerNorm in VMEM, checkpoint-compatible."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class CrossAttention(nn.Module):
    """Multi-head attention; self when ``context is None``.

    Matches diffusers Attention: q/k/v without bias, out proj with bias.
    """

    query_dim: int
    heads: int
    context_dim: Optional[int] = None
    use_fused: bool = False
    int8: bool = False
    packed: bool = False
    absorbed: bool = False
    padded: bool = False
    int8_act_scale: Optional[float] = None

    def _absorbed(self, x):
        """Projections + attention + out-projection in ONE Pallas call on
        the native [B, T, C] layout (ops/pallas/attention.py
        ``absorbed_self_attention*``): no head transposes, no layout
        constraints forced on the surrounding matmuls, and (s8) a single
        activation quantize per layer instead of per-projection sweeps."""
        from ..ops.pallas.attention import (
            absorbed_self_attention, absorbed_self_attention_s8,
            quantize_head_weights)
        inner = self.query_dim
        head_dim = inner // self.heads
        scale = head_dim**-0.5
        kq, _ = _DenseParams(inner, inner, name="to_q")()
        kk, _ = _DenseParams(inner, inner, name="to_k")()
        kv, _ = _DenseParams(inner, inner, name="to_v")()
        ko, bo = _DenseParams(inner, inner, use_bias=True,
                              name="to_out")()
        if isinstance(kq, dict):
            # pre-quantized weights (prequantize_conv_tree, stored in the
            # original [C, C] layout); re-split heads on int8 — tiny
            hsplit8 = lambda w8: w8.reshape(  # noqa: E731
                inner, self.heads, head_dim).transpose(1, 0, 2)
            scales = jnp.zeros((self.heads, 8, 128), jnp.float32)
            for i, leaf in enumerate((kq, kk, kv, ko)):
                scales = scales.at[:, 0, i].set(leaf["scale"])
            out = absorbed_self_attention_s8(
                x, hsplit8(kq["q"]), hsplit8(kk["q"]), hsplit8(kv["q"]),
                ko["q"].reshape(self.heads, head_dim, inner), scales,
                self.heads, scale,
                act_scale=kq.get("x_scale",
                                 self.int8_act_scale or 0.1))
        elif self.int8:
            # correctness path without prequantized weights: quantize
            # in-graph (slow per-step; tests / non-scan callers)
            wq8, wk8, wv8, wo8, scales = quantize_head_weights(
                kq, kk, kv, ko, self.heads)
            out = absorbed_self_attention_s8(
                x, wq8, wk8, wv8, wo8, scales, self.heads, scale,
                act_scale=self.int8_act_scale or 0.1)
        else:
            c = inner
            hsplit = lambda w: w.reshape(  # noqa: E731
                c, self.heads, head_dim).transpose(1, 0, 2)
            out = absorbed_self_attention(
                x, hsplit(kq), hsplit(kk), hsplit(kv),
                ko.reshape(self.heads, head_dim, c), self.heads, scale)
        return out + bo.astype(out.dtype)

    def _absorbed_padded(self, x, ln=None, proj_in=None):
        """Projections + attention + out-projection in ONE s8 Pallas call
        with head-PADDED weights (ops/pallas/attention.py
        ``absorbed_padded_self_attention_s8``): all heads projected by a
        single full-width s8 matmul, head slices at free 128-aligned
        offsets, to_out as one matmul from the int8 PV scratch. Native
        [B,T,C] layout on both sides — no layout constraints leak into
        the surrounding graph. With ``ln`` (the block's pre-attention
        LayerNorm scale/bias), the LN, to_out bias and residual add are
        absorbed too and the return value is the NEW residual stream
        ``x + to_out(attn(LN(x)))``."""
        from ..ops.pallas.attention import (
            absorbed_padded_self_attention_s8,
            absorbed_padded_ln_self_attention_s8, quantize_head_weights)
        inner = self.query_dim
        head_dim = inner // self.heads
        scale = head_dim**-0.5
        kq, _ = _DenseParams(inner, inner, name="to_q")()
        kk, _ = _DenseParams(inner, inner, name="to_k")()
        kv, _ = _DenseParams(inner, inner, name="to_v")()
        ko, bo = _DenseParams(inner, inner, use_bias=True,
                              name="to_out")()
        xs = self.int8_act_scale or 0.1
        if isinstance(kq, dict) and "x_scale" in kq:
            # calibrated per-site scale (LN1-output range; one scale per
            # layer — the kernel quantizes x once for all projections)
            xs = kq["x_scale"]
        if isinstance(kq, dict):
            # prequantized {"q": [C,C] s8, "scale": [H]} leaves
            # (prequantize_conv_tree absorbed_attention storage)
            scales = jnp.zeros((self.heads, 8, 128), jnp.float32)
            for i, leaf in enumerate((kq, kk, kv, ko)):
                scales = scales.at[:, 0, i].set(leaf["scale"])
            w8 = (kq["q"], kk["q"], kv["q"], ko["q"])
        else:
            # correctness path without prequantized weights: quantize
            # in-graph (slow per-step; tests / non-scan callers)
            wq8, wk8, wv8, wo8, scales = quantize_head_weights(
                kq, kk, kv, ko, self.heads)
            c = inner
            flat_qkv = lambda w: jnp.transpose(  # noqa: E731
                w, (1, 0, 2)).reshape(c, c)
            w8 = (flat_qkv(wq8), flat_qkv(wk8), flat_qkv(wv8),
                  wo8.reshape(c, c))
        if ln is not None:
            # prepacked loop-invariant operands (pack_inference_tiles):
            # the wrapper then ignores w8/scales on the kernel path and
            # the tile builds above dead-code eliminate
            pack = None
            if isinstance(kq, dict) and "t_wqp" in kq:
                pack = {"wqp": kq["t_wqp"], "wkp": kk["t_wkp"],
                        "wvt": kv["t_wvt"], "wo": ko["t_wo"],
                        "m": ko["t_m"], "g": ko["t_g"], "sc": ko["t_sc"]}
            return absorbed_padded_ln_self_attention_s8(
                x, ln[0], ln[1], bo, *w8, scales, self.heads, scale,
                act_scale=xs, pack=pack, proj_in=proj_in)
        assert proj_in is None, "proj_in absorption needs fused_norms"
        out = absorbed_padded_self_attention_s8(
            x, *w8, scales, self.heads, scale, act_scale=xs)
        return out + bo.astype(out.dtype)

    @nn.compact
    def __call__(self, x, context=None, ln=None, proj_in=None):
        is_self = context is None
        if self.padded and is_self:
            return self._absorbed_padded(x, ln=ln, proj_in=proj_in)
        assert proj_in is None, "proj_in absorption needs padded attn"
        if self.absorbed and is_self:
            return self._absorbed(x)
        context = x if context is None else context
        inner = self.query_dim
        head_dim = inner // self.heads
        # NOTE: quantizing to_q/k/v/to_out (QuantDense) measured NET
        # NEGATIVE e2e (43.9 vs 42.4 ms/fwd b16) - the extra quantize
        # roundtrip before the s8 attention kernel (which quantizes its
        # inputs anyway) costs more than the s8 matmuls save. bf16 kept.
        Dense = nn.Dense
        q = Dense(inner, use_bias=False, name="to_q")(x)
        k = Dense(inner, use_bias=False, name="to_k")(context)
        v = Dense(inner, use_bias=False, name="to_v")(context)
        if self.packed and is_self:
            # layout-preserving kernels on the native [B, T, C] tensors —
            # no head transposes, no layout constraints on the graph
            if self.int8:
                from ..ops.pallas.attention import (
                    fused_self_attention_packed_s8)
                out = fused_self_attention_packed_s8(q, k, v, self.heads,
                                                     head_dim**-0.5)
            else:
                from ..ops.pallas.attention import fused_self_attention_packed
                out = fused_self_attention_packed(q, k, v, self.heads,
                                                  head_dim**-0.5)
            return Dense(inner, name="to_out")(out)
        b, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(b, tq, self.heads, head_dim)
        k = k.reshape(b, tk, self.heads, head_dim)
        v = v.reshape(b, tk, self.heads, head_dim)
        scale = head_dim**-0.5
        if self.use_fused and is_self:
            if self.int8:
                # s8 MXU path, quantization fused into the projections
                from ..ops.pallas.attention import fused_self_attention_s8
                out = fused_self_attention_s8(
                    q, k, v, scale, act_scale=self.int8_act_scale)
            else:
                from ..ops.pallas.attention import fused_self_attention
                out = fused_self_attention(q, k, v, scale)
            out = out.reshape(b, tq, inner)
            return Dense(inner, name="to_out")(out)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, tq, inner)
        return Dense(inner, name="to_out")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers): proj to 2*4*dim, gate with gelu."""

    dim: int
    mult: int = 4
    int8: bool = False  # s8 MXU matmuls (inference-only)
    fused: bool = False  # whole GEGLU chain in one Pallas kernel
    int8_act_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x, ln=None, proj_out=None):
        assert proj_out is None or ln is not None, \
            "proj_out absorption needs the fused-norms (ln) path"
        if ln is not None:
            # fused-norms path: the pre-FF LayerNorm, proj_out bias and
            # residual add ride inside the GEGLU kernel — returns the
            # NEW residual stream x + FF(LN(x)).
            m2 = self.dim * self.mult * 2
            k1, b1 = _DenseParams(m2, self.dim, use_bias=True,
                                  name="proj_in")()
            k2, b2 = _DenseParams(self.dim, m2 // 2, use_bias=True,
                                  name="proj_out")()
            from ..ops.pallas.geglu import (
                fused_geglu_ln_s8, _xla_geglu_ln_s8)
            if isinstance(k1, dict) and isinstance(k2, dict):
                # per-site calibrated scales when present (apply_act_
                # scales): proj_in x_scale = LN3-output range, proj_out
                # x_scale = gated-interior range (static — kills the
                # in-kernel amax pass)
                pack = None
                if "t_s1" in k1:
                    # prepacked tiles (pack_inference_tiles): the
                    # in-wrapper tile builds dead-code eliminate
                    pack = {"s1t": k1["t_s1"], "sc": k1["t_sc"],
                            "s2t": k2["t_s2"], "g": k2["t_g"]}
                return fused_geglu_ln_s8(
                    x, ln[0], ln[1], k1["q"], k1["scale"], b1,
                    k2["q"], k2["scale"], b2,
                    act_scale=k1.get("x_scale",
                                     self.int8_act_scale or 0.05),
                    g_scale=k2.get("x_scale"), pack=pack,
                    proj_out=proj_out)
            # raw kernels (tests / non-prequantized trees): same math
            # via the XLA fallback with in-graph weight quantization
            # (per-out-channel, the QuantDense convention)
            def _qd(w):
                ws = jnp.maximum(
                    jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0),
                    1e-8) / 127.0
                return (jnp.round(w.astype(jnp.float32) / ws)
                        .astype(jnp.int8), ws)
            q1, s1 = _qd(k1)
            q2, s2 = _qd(k2)
            r = _xla_geglu_ln_s8(
                x, ln[0], ln[1], q1, q2,
                jnp.stack([s1, b1.astype(jnp.float32)]), s2[None], b2,
                self.int8_act_scale or 0.05, 1e-6)
            if proj_out is not None:
                r = (jnp.einsum("btc,co->bto", r.astype(jnp.float32),
                                proj_out[0].astype(jnp.float32))
                     + proj_out[1].astype(jnp.float32)).astype(x.dtype)
            return r
        if self.int8 and self.fused and x.ndim == 3:
            # fused s8 GEGLU (ops/pallas/geglu.py): one VMEM pass for
            # quantize -> W1 -> gate -> quantize -> W2, killing the
            # [B, T, 2M] bf16 intermediate round-trips the trace shows as
            # the standalone clamp_convert passes. Needs prequantized
            # {"q","scale"} kernels (prequantize_conv_tree quantize_ff);
            # unquantized trees fall through to the QuantDense path.
            m2 = self.dim * self.mult * 2
            k1, b1 = _DenseParams(m2, self.dim, use_bias=True,
                                  name="proj_in")()
            k2, b2 = _DenseParams(self.dim, m2 // 2, use_bias=True,
                                  name="proj_out")()
            if isinstance(k1, dict) and isinstance(k2, dict):
                from ..ops.pallas.geglu import fused_geglu_s8
                y = fused_geglu_s8(
                    x, k1["q"], k1["scale"], b1, k2["q"], k2["scale"],
                    act_scale=k1.get("x_scale",
                                     self.int8_act_scale or 0.05),
                    g_scale=k2.get("x_scale"))
                return y + b2.astype(y.dtype)
            # fall through: rebuild the QuantDense math on raw kernels
            from ..ops.quant import int8_dot
            h = int8_dot(x, k1, self.int8_act_scale) + b1.astype(x.dtype)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=False)
            return int8_dot(h, k2, self.int8_act_scale) + b2.astype(x.dtype)
        if self.int8:
            from ..ops.quant import QuantDense
            Dense = functools.partial(QuantDense,
                                      act_scale=self.int8_act_scale)
        else:
            Dense = nn.Dense
        h = Dense(self.dim * self.mult * 2, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        if not self.int8:
            # expose the gated interior's range for int8 calibration
            # (calibrate_act_scale_tree runs the bf16 model with
            # capture_intermediates; a no-op when not mutable)
            self.sow("intermediates", "geglu_inner_amax",
                     jnp.max(jnp.abs(h.astype(jnp.float32))))
        return Dense(self.dim, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    context_dim: int
    use_cross_attention: bool = True
    use_fused_attention: bool = False
    int8_attention: bool = False
    packed_attention: bool = False
    absorbed_attention: bool = False
    padded_attention: bool = False
    int8_ff: bool = False
    fused_ff: bool = False
    fused_norms: bool = False
    int8_act_scale: Optional[float] = None
    int8_attn_act_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x, context=None, proj_in=None, proj_out=None):
        # fused-norms (inference): the pre-attention/pre-FF LayerNorms,
        # out-proj biases and residual adds ride INSIDE the two s8
        # Pallas kernels, so the whole self-attn block is two custom
        # calls with zero standalone [B,T,C] elementwise passes. Param
        # tree is unchanged (_LNParams mirrors nn.LayerNorm).
        # proj_in/proj_out (fused-projs): the Transformer2D 1x1 proj
        # convs absorbed as bf16 prologue/epilogue matmuls of the same
        # two kernels — x then arrives as the GN output and the return
        # value is the proj_out output (caller adds the outer residual).
        fuse_attn = (self.fused_norms and self.padded_attention)
        fuse_ff = (self.fused_norms and self.int8_ff and self.fused_ff)
        if proj_in is not None or proj_out is not None:
            assert fuse_attn and fuse_ff and not self.use_cross_attention
        attn1 = CrossAttention(self.dim, self.heads,
                               use_fused=self.use_fused_attention,
                               int8=self.int8_attention,
                               packed=self.packed_attention,
                               absorbed=self.absorbed_attention,
                               padded=self.padded_attention,
                               int8_act_scale=self.int8_attn_act_scale,
                               name="attn1")
        if fuse_attn:
            x = attn1(x, ln=_LNParams(self.dim, name="norm1")(),
                      proj_in=proj_in)
        else:
            h = nn.LayerNorm(name="norm1")(x)
            x = x + attn1(h)
        if self.use_cross_attention:
            h = nn.LayerNorm(name="norm2")(x)
            x = x + CrossAttention(self.dim, self.heads,
                                   context_dim=self.context_dim,
                                   name="attn2")(h, context)
        # int8_act_scale=None keeps dynamic FF scales (more accurate,
        # rel 3.6% vs 5.3%/fwd); a static scale buys ~1 ms/fwd at b16
        ff = FeedForward(self.dim, int8=self.int8_ff,
                         fused=self.fused_ff,
                         int8_act_scale=self.int8_act_scale
                         if self.int8_ff else None,
                         name="ff")
        if fuse_ff:
            x = ff(x, ln=_LNParams(self.dim, name="norm3")(),
                   proj_out=proj_out)
        else:
            h = nn.LayerNorm(name="norm3")(x)
            x = x + ff(h)
        return x


class Transformer2D(nn.Module):
    """GN -> 1x1 conv in -> transformer block(s) -> 1x1 conv out + res."""

    channels: int
    heads: int
    context_dim: int
    depth: int = 1
    groups: int = 32
    use_cross_attention: bool = True
    use_fused_attention: bool = False
    int8_attention: bool = False
    packed_attention: bool = False
    absorbed_attention: bool = False
    padded_attention: bool = False
    int8_ff: bool = False
    fused_ff: bool = False
    fused_norms: bool = False
    fused_projs: bool = False
    int8_act_scale: Optional[float] = None
    int8_attn_act_scale: Optional[float] = None

    @nn.compact
    def __call__(self, x, context=None):
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         name="norm")(x)
        block = functools.partial(
            BasicTransformerBlock,
            self.channels, self.heads, self.context_dim,
            use_cross_attention=self.use_cross_attention,
            use_fused_attention=self.use_fused_attention,
            int8_attention=self.int8_attention,
            packed_attention=self.packed_attention,
            absorbed_attention=self.absorbed_attention,
            padded_attention=self.padded_attention,
            int8_ff=self.int8_ff,
            fused_ff=self.fused_ff,
            fused_norms=self.fused_norms,
            int8_act_scale=self.int8_act_scale,
            int8_attn_act_scale=self.int8_attn_act_scale)
        if (self.fused_projs and self.fused_norms and self.depth == 1
                and not self.use_cross_attention):
            # fused-projs (inference): the 1x1 proj convs become bf16
            # prologue/epilogue matmuls INSIDE the two block kernels —
            # outside them they run at ~20% MFU on the custom-call-
            # forced {1,2,0} layout (BENCH_NOTES r4). Same param tree
            # (_ConvParams mirrors the 1x1 nn.Conv).
            pi = _ConvParams(self.channels, c, name="proj_in")()
            po = _ConvParams(self.channels, self.channels,
                             name="proj_out")()
            y = y.reshape(b, h * w, c)
            y = block(name="block0")(y, context, proj_in=pi, proj_out=po)
            y = y.reshape(b, h, w, self.channels)
            return y + residual
        # (1x1 proj conv quantization also measured net-negative; bf16)
        Proj = functools.partial(nn.Conv, padding=0)
        y = Proj(self.channels, (1, 1), name="proj_in")(y)
        y = y.reshape(b, h * w, self.channels)
        for i in range(self.depth):
            y = block(name=f"block{i}")(y, context)
        y = y.reshape(b, h, w, self.channels)
        y = Proj(self.channels, (1, 1), name="proj_out")(y)
        return y + residual


class Downsample(nn.Module):
    channels: int
    use_int8: bool = False

    @nn.compact
    def __call__(self, x):
        if self.use_int8:
            # residual-stream input: dynamic per-tensor amax scale
            from ..ops.quant import QuantConv
            return QuantConv(self.channels, (3, 3), strides=(2, 2),
                             padding=1, name="conv")(x)
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       name="conv")(x)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample as broadcast+reshape. ``jax.image.resize``
    lowers to a gather with layout copies (visible as the hottest copy ops
    in the step trace); the broadcast form fuses cleanly."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Upsample(nn.Module):
    channels: int
    use_int8: bool = False

    @nn.compact
    def __call__(self, x, target_hw=None):
        b, h, w, c = x.shape
        if target_hw is not None and target_hw != (h * 2, w * 2):
            # odd skip sizes: resize to the exact skip resolution (the
            # reference's forward_upsample_size path, unet.py:297-299,
            # :409-410)
            x = jax.image.resize(
                x, (b, target_hw[0], target_hw[1], c), "nearest")
        else:
            x = nearest_upsample_2x(x)
        if self.use_int8:
            from ..ops.quant import QuantConv
            return QuantConv(self.channels, (3, 3), padding=1,
                             name="conv")(x)
        return nn.Conv(self.channels, (3, 3), padding=1, name="conv")(x)


class DownBlock(nn.Module):
    out_channels: int
    num_layers: int
    has_attn: bool
    heads: int
    context_dim: int
    groups: int
    eps: float
    add_downsample: bool
    use_cross_attention: bool
    use_pallas_gn: bool = False
    use_fused_attention: bool = False
    int8_attention: bool = False
    packed_attention: bool = False
    absorbed_attention: bool = False
    padded_attention: bool = False
    int8_ff: bool = False
    fused_ff: bool = False
    fused_norms: bool = False
    fused_projs: bool = False
    use_int8: bool = False
    int8_act_scale: Optional[float] = None
    int8_attn_act_scale: Optional[float] = None
    int8_fuse_gn: bool = False

    @nn.compact
    def __call__(self, x, temb, context=None):
        res_outputs = []
        for i in range(self.num_layers):
            x = ResnetBlock(self.out_channels, groups=self.groups,
                            eps=self.eps,
                            use_pallas_gn=self.use_pallas_gn,
                            use_int8=self.use_int8,
                            int8_act_scale=self.int8_act_scale,
                            int8_fuse_gn=self.int8_fuse_gn,
                            name=f"resnet{i}")(x, temb)
            if self.has_attn:
                x = Transformer2D(self.out_channels, self.heads,
                                  self.context_dim, groups=self.groups,
                                  use_cross_attention=self.use_cross_attention,
                                  use_fused_attention=self.use_fused_attention,
                                  int8_attention=self.int8_attention,
                                  packed_attention=self.packed_attention,
                                  absorbed_attention=self.absorbed_attention,
                padded_attention=self.padded_attention,
                                  int8_ff=self.int8_ff,
                                  fused_ff=self.fused_ff,
                fused_norms=self.fused_norms,
                fused_projs=self.fused_projs,
                                  int8_act_scale=self.int8_act_scale,
                                  int8_attn_act_scale=self.int8_attn_act_scale,
                                  name=f"attn{i}")(x, context)
            res_outputs.append(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, use_int8=self.use_int8,
                           name="downsample")(x)
            res_outputs.append(x)
        return x, res_outputs


class UpBlock(nn.Module):
    out_channels: int
    num_layers: int
    has_attn: bool
    heads: int
    context_dim: int
    groups: int
    eps: float
    add_upsample: bool
    use_cross_attention: bool
    use_pallas_gn: bool = False
    use_fused_attention: bool = False
    int8_attention: bool = False
    packed_attention: bool = False
    absorbed_attention: bool = False
    padded_attention: bool = False
    int8_ff: bool = False
    fused_ff: bool = False
    fused_norms: bool = False
    fused_projs: bool = False
    use_int8: bool = False
    int8_act_scale: Optional[float] = None
    int8_attn_act_scale: Optional[float] = None
    int8_fuse_gn: bool = False
    # static target resolution for odd skip sizes; a module attribute so
    # nn.remat doesn't trace it (a traced tuple breaks the shape logic)
    upsample_size: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, res_samples, temb, context=None):
        for i in range(self.num_layers):
            res = res_samples.pop()
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock(self.out_channels, groups=self.groups,
                            eps=self.eps,
                            use_pallas_gn=self.use_pallas_gn,
                            use_int8=self.use_int8,
                            int8_act_scale=self.int8_act_scale,
                            int8_fuse_gn=self.int8_fuse_gn,
                            name=f"resnet{i}")(x, temb)
            if self.has_attn:
                x = Transformer2D(self.out_channels, self.heads,
                                  self.context_dim, groups=self.groups,
                                  use_cross_attention=self.use_cross_attention,
                                  use_fused_attention=self.use_fused_attention,
                                  int8_attention=self.int8_attention,
                                  packed_attention=self.packed_attention,
                                  absorbed_attention=self.absorbed_attention,
                padded_attention=self.padded_attention,
                                  int8_ff=self.int8_ff,
                                  fused_ff=self.fused_ff,
                fused_norms=self.fused_norms,
                fused_projs=self.fused_projs,
                                  int8_act_scale=self.int8_act_scale,
                                  int8_attn_act_scale=self.int8_attn_act_scale,
                                  name=f"attn{i}")(x, context)
        if self.add_upsample:
            x = Upsample(self.out_channels, use_int8=self.use_int8,
                         name="upsample")(
                x, target_hw=self.upsample_size)
        return x


class MidBlockCrossAttn(nn.Module):
    channels: int
    heads: int
    context_dim: int
    groups: int
    eps: float
    use_cross_attention: bool
    use_pallas_gn: bool = False
    use_fused_attention: bool = False
    int8_attention: bool = False
    packed_attention: bool = False
    absorbed_attention: bool = False
    padded_attention: bool = False
    int8_ff: bool = False
    fused_ff: bool = False
    fused_norms: bool = False
    fused_projs: bool = False
    use_int8: bool = False
    int8_act_scale: Optional[float] = None
    int8_attn_act_scale: Optional[float] = None
    int8_fuse_gn: bool = False

    @nn.compact
    def __call__(self, x, temb, context=None):
        x = ResnetBlock(self.channels, groups=self.groups, eps=self.eps,
                        use_pallas_gn=self.use_pallas_gn,
                        use_int8=self.use_int8,
                        int8_act_scale=self.int8_act_scale,
                        int8_fuse_gn=self.int8_fuse_gn,
                        name="resnet0")(x, temb)
        x = Transformer2D(self.channels, self.heads, self.context_dim,
                          groups=self.groups,
                          use_cross_attention=self.use_cross_attention,
                          use_fused_attention=self.use_fused_attention,
                          int8_attention=self.int8_attention,
                          packed_attention=self.packed_attention,
                          absorbed_attention=self.absorbed_attention,
                padded_attention=self.padded_attention,
                          int8_ff=self.int8_ff,
                          fused_ff=self.fused_ff,
                fused_norms=self.fused_norms,
                fused_projs=self.fused_projs,
                          int8_act_scale=self.int8_act_scale,
                          int8_attn_act_scale=self.int8_attn_act_scale,
                          name="attn")(x, context)
        x = ResnetBlock(self.channels, groups=self.groups, eps=self.eps,
                        use_pallas_gn=self.use_pallas_gn,
                        use_int8=self.use_int8,
                        int8_act_scale=self.int8_act_scale,
                        int8_fuse_gn=self.int8_fuse_gn,
                        name="resnet1")(x, temb)
        return x


class UpscalerHead(nn.Module):
    """define_upscaler head (unet.py:65-81): conv -> convT x2 -> LN2d ->
    silu -> conv -> GN -> silu -> conv(num_classes)."""

    num_classes: int
    dim: int = 256
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        from .layers import LayerNorm2d
        h = nn.Conv(self.dim, (3, 3), padding=1, name="conv1")(x)
        from .layers import ConvTranspose2x
        h = ConvTranspose2x(self.dim, name="convt")(h)
        h = LayerNorm2d(name="ln")(h)
        h = nn.silu(h)
        h = nn.Conv(self.dim, (3, 3), padding=1, name="conv2")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(h)
        h = nn.silu(h)
        return nn.Conv(self.num_classes, (3, 3), padding=1, name="conv3")(h)


class UNet2DCondition(nn.Module):
    """The denoiser. ``sample`` is ``[B, H, W, C_in(+cond)]``; timesteps
    ``[B]`` or scalar; context ``[B, T, cross_attention_dim]`` or None."""

    config: UNetConfig = UNetConfig()

    def _temb(self, mlp, timesteps, batch, dtype):
        cfg = self.config
        t = jnp.asarray(timesteps)
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (batch,))
        emb = timestep_embedding(t, cfg.block_out_channels[0],
                                 flip_sin_to_cos=cfg.flip_sin_to_cos,
                                 downscale_freq_shift=cfg.freq_shift)
        # sin/cos + MLP in f32 for precision, then drop to the activation
        # dtype: without this cast the f32 temb promotes every resnet (and
        # everything downstream) to f32 — 2x HBM traffic, lower MXU rate
        return mlp(emb).astype(dtype)

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        timesteps_img: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        b = sample.shape[0]
        heads = cfg.attention_head_dim
        ctx_dim = cfg.cross_attention_dim

        # 1. time embeddings (forward :301-316); the image branch uses its
        # own timestep (0 by default) through the SAME shared MLP
        # (reference self.time_embedding serves both branches).
        temb_mlp = TimestepEmbedding(cfg.block_out_channels[0] * 4,
                                     name="time_embedding")
        emb = self._temb(temb_mlp, timesteps, b, sample.dtype)
        if cfg.separate_encoder:
            t_img = timesteps_img if timesteps_img is not None else \
                jnp.zeros((), jnp.int32)
            emb_img = self._temb(temb_mlp, t_img, b, sample.dtype)

        # 2. conditioning pre-process (forward :319-323)
        context = encoder_hidden_states
        if cfg.encoder_hid_dim > 0 and context is not None:
            context = nn.Dense(ctx_dim, name="encoder_hid_proj")(context)
        if cfg.num_object_queries > 0:
            oq = self.param("object_queries", nn.initializers.normal(1.0),
                            (cfg.num_object_queries, ctx_dim))
            context = jnp.broadcast_to(oq[None], (b,) + oq.shape)

        # input dropout (unet.py:26-36, :325-326)
        if cfg.dropout > 0 and not deterministic:
            if cfg.dropout_mode == "standard":
                sample = nn.Dropout(cfg.dropout, deterministic=False)(sample)
            else:  # gaussian (unet.py:478-491)
                p = cfg.dropout / (1.0 - cfg.dropout)
                std = (p / (1.0 - p)) ** 0.5
                eps = 1.0 + std * jax.random.normal(
                    self.make_rng("dropout"), sample.shape, sample.dtype)
                sample = sample * eps

        # 3a. input convolution(s) + optional separate image branch
        c0 = cfg.block_out_channels[0]
        down_extra = None
        if cfg.separate_encoder:
            # seg/img split (:330), image gets its own conv + down path
            sample_seg, sample_img = jnp.split(sample, 2, axis=-1)
            x_img = nn.Conv(c0, (3, 3), padding=1, name="conv_in_img")(
                sample_img)
            down_extra = [x_img]
            ch = c0
            for i, cout in enumerate(cfg.block_out_channels):
                x_img, res = DownBlock(
                    cout, cfg.layers_per_block,
                    has_attn=cfg.attn_down[i], heads=heads,
                    context_dim=ctx_dim, groups=cfg.norm_num_groups,
                    eps=cfg.norm_eps,
                    add_downsample=i < len(cfg.block_out_channels) - 1,
                    use_cross_attention=cfg.use_cross_attention,
                    use_pallas_gn=cfg.use_pallas_gn,
                    use_int8=cfg.use_int8_conv,
                    int8_act_scale=cfg.int8_act_scale,
                    int8_fuse_gn=cfg.int8_fuse_gn,
                    use_fused_attention=cfg.use_fused_attention,
                    int8_attention=cfg.use_int8_attention,
                    packed_attention=cfg.use_packed_attention,
                    absorbed_attention=cfg.use_absorbed_attention,
                padded_attention=cfg.use_padded_attention,
                    int8_ff=cfg.use_int8_ff,
                    fused_ff=cfg.use_fused_ff,
                fused_norms=cfg.use_fused_norms,
                fused_projs=cfg.use_fused_projs,
                    int8_attn_act_scale=cfg.int8_attn_act_scale,
                    name=f"down_blocks_img{i}")(x_img, emb_img, context)
                if cfg.add_adaptor:
                    res = [nn.Conv(r.shape[-1], (3, 3), padding=1,
                                   kernel_init=nn.initializers.zeros,
                                   bias_init=nn.initializers.zeros,
                                   name=f"adaptor{i}_{j}")(r)
                           for j, r in enumerate(res)]
                down_extra.extend(res)
                ch = cout
            x = nn.Conv(c0, (3, 3), padding=1, name="conv_in")(sample_seg)
        elif cfg.separate_conv:
            # summed separate convs (:352-355)
            sample_seg, sample_img = jnp.split(sample, 2, axis=-1)
            x = nn.Conv(c0, (3, 3), padding=1, name="conv_in_seg")(sample_seg) \
                + nn.Conv(c0, (3, 3), padding=1, name="conv_in")(sample_img)
        else:
            x = nn.Conv(c0, (3, 3), padding=1, name="conv_in")(sample)

        # 3b. down blocks (:359-373); optional remat trades FLOPs for
        # activation memory (diffusers enable_gradient_checkpointing
        # equivalent, main_ldm.py:150-152)
        remat_kw = {}
        if cfg.remat_policy:
            remat_kw["policy"] = getattr(jax.checkpoint_policies,
                                         cfg.remat_policy)
        DB = nn.remat(DownBlock, static_argnums=(), **remat_kw) \
            if cfg.gradient_checkpointing else DownBlock
        res_stack = [x]
        for i, cout in enumerate(cfg.block_out_channels):
            x, res = DB(
                cout, cfg.layers_per_block, has_attn=cfg.attn_down[i],
                heads=heads, context_dim=ctx_dim,
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                add_downsample=i < len(cfg.block_out_channels) - 1,
                use_cross_attention=cfg.use_cross_attention,
                use_pallas_gn=cfg.use_pallas_gn,
                use_int8=cfg.use_int8_conv,
                int8_act_scale=cfg.int8_act_scale,
                int8_fuse_gn=cfg.int8_fuse_gn,
                use_fused_attention=cfg.use_fused_attention,
                int8_attention=cfg.use_int8_attention,
                packed_attention=cfg.use_packed_attention,
                absorbed_attention=cfg.use_absorbed_attention,
                padded_attention=cfg.use_padded_attention,
                int8_ff=cfg.use_int8_ff,
                fused_ff=cfg.use_fused_ff,
                fused_norms=cfg.use_fused_norms,
                fused_projs=cfg.use_fused_projs,
                int8_attn_act_scale=cfg.int8_attn_act_scale,
                name=f"down_blocks{i}")(x, emb, context)
            res_stack.extend(res)

        # 4. add image-branch residuals (:375-385)
        if down_extra is not None:
            res_stack = [r + e for r, e in zip(res_stack, down_extra)]

        # 5. mid (:387-395)
        x = MidBlockCrossAttn(
            cfg.block_out_channels[-1], heads, ctx_dim,
            groups=cfg.norm_num_groups, eps=cfg.norm_eps,
            use_cross_attention=cfg.use_cross_attention,
            use_pallas_gn=cfg.use_pallas_gn,
            use_int8=cfg.use_int8_conv,
            int8_act_scale=cfg.int8_act_scale,
            int8_fuse_gn=cfg.int8_fuse_gn,
            use_fused_attention=cfg.use_fused_attention,
            int8_attention=cfg.use_int8_attention,
            packed_attention=cfg.use_packed_attention,
            absorbed_attention=cfg.use_absorbed_attention,
                padded_attention=cfg.use_padded_attention,
            int8_ff=cfg.use_int8_ff,
            fused_ff=cfg.use_fused_ff,
                fused_norms=cfg.use_fused_norms,
                fused_projs=cfg.use_fused_projs,
            int8_attn_act_scale=cfg.int8_attn_act_scale,
            name="mid_block")(x, emb, context)

        # 6. up blocks (:400-425)
        rev = list(reversed(cfg.block_out_channels))
        attn_up = tuple(reversed(cfg.attn_down))
        UB = nn.remat(UpBlock, **remat_kw) \
            if cfg.gradient_checkpointing else UpBlock
        for i, cout in enumerate(rev):
            n_res = cfg.layers_per_block + 1
            res_samples = res_stack[-n_res:]
            res_stack = res_stack[:-n_res]
            # exact skip resolution for odd sizes (forward_upsample_size)
            upsample_size = (res_stack[-1].shape[1:3] if res_stack
                             else None)
            x = UB(
                cout, n_res, has_attn=attn_up[i], heads=heads,
                context_dim=ctx_dim, groups=cfg.norm_num_groups,
                eps=cfg.norm_eps,
                add_upsample=i < len(rev) - 1,
                use_cross_attention=cfg.use_cross_attention,
                use_pallas_gn=cfg.use_pallas_gn,
                use_int8=cfg.use_int8_conv,
                int8_act_scale=cfg.int8_act_scale,
                int8_fuse_gn=cfg.int8_fuse_gn,
                use_fused_attention=cfg.use_fused_attention,
                int8_attention=cfg.use_int8_attention,
                packed_attention=cfg.use_packed_attention,
                absorbed_attention=cfg.use_absorbed_attention,
                padded_attention=cfg.use_padded_attention,
                int8_ff=cfg.use_int8_ff,
                fused_ff=cfg.use_fused_ff,
                fused_norms=cfg.use_fused_norms,
                fused_projs=cfg.use_fused_projs,
                int8_attn_act_scale=cfg.int8_attn_act_scale,
                upsample_size=upsample_size,
                name=f"up_blocks{i}")(x, res_samples, emb, context)

        # 7. out head (:427-431)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        if cfg.upscaler_classes > 0:
            return UpscalerHead(cfg.upscaler_classes, cfg.upscaler_dim,
                                cfg.norm_num_groups, name="upscaler")(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1,
                       name="conv_out")(x)


# ---------------------------------------------------------------------------
# Param-tree surgery (replaces the reference's runtime module mutation)
# ---------------------------------------------------------------------------

def _expand_slice(base: np.ndarray, mode: str, rng: np.random.RandomState,
                  fan_in: int) -> np.ndarray:
    """One 4-channel slice of the expanded conv_in kernel.

    base: ``[3, 3, 4, 320]`` flax kernel of the pretrained conv_in.
    Modes per unet.py:185-210: copy / div (NOTE: the reference's
    ``.copy_(w) / 2.`` divides the *return value*, not the stored weight —
    an upstream bug; we implement the intended divide-by-2) / mean / zero /
    random.
    """
    if mode == "copy":
        return base.copy()
    if mode == "div":
        return base / 2.0
    if mode == "mean":
        return np.repeat(base.mean(axis=2, keepdims=True), base.shape[2],
                         axis=2)
    if mode == "zero":
        return np.zeros_like(base)
    if mode == "random":
        # kaiming-uniform bound like a fresh torch Conv2d
        bound = 1.0 / np.sqrt(fan_in)
        return rng.uniform(-bound, bound, size=base.shape).astype(base.dtype)
    raise NotImplementedError(f"init mode {mode!r}")


def expand_conv_in(
    params: dict,
    init_mode_seg: str = "copy",
    init_mode_image: str = "zero",
    cond_channels: int = 0,
    init_mode_cond: str = "zero",
    seed: int = 0,
) -> dict:
    """Expand a pretrained 4-ch ``conv_in`` kernel to ``8 + cond`` channels
    (reference ``modify_encoder``, unet.py:178-233) as a pure param-tree
    transform. The bias is kept (:213)."""
    import copy as _copy
    params = _copy.deepcopy(params)
    tree = params["params"] if "params" in params else params
    conv = tree["conv_in"]
    kernel = np.asarray(conv["kernel"])  # [3, 3, 4, 320]
    assert kernel.shape[2] == 4, "conv_in must start from the SD 4-ch kernel"
    rng = np.random.RandomState(seed)
    fan_in = (8 + cond_channels) * kernel.shape[0] * kernel.shape[1]
    parts = [
        _expand_slice(kernel, init_mode_seg, rng, fan_in),
        _expand_slice(kernel, init_mode_image, rng, fan_in),
    ]
    if cond_channels > 0:
        cond = _expand_slice(kernel, init_mode_cond, rng, fan_in)
        # reference only ever uses 4-ch conditioning; tile/trim otherwise
        reps = -(-cond_channels // 4)
        cond = np.tile(cond, (1, 1, reps, 1))[:, :, :cond_channels]
        parts.append(cond)
    new_kernel = np.concatenate(parts, axis=2)
    conv["kernel"] = jnp.asarray(new_kernel)
    return params


def freeze_filter(layers: Tuple[str, ...] = ("norm", "time_embedding")):
    """Path predicate for optax masking, mirroring ``freeze_layers``
    (unet.py:235-279): returns True for paths whose updates must be ZEROED.
    """
    from ..train.optim import is_norm_param, _path_str

    def fn(path) -> bool:
        s = _path_str(path)
        for layer in layers:
            if layer == "norm" and is_norm_param(path):
                return True
            if layer == "time_embedding" and "time_embedding" in s:
                return True
            if layer == "conv_in" and ("conv_in_img" in s):
                return True
            if layer == "down_blocks" and "down_blocks_img" in s:
                return True
        return False

    return fn
