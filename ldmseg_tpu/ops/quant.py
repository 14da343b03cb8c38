"""Int8 quantized convolution for the inference path.

v5e-class TPUs run s8 x s8 -> s32 convolutions at ~2x the bf16 MXU rate
(measured 1.5-5x at the UNet's shapes). The weight side is quantized
per-output-channel; activations are quantized per-tensor with a dynamic
scale. Both quantize steps live INSIDE the jitted graph:

  * the weight quantization is loop-invariant, so XLA hoists it out of
    the 50-step sampling ``lax.scan`` — it costs one pass at scan entry,
    and the loop body reads int8 weights (also halving weight HBM
    traffic per step);
  * the activation quantization is a cheap VPU pass that fuses with the
    preceding GroupNorm+SiLU.

No reference counterpart (the reference is fp16 AMP on cuDNN,
trainers_ldm_cond.py:106); this is a TPU-native inference optimization,
opt-in via ``UNetConfig.use_int8_conv``. Training always uses bf16 —
the custom_vjp backward differentiates the unquantized conv (straight-
through estimator), so the flag is safe under ``jax.grad`` too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn


def _dn(lhs_shape, rhs_shape):
    return jax.lax.conv_dimension_numbers(
        lhs_shape, rhs_shape, ("NHWC", "HWIO", "NHWC"))


def _s8_conv(x_q, w_q, strides, padding):
    """s8 NHWC conv -> s32, with an XLA emitter workaround.

    Cin ≡ 64 (mod 128) — the 960-channel up-path skip concats
    (640 hidden + 320 skip) — draws a slow conv emitter
    (EmitOutputBatchInSublanes, ~150-250 TOPS vs 320-395 for the
    aligned siblings; BENCH_NOTES r4). Splitting the channel
    contraction at the 128-aligned boundary into two convs (summed —
    exact by linearity; the lane-aligned slices fuse as views) restores
    the fast emitter: 0.726 -> 0.475 ms at [16,32,64,960]x[3,3,960,320]
    on v5e. THE single s8 conv entry point — every int8 conv path
    routes here."""
    cin = x_q.shape[-1]
    conv = functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=strides, padding=padding,
        dimension_numbers=_dn(x_q.shape, w_q.shape),
        preferred_element_type=jnp.int32)
    if cin % 128 == 64 and cin > 320:
        c0 = cin - 320
        return (conv(x_q[..., :c0], w_q[:, :, :c0]) +
                conv(x_q[..., c0:], w_q[:, :, c0:]))
    return conv(x_q, w_q)


def _int8_conv_impl(x, w, strides, padding, act_scale=None):
    """s8 x s8 -> s32 conv with per-tensor activation scale (dynamic
    amax, or static when ``act_scale`` is given — a static scale lets the
    round/clip fuse into the producing elementwise pass instead of
    costing an extra amax sweep over the activation) and per-output-
    channel weight scale; returns x.dtype."""
    w_q, w_scale = quantize_weight(w)
    x_q, x_scale = quantize_activation(x, act_scale)
    y = _s8_conv(x_q, w_q, strides, padding)
    return (y.astype(jnp.float32) * (x_scale * w_scale)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def int8_conv(x, w, strides, padding, act_scale=None):
    return _int8_conv_impl(x, w, strides, padding, act_scale)


def _float_conv(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), strides, padding,
        dimension_numbers=_dn(x.shape, w.shape))


def _fwd(x, w, strides, padding, act_scale=None):
    return _int8_conv_impl(x, w, strides, padding, act_scale), (x, w)


def _bwd(strides, padding, act_scale, res, g):
    # straight-through: gradients of the float conv (standard QAT recipe)
    x, w = res
    _, vjp = jax.vjp(lambda a, b: _float_conv(a, b, strides, padding), x, w)
    return vjp(g)


int8_conv.defvjp(_fwd, _bwd)


def quantize_weight(w):
    """Per-output-channel symmetric int8 weight quantization (HWIO)."""
    w_absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    w_scale = jnp.maximum(w_absmax, 1e-8) / 127.0
    w_q = jnp.round(w.astype(jnp.float32) / w_scale).astype(jnp.int8)
    return w_q, w_scale


def quantize_activation(x, act_scale=None):
    """Per-tensor symmetric int8 activation quantization: static scale
    when given (round/clip fuses into the producing elementwise pass),
    else dynamic amax. THE single definition of the activation-quant
    policy — int8_conv / prequantized conv / int8_dot all route here so
    the in-graph and prequantized paths stay bit-for-bit identical."""
    x_f = x.astype(jnp.float32)
    if act_scale is None:
        x_scale = jnp.maximum(jnp.max(jnp.abs(x_f)), 1e-8) / 127.0
    else:
        x_scale = jnp.float32(act_scale)
    x_q = jnp.clip(jnp.round(x_f / x_scale), -127, 127).astype(jnp.int8)
    return x_q, x_scale


def int8_conv_prequant(q, s, w, strides, padding, out_dtype=jnp.bfloat16):
    """Conv on a PRE-quantized activation (from the fused GN+SiLU+quant
    Pallas pass, ops/pallas/groupnorm_silu.py): s8 x s8 -> s32 with a
    per-image activation scale ``s [B]``. No gradient (inference path —
    train with the bf16 graph)."""
    w_q, w_scale = quantize_weight(w)
    y = _s8_conv(q, w_q, strides, padding)
    scale = s[:, None, None, None] * w_scale
    return (y.astype(jnp.float32) * scale).astype(out_dtype)


def prequantize_conv_tree(params, quantize_ff: bool = False,
                          absorbed_attention: bool = False,
                          attention_heads: int = 8):
    # quantize_ff covers ALL transformer token matmuls: the GEGLU
    # feed-forward, the attention projections (to_q/k/v/to_out) and
    # the Transformer2D 1x1 proj convs (use_int8_ff/use_int8_attention)
    """Quantize resnet ``conv1``/``conv2`` kernels ONCE, host-side/outside
    the sampling scan.

    In-graph weight quantization is loop-invariant but XLA does NOT hoist
    it out of the 50-step ``lax.scan`` (profiled: 44 round+convert fusions
    = 0.67 ms per UNet forward re-quantizing 815M of weights every step).
    This transform replaces each ``kernel`` leaf of a resnet conv with
    ``{"q": int8, "scale": f32[O]}``; :class:`QuantConv` detects the dict
    and skips the in-graph quantize. The tree shape change is an explicit
    inference-time step — checkpoints keep the bf16 layout.

    ``quantize_ff`` additionally converts the transformer GEGLU
    feed-forward kernels for models built with ``use_int8_ff`` (plain
    ``nn.Dense`` cannot consume dict leaves, so this is opt-in).
    """
    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        is_resnet = all(k in node for k in ("conv1", "conv2", "norm1"))
        # SegVAE decoder (models/seg_vae.py SegDecoder): in_conv/out_conv
        # 3x3 QuantConvs + up{i}_convt pixel-shuffle conv-transposes. The
        # node-shape match is exact to this module, so passing any other
        # tree through is a no-op.
        is_segdec = ("in_conv" in node and "out_conv" in node
                     and any(k.endswith("_convt") for k in node))
        for k, v in node.items():
            if (is_segdec
                    and (k in ("in_conv", "out_conv")
                         or k.endswith("_convt"))
                    and isinstance(v, dict) and "kernel" in v
                    and getattr(v["kernel"], "ndim", 0) == 4):
                q, s = quantize_weight(v["kernel"])
                out[k] = dict(v, kernel={"q": q, "scale": s})
                continue
            if (is_resnet and k in ("conv1", "conv2")
                    and isinstance(v, dict) and "kernel" in v
                    and getattr(v["kernel"], "ndim", 0) == 4):
                q, s = quantize_weight(v["kernel"])
                out[k] = dict(v, kernel={"q": q, "scale": s})
            elif (k in ("downsample", "upsample") and isinstance(v, dict)
                    and isinstance(v.get("conv"), dict)
                    and "kernel" in v["conv"]
                    and getattr(v["conv"]["kernel"], "ndim", 0) == 4):
                # UNet Down/Upsample QuantConv (models/unet.py)
                q, s = quantize_weight(v["conv"]["kernel"])
                out[k] = dict(v, conv=dict(v["conv"],
                                           kernel={"q": q, "scale": s}))
            elif (k == "downsample" and isinstance(v, dict)
                    and "kernel" in v
                    and getattr(v["kernel"], "ndim", 0) == 4):
                # ImageVAE DownEncoderBlock QuantConv (models/image_vae.py)
                q, s = quantize_weight(v["kernel"])
                out[k] = dict(v, kernel={"q": q, "scale": s})
            elif (absorbed_attention and k == "attn1"
                    and isinstance(v, dict)
                    and {"to_q", "to_k", "to_v", "to_out"} <= set(v)
                    and getattr(v["to_q"].get("kernel"), "ndim", 0) == 2):
                # absorbed-attention self-attn: split the [C, C] kernels
                # into per-head s8 slices (models/unet.py CrossAttention
                # ._absorbed consumes {"q", "scale"} dict leaves; the
                # UNet must be built with use_absorbed_attention)
                from ..ops.pallas.attention import quantize_head_weights
                h = attention_heads
                c = v["to_q"]["kernel"].shape[0]
                wq8, wk8, wv8, wo8, scales = quantize_head_weights(
                    v["to_q"]["kernel"], v["to_k"]["kernel"],
                    v["to_v"]["kernel"], v["to_out"]["kernel"], h)
                # store int8 values back in the ORIGINAL [C, C] layout
                # (per-head scales) — flax validates the first sorted
                # leaf of a stored param against the declared kernel
                # shape, and the module re-splits heads on int8 for free
                flat_qkv = lambda w8: jnp.transpose(  # noqa: E731
                    w8, (1, 0, 2)).reshape(c, c)
                out[k] = dict(
                    v,
                    to_q={"kernel": {"q": flat_qkv(wq8),
                                     "scale": scales[:, 0, 0]}},
                    to_k={"kernel": {"q": flat_qkv(wk8),
                                     "scale": scales[:, 0, 1]}},
                    to_v={"kernel": {"q": flat_qkv(wv8),
                                     "scale": scales[:, 0, 2]}},
                    to_out=dict(v["to_out"], kernel={
                        "q": wo8.reshape(c, c),
                        "scale": scales[:, 0, 3]}))
            elif (quantize_ff and k == "ff" and isinstance(v, dict)
                    and set(v) == {"proj_in", "proj_out"}
                    and all(getattr(v[m].get("kernel"), "ndim", 0) == 2
                            for m in ("proj_in", "proj_out"))):
                # transformer GEGLU feed-forward QuantDense (2D kernels)
                new = {}
                for m in ("proj_in", "proj_out"):
                    kern = v[m]["kernel"].astype(jnp.float32)
                    w_absmax = jnp.max(jnp.abs(kern), axis=0)
                    ws = jnp.maximum(w_absmax, 1e-8) / 127.0
                    wq = jnp.round(kern / ws).astype(jnp.int8)
                    new[m] = dict(v[m], kernel={"q": wq, "scale": ws})
                out[k] = new
            else:
                out[k] = walk(v)
        return out

    return walk(params)


def pack_inference_tiles(params, attention_heads: int = 8,
                         int8_act_scale: float = 0.05,
                         int8_attn_act_scale: float = 0.1,
                         attn_scale: float = 0.1,
                         fuse_projs: bool = False):
    """Prebuild the fused-norms kernels' loop-invariant VMEM operands
    into the param tree (run AFTER ``prequantize_conv_tree`` and
    ``apply_act_scales``).

    The padded-LN attention and LN+GEGLU wrappers otherwise rebuild
    their scale tiles, head-padded weights and transposed/dequantized
    value weights inside the jitted UNet apply — and XLA does not hoist
    loop-invariant work out of the 50-step sampling ``lax.scan``, so
    ~1 MB of zero+set copies per transformer site re-runs every step.
    This transform walks fused-norms transformer blocks (nodes holding
    ``attn1``/``norm1``/``norm3``/``ff`` with prequantized dict kernels)
    and stores packed operands as extra ``t_*`` entries inside the
    existing kernel dicts (keys must sort after ``"q"`` — flax validates
    the first sorted leaf of a stored param against the declared kernel
    shape). The modules prefer the packed entries; the in-graph builds
    then dead-code eliminate. Inference-only, like the prequantized tree
    itself; checkpoints keep the bf16 layout.

    ``attention_heads``/``int8_*_scale``/``attn_scale`` must match the
    UNet config the tree will be applied with (same contract as
    ``prequantize_conv_tree``'s ``attention_heads``).

    ``fuse_projs``: the UNet will run with ``use_fused_projs`` — the
    Transformer2D proj_in/proj_out biases are baked into the two
    kernels' ``g`` tiles (row 3), matching the bf16 prologue/epilogue
    matmuls. The packed tree is then WRONG for a ``use_fused_projs=
    False`` model (the biases would be dropped), hence opt-in."""
    import jax.numpy as jnp
    from .pallas.attention import pack_padded_ln_vt_tiles
    from .pallas.geglu import pack_geglu_ln_tiles

    def is_q2d(leaf):
        return (isinstance(leaf, dict) and isinstance(leaf.get("kernel"),
                                                      dict)
                and getattr(leaf["kernel"].get("q"), "ndim", 0) == 2)

    def walk(node, bpi=None, bpo=None):
        if not isinstance(node, dict):
            return node
        is_t2d = (fuse_projs
                  and {"norm", "proj_in", "proj_out", "block0"}
                  <= set(node)
                  and isinstance(node["proj_in"], dict)
                  and getattr(node["proj_in"].get("kernel"),
                              "ndim", 0) == 4)
        if is_t2d:
            # fused-projs Transformer2D: hand the proj conv biases down
            # to block0's tile packs (the conv kernels themselves ride
            # raw — a [1,1,C,C]->[C,C] reshape is free in-graph)
            return {k: walk(v,
                            bpi=node["proj_in"]["bias"] if k == "block0"
                            else None,
                            bpo=node["proj_out"]["bias"] if k == "block0"
                            else None)
                    for k, v in node.items()}
        is_block = ({"attn1", "norm1", "norm3", "ff"} <= set(node)
                    and isinstance(node["attn1"], dict)
                    and isinstance(node["ff"], dict)
                    and all(isinstance(node[n], dict)
                            and "scale" in node[n] and "bias" in node[n]
                            for n in ("norm1", "norm3"))
                    and all(is_q2d(node["attn1"].get(m))
                            for m in ("to_q", "to_k", "to_v", "to_out"))
                    and all(is_q2d(node["ff"].get(m))
                            for m in ("proj_in", "proj_out")))
        if not is_block:
            return {k: walk(v) for k, v in node.items()}
        out = dict(node)
        attn = node["attn1"]
        kq, kk, kv, ko = (attn[m]["kernel"]
                          for m in ("to_q", "to_k", "to_v", "to_out"))
        h = attention_heads
        c = kq["q"].shape[0]
        scales = jnp.zeros((h, 8, 128), jnp.float32)
        for i, leaf in enumerate((kq, kk, kv, ko)):
            scales = scales.at[:, 0, i].set(leaf["scale"])
        xs_attn = kq.get("x_scale", jnp.float32(int8_attn_act_scale))
        apack = pack_padded_ln_vt_tiles(
            kq["q"], kk["q"], kv["q"], ko["q"], scales, h,
            (c // h) ** -0.5, xs_attn,
            node["norm1"]["scale"], node["norm1"]["bias"],
            attn["to_out"]["bias"], attn_scale, proj_in_bias=bpi)
        out["attn1"] = dict(
            attn,
            to_q=dict(attn["to_q"], kernel=dict(kq, t_wqp=apack["wqp"])),
            to_k=dict(attn["to_k"], kernel=dict(kk, t_wkp=apack["wkp"])),
            to_v=dict(attn["to_v"], kernel=dict(kv, t_wvt=apack["wvt"])),
            to_out=dict(attn["to_out"], kernel=dict(
                ko, t_wo=apack["wo"], t_m=apack["m"], t_g=apack["g"],
                t_sc=apack["sc"])))
        ff = node["ff"]
        k1, k2 = ff["proj_in"]["kernel"], ff["proj_out"]["kernel"]
        fpack = pack_geglu_ln_tiles(
            k1["scale"], ff["proj_in"]["bias"], k2["scale"],
            ff["proj_out"]["bias"], node["norm3"]["scale"],
            node["norm3"]["bias"],
            k1.get("x_scale", jnp.float32(int8_act_scale)),
            k2.get("x_scale"), proj_out_bias=bpo)
        out["ff"] = dict(
            ff,
            proj_in=dict(ff["proj_in"], kernel=dict(
                k1, t_s1=fpack["s1t"], t_sc=fpack["sc"])),
            proj_out=dict(ff["proj_out"], kernel=dict(
                k2, t_s2=fpack["s2t"], t_g=fpack["g"])))
        return out

    return walk(params)


def _int8_conv_wq(x, w_q, w_scale, strides, padding, act_scale,
                  out_dtype=None):
    """Conv with PRE-quantized weights; activation quantized in-graph
    (static scale when given, else dynamic amax). Inference-only.
    Matches :func:`int8_conv` bit-for-bit (incl. output dtype = x.dtype)
    so flipping a tree through ``prequantize_conv_tree`` is a no-op
    numerically."""
    out_dtype = x.dtype if out_dtype is None else out_dtype
    x_q, x_scale = quantize_activation(x, act_scale)
    y = _s8_conv(x_q, w_q, strides, padding)
    return (y.astype(jnp.float32) * (x_scale * w_scale)).astype(out_dtype)


def _int8_dot_impl(x, kernel, act_scale=None):
    w_absmax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=0)
    w_scale = jnp.maximum(w_absmax, 1e-8) / 127.0
    w_q = jnp.round(kernel.astype(jnp.float32) / w_scale).astype(jnp.int8)
    x_q, x_scale = quantize_activation(x, act_scale)
    y = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (x_scale * w_scale)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def int8_dot(x, kernel, act_scale=None):
    """s8 x s8 -> s32 matmul with a straight-through-estimator backward
    (gradients of the float matmul), so ``use_int8_ff`` is differentiable
    like :func:`int8_conv` rather than silently producing zero grads if a
    training config ever enables it."""
    return _int8_dot_impl(x, kernel, act_scale)


def _dot_fwd(x, kernel, act_scale=None):
    return _int8_dot_impl(x, kernel, act_scale), (x, kernel)


def _dot_bwd(act_scale, res, g):
    x, kernel = res
    _, vjp = jax.vjp(
        lambda a, b: jax.lax.dot_general(
            a, b.astype(a.dtype), (((a.ndim - 1,), (0,)), ((), ()))),
        x, kernel)
    return vjp(g)


int8_dot.defvjp(_dot_fwd, _dot_bwd)


class QuantDense(nn.Module):
    """Drop-in for ``nn.Dense`` with the s8 MXU path (dynamic per-tensor
    activation amax, per-output-channel weight scale). Same param layout
    as ``nn.Dense``; supports prequantized ``{"q","scale"}`` kernel
    leaves from :func:`prequantize_conv_tree`. Inference-only (token
    feed-forward matmuls in the UNet transformer blocks)."""

    features: int
    use_bias: bool = True
    act_scale: float | None = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (cin, self.features))
        if isinstance(kernel, dict):
            # pre-quantized by prequantize_conv_tree; inference-only path
            w_q, w_scale = kernel["q"], kernel["scale"]
            x_f = x.astype(jnp.float32)
            site = kernel.get("x_scale", self.act_scale)
            if site is None:
                x_scale = jnp.maximum(jnp.max(jnp.abs(x_f)), 1e-8) / 127.0
            else:
                x_scale = jnp.float32(site)
            x_q = jnp.clip(jnp.round(x_f / x_scale), -127,
                           127).astype(jnp.int8)
            y = jax.lax.dot_general(
                x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * (x_scale * w_scale)).astype(x.dtype)
        else:
            # STE custom_vjp: differentiable like int8_conv, so a train
            # config flipping use_int8_ff gets float grads, not zeros
            y = int8_dot(x, kernel, self.act_scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class QuantConv(nn.Module):
    """Drop-in for ``nn.Conv`` (3x3/1x1, NHWC) with the int8 fast path.
    The parameter tree is IDENTICAL to ``nn.Conv`` (kernel/bias), so the
    flag can be flipped on any loaded checkpoint."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: int | str = 0
    act_scale: float | None = None  # static per-tensor activation scale

    @nn.compact
    def __call__(self, x):
        # x: activation array, or (q int8, s [B]) from the fused
        # GN+SiLU+quant pass
        prequant = isinstance(x, tuple)
        cin = x[0].shape[-1] if prequant else x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = self.padding
        if isinstance(kernel, dict):
            # weights pre-quantized by prequantize_conv_tree (outside the
            # sampling scan); inference-only path. A per-site calibrated
            # "x_scale" entry (ops.quant.apply_act_scales) overrides
            # the global module attribute.
            w_q, w_scale = kernel["q"], kernel["scale"]
            site_scale = kernel.get("x_scale", self.act_scale)
            if prequant:
                q, s = x
                from . import quant as _q
                y = _q._s8_conv(q, w_q, tuple(self.strides), pad)
                scale = s[:, None, None, None] * w_scale
                y = (y.astype(jnp.float32) * scale).astype(jnp.bfloat16)
            else:
                y = _int8_conv_wq(x, w_q, w_scale, tuple(self.strides),
                                  pad, site_scale)
        elif prequant:
            q, s = x
            y = int8_conv_prequant(q, s, kernel, tuple(self.strides), pad)
        else:
            y = int8_conv(x, kernel, tuple(self.strides), pad,
                          self.act_scale)
        return y + bias.astype(y.dtype)


def calibrate_act_scale(apply_fn, params, sample_inputs,
                        percentile: float | None = None):
    """Measure the static ``int8_act_scale`` for a model on real data.

    Runs ``apply_fn(params, *sample_inputs)`` with flax intermediate
    capture and returns ``amax / 127`` over every GroupNorm+SiLU output
    that feeds a quantized conv (module names ``norm1``/``norm2`` — the
    :class:`~ldmseg_tpu.models.layers.GroupNormSiLU` pairs in the resnet
    blocks). Use the result as ``UNetConfig.int8_act_scale`` /
    ``sampling_kwargs.int8_act_scale`` when deploying int8 inference on a
    trained checkpoint instead of trusting the random-init default.

    ``percentile`` (e.g. 99.9) clips calibration outliers — values above
    the returned ``127 * scale`` saturate at inference, which is usually
    preferable to losing precision on the bulk of the distribution.
    """
    import numpy as np

    _, state = apply_fn(params, *sample_inputs,
                        capture_intermediates=True, mutable=["intermediates"])

    vals = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (tuple, list)):
            for v in node:
                walk(v, path)
        else:
            # only resnet GroupNormSiLU outputs feed the quantized convs;
            # BasicTransformerBlock's LayerNorms share the norm1/norm2
            # names (models/unet.py:184,192) but feed attention/FF and
            # span wider ranges — including them biases the conv scale
            in_resnet = any(p.startswith(("resnet", "mid_resnet"))
                            for p in path)
            if in_resnet and any(p in ("norm1", "norm2") for p in path):
                vals.append(np.abs(np.asarray(node, np.float32)).ravel())

    walk(state["intermediates"], ())
    if not vals:
        raise ValueError("no norm1/norm2 intermediates captured — is the "
                         "model built from ResnetBlock (GroupNormSiLU)?")
    flat = np.concatenate(vals)
    amax = (np.percentile(flat, percentile) if percentile is not None
            else flat.max())
    return float(max(amax, 1e-6) / 127.0)


def calibrate_act_scale_tree(apply_fn, params, sample_inputs,
                             percentile: float | None = None) -> dict:
    """Per-SITE static activation scales for the int8 inference path.

    Like :func:`calibrate_act_scale` but returns one scale per quantized
    conv site instead of a single global scalar: a dict mapping the
    module path of each resnet ``conv1``/``conv2`` (tuple of names, e.g.
    ``('down_blocks0', 'resnet0', 'conv1')``) to ``amax/127`` of the
    GroupNormSiLU output that feeds it. Thread the result through
    :func:`apply_act_scales` after :func:`prequantize_conv_tree` so every
    site clips at its own range — the global scalar either saturates hot
    layers or wastes codes on cold ones.
    """
    import numpy as np

    import functools as _ft

    import jax as _jax

    # jit the capture pass: eager flax apply = one dispatch per op, which
    # over the axon relay takes minutes for the SD-sized UNet
    _, state = _jax.jit(_ft.partial(apply_fn,
                                    capture_intermediates=True,
                                    mutable=["intermediates"]))(
        params, *sample_inputs)

    scales: dict = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (tuple, list)):
            for v in node:
                walk(v, path)
        else:
            def record(key, arr, use_percentile=True):
                a = np.abs(np.asarray(arr, np.float32)).ravel()
                amax = (np.percentile(a, percentile)
                        if percentile is not None and use_percentile
                        else a.max())
                scales[key] = max(scales.get(key, 0.0),
                                  float(max(amax, 1e-6) / 127.0))

            in_resnet = any(p.startswith(("resnet", "mid_resnet"))
                            for p in path)
            # transformer blocks (Transformer2D names them block<i>)
            in_tblock = any(p.startswith("block") and p[5:].isdigit()
                            for p in path)
            norm = next((p for p in path if p in ("norm1", "norm2")), None)
            if in_resnet and norm is not None:
                # norm1 feeds conv1, norm2 feeds conv2 (models/layers.py
                # ResnetBlock); key by the conv's module path, dropping
                # the '__call__' capture suffix
                mod_path = tuple(p for p in path
                                 if p not in ("__call__", norm))
                conv = "conv1" if norm == "norm1" else "conv2"
                record(mod_path + (conv,), node)
            elif in_tblock and "norm1" in path:
                # pre-attention LayerNorm output = the padded s8 attention
                # kernel's input; stored on to_q (x is quantized once for
                # all four projections)
                mod_path = tuple(p for p in path
                                 if p not in ("__call__", "norm1"))
                record(mod_path + ("attn1", "to_q"), node)
            elif in_tblock and "norm3" in path:
                # pre-FF LayerNorm output = the fused GEGLU kernel input
                mod_path = tuple(p for p in path
                                 if p not in ("__call__", "norm3"))
                record(mod_path + ("ff", "proj_in"), node)
            elif path and path[-1] == "geglu_inner_amax":
                # sown scalar amax of the gated interior h*gelu(gate)
                # (FeedForward) = proj_out's input range; enables the
                # static interior scale in the fused GEGLU kernel.
                # Already a max — percentile does not apply.
                record(path[:-1] + ("proj_out",), node,
                       use_percentile=False)

    walk(state["intermediates"], ())
    if not scales:
        raise ValueError("no resnet norm1/norm2 intermediates captured")
    return scales


def apply_act_scales(params, scales: dict):
    """Write per-site activation scales into a tree processed by
    :func:`prequantize_conv_tree`: each quantized-conv ``kernel``
    ``{"q", "scale"}`` dict at a path in ``scales`` gains an
    ``"x_scale"`` entry (named to sort after "q" — flax validates the
    first sorted leaf of a stored param against the declared shape), which :class:`QuantConv` prefers over its
    static module attribute."""
    import jax.numpy as jnp

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        if set(node) >= {"q", "scale"}:
            key = tuple(p for p in path[:-1])  # drop the 'kernel' leaf
            if key in scales:
                return dict(node, x_scale=jnp.float32(scales[key]))
            return node
        return {k: walk(v, path + (k,)) for k, v in node.items()}

    # param trees are wrapped as {"params": ...}; scales keys are module
    # paths without that prefix
    def strip_walk(tree):
        if isinstance(tree, dict) and set(tree) <= {"params", "batch_stats"}:
            return {k: walk(v, ()) for k, v in tree.items()}
        return walk(tree, ())

    return strip_walk(params)
