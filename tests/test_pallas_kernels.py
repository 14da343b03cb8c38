"""Pallas kernel tests.

On the CPU test mesh the real Mosaic kernels can't run, so numerics are
covered through ``interpret=True`` pallas execution; the XLA fallback
dispatch paths are tested directly. Full-speed TPU numerics are exercised
by the verify drives / bench.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from ldmseg_tpu.ops.pallas.groupnorm_silu import (
    _reference as gn_reference, group_norm_silu)
from ldmseg_tpu.ops.pallas.attention import (
    _xla_reference as attn_reference, fused_self_attention)


def test_gn_silu_xla_fallback_large_tile():
    # tiles over the VMEM budget dispatch to XLA — same math
    x = jax.random.normal(jax.random.key(0), (1, 64, 64, 64))
    s = jnp.ones((64,))
    b = jnp.zeros((64,))
    out = group_norm_silu(x, s, b, 8, 1e-5, max_vmem_tile_bytes=1024)
    ref = gn_reference(x, s, b, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_gn_reference_matches_flax_groupnorm():
    from flax import linen as nn
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 16))
    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    p = gn.init(jax.random.key(2), x)
    ref = jax.nn.silu(gn.apply(p, x))
    ours = gn_reference(x, p["params"]["scale"], p["params"]["bias"], 4,
                        1e-5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_fallback_long_seq():
    # seq > max_seq falls back to XLA: result must equal the reference
    b, t, h, d = 1, 16, 2, 8
    q = jax.random.normal(jax.random.key(0), (b, t, h, d))
    k = jax.random.normal(jax.random.key(1), (b, t, h, d))
    v = jax.random.normal(jax.random.key(2), (b, t, h, d))
    out = fused_self_attention(q, k, v, d**-0.5, max_seq=8)  # forces fallback
    flat = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, d)  # noqa
    ref = attn_reference(flat(q), flat(k), flat(v), d**-0.5)
    ref = ref.reshape(b, h, t, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_attention_kernel_interpret_mode():
    """Run the actual kernel body through the pallas interpreter."""
    import functools
    from ldmseg_tpu.ops.pallas.attention import _attn_kernel
    bh, t, d, bq = 2, 64, 8, 32
    q = jax.random.normal(jax.random.key(0), (bh, t, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (bh, t, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (bh, t, d), jnp.float32)
    scale = d**-0.5
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(bh, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=True,
    )(q, k, v)
    ref = attn_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_gn_kernel_interpret_mode():
    import functools
    from ldmseg_tpu.ops.pallas.groupnorm_silu import _gn_silu_kernel
    b, h, w, c, g = 2, 8, 8, 16, 4
    x = jax.random.normal(jax.random.key(0), (b, h, w, c), jnp.float32)
    s = jax.random.normal(jax.random.key(1), (c,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(2), (c,)) * 0.1
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=g, eps=1e-5),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=None) if False else
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=True,
    )(x, s, bias)
    ref = gn_reference(x, s, bias, g, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_unet_fused_flags_build():
    """UNet with both Pallas flags on must still init (kernels only fire
    inside jit on TPU; init on CPU uses the dispatch fallbacks or
    interpret-free paths)."""
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    cfg = UNetConfig(in_channels=8, out_channels=4,
                     block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                     cross_attention_dim=16, attention_head_dim=2,
                     norm_num_groups=4, use_cross_attention=False,
                     use_pallas_gn=False, use_fused_attention=False)
    model = UNet2DCondition(config=cfg)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 24, 80, 8)),
                                 jnp.zeros((1,), jnp.int32))
    out = model.apply(params, jnp.zeros((1, 24, 80, 8)), jnp.asarray(0))
    assert out.shape == (1, 24, 80, 4)


def test_gn_silu_conv_interpret_and_fallback():
    """Fused GN+SiLU+conv3x3: interpret-mode kernel numerics + XLA
    fallback dispatch (the kernel measured slower than XLA's conv engine
    on the v5e — see BENCH_NOTES — so it stays opt-in)."""
    import functools
    from jax.experimental.pallas import tpu as pltpu
    from ldmseg_tpu.ops.pallas.gn_silu_conv import (
        _kernel, _reference, gn_silu_conv)

    b, h, w, c, co, g = 2, 8, 16, 16, 8, 4
    ks = jax.random.split(jax.random.key(0), 5)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    scale = jax.random.normal(ks[1], (c,)) * 0.1 + 1.0
    bias = jax.random.normal(ks[2], (c,)) * 0.1
    wk = jax.random.normal(ks[3], (3, 3, c, co)) * 0.1
    bk = jax.random.normal(ks[4], (co,)) * 0.1

    out = pl.pallas_call(
        functools.partial(_kernel, groups=g, eps=1e-5),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((3, 3, c, co), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((co,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, c), x.dtype),
            pltpu.VMEM((h, w + 2, co), jnp.float32),
        ],
        interpret=True,
    )(x, scale, bias, wk, bk)
    ref = _reference(x, scale, bias, wk, bk, g, 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3,
                               atol=1e-3)

    # dispatch falls back to XLA for big tiles
    out2 = gn_silu_conv(x, scale, bias, wk, bk, g, 1e-5,
                        max_vmem_tile_bytes=64)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_attention_kernel_s8_interpret_mode():
    """s8 attention kernel (pre-quantized q/k/v, unnormalized-exp
    probability quantization) stays within quantization error of the
    f32 reference."""
    from ldmseg_tpu.ops.pallas.attention import _attn_kernel_s8
    bh, t, d, bq = 2, 64, 40, 32
    q = jax.random.normal(jax.random.key(0), (bh, t, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (bh, t, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (bh, t, d), jnp.float32)
    scale = d**-0.5
    qs = float(np.abs(q).max()) / 127.0
    ks = float(np.abs(k).max()) / 127.0
    vs = float(np.abs(v).max()) / 127.0
    quant = lambda x, s: jnp.clip(  # noqa: E731
        jnp.round(x / s), -127, 127).astype(jnp.int8)
    sc = jnp.zeros((8, 128), jnp.float32)
    sc = sc.at[0, 0].set(qs * ks * scale).at[0, 1].set(vs / 127.0)
    out = pl.pallas_call(
        _attn_kernel_s8,
        grid=(bh, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.bfloat16),
        interpret=True,
    )(quant(q, qs), quant(k, ks), quant(v, vs), sc)
    ref = attn_reference(q, k, v, scale)
    out = np.asarray(out, np.float32)
    rel = np.abs(out - np.asarray(ref)).mean() / \
        np.abs(np.asarray(ref)).mean()
    assert rel < 0.05, rel
    c = np.corrcoef(out.ravel(), np.asarray(ref).ravel())[0, 1]
    assert c > 0.995, c


def test_int8_conv_accuracy_gate():
    """ops.quant.int8_conv: per-channel weight + per-tensor activation
    quantization within 3% of the float conv; straight-through grads
    match the float conv's."""
    from ldmseg_tpu.ops.quant import int8_conv
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (3, 3, 16, 32)) * 0.1
    pad = [(1, 1), (1, 1)]
    y = int8_conv(x, w, (1, 1), pad)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), pad,
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))
    rel = np.abs(np.asarray(y - ref)).mean() / np.abs(np.asarray(ref)).mean()
    assert rel < 0.03, rel

    g_q = jax.grad(lambda a: jnp.sum(int8_conv(a, w, (1, 1), pad) ** 2))(x)
    g_f = jax.grad(lambda a: jnp.sum(ref_conv(a, w, pad) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(g_f),
                               rtol=0.15, atol=0.3)


def ref_conv(x, w, pad):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad,
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))


def test_packed_attention_kernel_interpret_mode():
    """[B,T,C]-layout kernel: per-head one-hot selection matmuls must
    reproduce the reference multi-head attention exactly."""
    import functools
    from ldmseg_tpu.ops.pallas.attention import _attn_kernel_btc, _xla_btc
    b, t, heads, d = 2, 64, 4, 8
    c = heads * d
    q = jax.random.normal(jax.random.key(0), (b, t, c), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, t, c), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, t, c), jnp.float32)
    scale = d**-0.5
    spec = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_btc, heads=heads, scale=scale),
        grid=(b,), in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=True)(q, k, v)
    ref = _xla_btc(q, k, v, heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_packed_attention_dispatch_and_grad():
    """Public dispatch falls back to XLA off-TPU and under grad; both
    must match the reference and produce finite gradients."""
    from ldmseg_tpu.ops.pallas.attention import (
        fused_self_attention_packed, _xla_btc)
    b, t, heads, d = 1, 16, 2, 8
    c = heads * d
    q = jax.random.normal(jax.random.key(0), (b, t, c), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, t, c), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, t, c), jnp.float32)
    scale = d**-0.5
    out = fused_self_attention_packed(q, k, v, heads, scale)
    ref = _xla_btc(q, k, v, heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
    g = jax.grad(lambda a: fused_self_attention_packed(
        a, k, v, heads, scale).sum())(q)
    assert np.isfinite(np.asarray(g)).all()


def test_unet_packed_attention_builds():
    """UNet with use_packed_attention compiles on CPU (XLA fallback) and
    matches the plain-attention UNet numerically."""
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    base = dict(in_channels=4, block_out_channels=(32, 64),
                layers_per_block=1, attn_down=(True, True),
                attention_head_dim=2, norm_num_groups=8,
                use_cross_attention=False)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    t = jnp.array([3, 7], jnp.int32)
    u0 = UNet2DCondition(config=UNetConfig(**base))
    u1 = UNet2DCondition(config=UNetConfig(**base,
                                           use_packed_attention=True))
    p = u0.init(jax.random.key(0), x, t)
    y0 = u0.apply(p, x, t)
    y1 = u1.apply(p, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-5,
                               atol=2e-5)


def test_absorbed_attention_kernel_interpret_mode():
    """Absorbed-projection kernel (to_q/k/v + attention + to_out in one
    pallas call, per-head accumulation over the grid) must reproduce the
    projection+attention+projection reference exactly."""
    import functools
    from jax.experimental.pallas import tpu as pltpu
    from ldmseg_tpu.ops.pallas.attention import (
        _attn_kernel_absorbed, _xla_absorbed)
    b, t, heads, d = 2, 32, 4, 8
    c = heads * d
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    wq = jnp.asarray(rng.randn(heads, c, d), jnp.float32) * 0.1
    wk = jnp.asarray(rng.randn(heads, c, d), jnp.float32) * 0.1
    wv = jnp.asarray(rng.randn(heads, c, d), jnp.float32) * 0.1
    wo = jnp.asarray(rng.randn(heads, d, c), jnp.float32) * 0.1
    scale = d**-0.5
    xspec = pl.BlockSpec((1, t, c), lambda i, j: (i, 0, 0))
    wspec = pl.BlockSpec((1, c, d), lambda i, j: (j, 0, 0))
    ospec = pl.BlockSpec((1, d, c), lambda i, j: (j, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_absorbed, scale=scale, heads=heads),
        grid=(b, heads),
        in_specs=[xspec, wspec, wspec, wspec, ospec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((t, c), jnp.float32)],
        interpret=True)(x, wq, wk, wv, wo)
    ref = _xla_absorbed(x, wq, wk, wv, wo, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_absorbed_attention_dispatch_and_grad():
    """CPU fallback of the absorbed dispatch matches the flat-path
    reference (proj -> attention -> proj) and differentiates."""
    from ldmseg_tpu.ops.pallas.attention import (
        absorbed_self_attention, _xla_bthd)
    b, t, heads, d = 1, 16, 2, 8
    c = heads * d
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    wq, wk, wv, wo = (jnp.asarray(rng.randn(c, c), jnp.float32) * 0.1
                      for _ in range(4))
    scale = d**-0.5
    hsplit = lambda w: w.reshape(c, heads, d).transpose(1, 0, 2)  # noqa
    out = absorbed_self_attention(x, hsplit(wq), hsplit(wk), hsplit(wv),
                                  wo.reshape(heads, d, c), heads, scale)
    q = (x @ wq).reshape(b, t, heads, d)
    k = (x @ wk).reshape(b, t, heads, d)
    v = (x @ wv).reshape(b, t, heads, d)
    ref = _xla_bthd(q, k, v, scale).reshape(b, t, c) @ wo
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
    g = jax.grad(lambda a: absorbed_self_attention(
        a, hsplit(wq), hsplit(wk), hsplit(wv), wo.reshape(heads, d, c),
        heads, scale).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_unet_absorbed_attention_builds_and_prequantizes():
    """UNet with use_absorbed_attention keeps the Dense param tree (same
    checkpoint layout), matches the plain UNet numerically on CPU, and
    prequantize_conv_tree(absorbed_attention=True) packs the attention
    kernels into per-head s8 dicts."""
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    from ldmseg_tpu.ops.quant import prequantize_conv_tree
    base = dict(in_channels=4, block_out_channels=(32, 64),
                layers_per_block=1, attn_down=(True, True),
                attention_head_dim=2, norm_num_groups=8,
                use_cross_attention=False)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    t = jnp.array([3, 7], jnp.int32)
    u0 = UNet2DCondition(config=UNetConfig(**base))
    u1 = UNet2DCondition(config=UNetConfig(**base,
                                           use_absorbed_attention=True))
    p = u0.init(jax.random.key(0), x, t)
    p1 = u1.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(p) == \
        jax.tree_util.tree_structure(p1)
    y0 = u0.apply(p, x, t)
    y1 = u1.apply(p, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-5,
                               atol=2e-5)

    pq = prequantize_conv_tree(p, absorbed_attention=True,
                               attention_heads=2)
    blk = pq["params"]["down_blocks0"]["attn0"]["block0"]["attn1"]
    for nm in ("to_q", "to_k", "to_v", "to_out"):
        leaf = blk[nm]["kernel"]
        assert set(leaf) == {"q", "scale"}
        # int8 values stay in the original [C, C] layout (flax validates
        # the first sorted leaf's shape); per-head scales ride alongside
        assert leaf["q"].shape == (32, 32) and leaf["q"].dtype == jnp.int8
        assert leaf["scale"].shape == (2,)
    assert "bias" in blk["to_out"]
    # the absorbed UNet consumes the prequantized tree (CPU fallback
    # dequantizes); output stays close to bf16. use_int8_conv so the
    # resnet QuantConvs consume the prequantized conv dicts too.
    ui = UNet2DCondition(config=UNetConfig(**base,
                                           use_absorbed_attention=True,
                                           use_int8_attention=True,
                                           use_int8_conv=True))
    yq = ui.apply(pq, x, t)
    corr = np.corrcoef(np.asarray(y0).ravel(), np.asarray(yq).ravel())[0, 1]
    assert np.isfinite(np.asarray(yq)).all() and corr > 0.99, corr


def test_fused_geglu_kernel_interpret_mode():
    """Fused s8 GEGLU kernel must reproduce the QuantDense-math fallback
    (same quantization semantics) exactly."""
    import functools
    from jax.experimental.pallas import tpu as pltpu
    from ldmseg_tpu.ops.pallas.geglu import (
        _geglu_kernel, _xla_geglu_s8)
    b, t, c, mult = 2, 32, 64, 2
    m2 = c * mult * 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    w1 = jnp.asarray(rng.randn(c, m2), jnp.float32) * 0.1
    w2 = jnp.asarray(rng.randn(m2 // 2, c), jnp.float32) * 0.1
    b1 = jnp.asarray(rng.randn(m2), jnp.float32) * 0.1
    q1 = jnp.round(w1 / (jnp.max(jnp.abs(w1), axis=0) / 127)).astype(
        jnp.int8)
    s1 = jnp.max(jnp.abs(w1), axis=0) / 127
    q2 = jnp.round(w2 / (jnp.max(jnp.abs(w2), axis=0) / 127)).astype(
        jnp.int8)
    s2 = jnp.max(jnp.abs(w2), axis=0) / 127
    act = 0.05
    s1t = jnp.zeros((8, m2), jnp.float32).at[0].set(s1).at[1].set(b1)
    s2t = jnp.zeros((8, c), jnp.float32).at[0].set(s2)
    sct = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(act)
    out = pl.pallas_call(
        _geglu_kernel,
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c, m2), lambda i, j: (0, 0)),
            pl.BlockSpec((m2 // 2, c), lambda i, j: (0, 0)),
            pl.BlockSpec((8, m2), lambda i, j: (0, 0)),
            pl.BlockSpec((8, c), lambda i, j: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        interpret=True)(x, q1, q2, s1t, s2t, sct)
    # NOTE: the kernel's g-quantize amax is per (batch, block) while the
    # fallback's is global — finer scales, slightly different rounding.
    # Gate both against the FLOAT GEGLU instead of each other.
    uf = x @ (q1.astype(jnp.float32) * s1) + b1
    hf, gf = jnp.split(uf, 2, axis=-1)
    ff = hf * (gf * 0.5 * (1 + jax.lax.erf(gf / jnp.sqrt(2.0))))
    ref = np.asarray(ff @ (q2.astype(jnp.float32) * s2), np.float32)
    for got in (np.asarray(out, np.float32),
                np.asarray(_xla_geglu_s8(x, q1, q2, jnp.stack([s1, b1]),
                                         s2[None], act), np.float32)):
        rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert rel < 0.05, rel
        corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
        assert corr > 0.998, corr


def test_unet_fused_ff_matches_quantdense():
    """use_fused_ff on a prequantized tree matches the QuantDense s8 FF
    closely, keeps the tree layout, and stays close to bf16."""
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    from ldmseg_tpu.ops.quant import prequantize_conv_tree
    base = dict(in_channels=4, block_out_channels=(32, 64),
                layers_per_block=1, attn_down=(True, True),
                attention_head_dim=2, norm_num_groups=8,
                use_cross_attention=False)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    t = jnp.array([3, 7], jnp.int32)
    u0 = UNet2DCondition(config=UNetConfig(**base))
    uq = UNet2DCondition(config=UNetConfig(**base, use_int8_ff=True,
                                           use_int8_conv=True,
                                           int8_act_scale=0.05))
    uf = UNet2DCondition(config=UNetConfig(**base, use_int8_ff=True,
                                           use_int8_conv=True,
                                           use_fused_ff=True,
                                           int8_act_scale=0.05))
    p = u0.init(jax.random.key(0), x, t)
    pf = uf.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(p) == \
        jax.tree_util.tree_structure(pf)
    pq = prequantize_conv_tree(p, quantize_ff=True)
    y0 = np.asarray(u0.apply(p, x, t), np.float32)
    yq = np.asarray(uq.apply(pq, x, t), np.float32)
    yf = np.asarray(uf.apply(pq, x, t), np.float32)
    assert np.isfinite(yf).all()
    # fused path tracks bf16 at least as well as the QuantDense path
    # (per-block g scales are finer than QuantDense's global amax, so
    # exact equality is not expected)
    def rel(a):
        return np.abs(a - y0).mean() / (np.abs(y0).mean() + 1e-8)
    assert rel(yf) <= rel(yq) * 1.5, (rel(yf), rel(yq))
    corr = np.corrcoef(y0.ravel(), yf.ravel())[0, 1]
    assert corr > 0.99, corr


def test_bilinear_upsample_2x_matches_resize():
    """Gather-free 2x bilinear (ops/resize.py) must equal
    jax.image.resize half-pixel bilinear exactly (SegVAE.decode path)."""
    from ldmseg_tpu.ops.resize import bilinear_upsample_2x
    x = jax.random.normal(jax.random.key(0), (2, 6, 10, 3))
    ref = jax.image.resize(x, (2, 12, 20, 3), "linear")
    out = bilinear_upsample_2x(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_resize_weight_matrix_matches_jax_resize():
    """x @ resize_weight_matrix(n, m) == jax.image.resize along that
    axis (triangle kernel, antialias, half-pixel centers) for both up-
    and downsampling — guards the full-res eval path's bucketed-einsum
    resize (trainer_ldm._eval_fullres)."""
    from ldmseg_tpu.ops.resize import resize_weight_matrix
    rng = np.random.RandomState(0)
    for n, m in [(24, 96), (80, 320), (96, 24), (320, 80), (17, 40),
                 (40, 17)]:
        x = jnp.asarray(rng.randn(3, n), jnp.float32)
        ref = np.asarray(jax.image.resize(x, (3, m), "linear",
                                          antialias=True))
        out = np.asarray(x) @ resize_weight_matrix(n, m)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5), (n, m)


def test_fused_gn_dispatchers_fall_back_on_cpu():
    """group_norm_silu / gn_silu_conv dispatch must route to the XLA
    reference on the CPU backend even when the tile fits in VMEM
    (compiled pallas_call cannot lower on the CPU test mesh)."""
    from ldmseg_tpu.ops.pallas.groupnorm_silu import group_norm_silu
    from ldmseg_tpu.ops.pallas.gn_silu_conv import gn_silu_conv
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 32), jnp.float32)
    sc = jnp.asarray(1.0 + 0.1 * rng.randn(32), jnp.float32)
    bi = jnp.asarray(0.1 * rng.randn(32), jnp.float32)
    out = group_norm_silu(x, sc, bi, groups=8)  # small tile: would have
    assert np.isfinite(np.asarray(out)).all()   # hit pallas before fix
    w = jnp.asarray(rng.randn(3, 3, 32, 16) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    out2 = gn_silu_conv(x, sc, bi, w, b, groups=8)
    assert np.isfinite(np.asarray(out2)).all()


def test_convtranspose2x_matches_flax():
    """Pixel-shuffle ConvTranspose2x == nn.ConvTranspose((2,2),s2,VALID)
    on the SAME params (bit-exact; used in SegVAE decoder + upscaler)."""
    from flax import linen as nn
    from ldmseg_tpu.models.layers import ConvTranspose2x
    ref_m = nn.ConvTranspose(6, (2, 2), strides=(2, 2), padding="VALID")
    x = jax.random.normal(jax.random.key(0), (2, 4, 5, 3))
    p = ref_m.init(jax.random.key(1), x)
    ref = ref_m.apply(p, x)
    out = ConvTranspose2x(6).apply(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)


def test_absorbed_fullc_s8_kernel_interpret_mode():
    """Full-C absorbed s8 kernel (to_q/k/v at full width, one-hot head
    extraction, pre-padded wo) stays within quantization error of the
    float projection+attention+projection reference, and the CPU
    dispatch fallback uses the same quantized weights."""
    import functools
    from jax.experimental.pallas import tpu as pltpu
    from ldmseg_tpu.ops.pallas.attention import (
        _attn_kernel_absorbed_fullc_s8, quantize_fullc_weights,
        absorbed_fullc_self_attention_s8, _xla_bthd)
    b, t, heads, d = 2, 32, 4, 8
    c = heads * d
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    wq, wk, wv, wo = (jnp.asarray(rng.randn(c, c), jnp.float32) * 0.2
                      for _ in range(4))
    scale = d**-0.5
    wq8, wk8, wv8, wop8, sc = quantize_fullc_weights(wq, wk, wv, wo, heads)
    act_scale = float(np.abs(np.asarray(x)).max()) / 127.0
    x8 = jnp.clip(jnp.round(x / act_scale), -127, 127).astype(jnp.int8)
    scf = sc.at[0, 0].set(act_scale)
    wspec = pl.BlockSpec((1, c, c), lambda i: (0, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel_absorbed_fullc_s8, scale=scale,
                          heads=heads),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            wspec, wspec, wspec,
            pl.BlockSpec((1,) + wop8.shape, lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        interpret=True,
    )(x8, wq8[None], wk8[None], wv8[None], wop8[None], scf)
    q = (x @ wq).reshape(b, t, heads, d)
    k = (x @ wk).reshape(b, t, heads, d)
    v = (x @ wv).reshape(b, t, heads, d)
    ref = _xla_bthd(q, k, v, scale).reshape(b, t, c) @ wo
    out = np.asarray(out, np.float32)
    rel = np.abs(out - np.asarray(ref)).mean() / \
        np.abs(np.asarray(ref)).mean()
    assert rel < 0.08, rel
    corr = np.corrcoef(out.ravel(), np.asarray(ref).ravel())[0, 1]
    assert corr > 0.99, corr
    # dispatch fallback (CPU): dequantized float math, same weights
    fb = absorbed_fullc_self_attention_s8(
        x, wq8, wk8, wv8, wop8, sc, heads, scale, act_scale)
    fb = np.asarray(fb, np.float32)
    rel_fb = np.abs(fb - np.asarray(ref)).mean() / \
        np.abs(np.asarray(ref)).mean()
    assert rel_fb < 0.05, rel_fb


def test_absorbed_padded_s8_kernel_interpret_mode():
    """Head-PADDED absorbed s8 kernel (single full-width projection
    matmul with 128-aligned head offsets, exact-denominator PV
    requantization, single to_out matmul) stays within quantization
    error of the float projection+attention+projection reference; the
    CPU dispatch fallback uses the same prequantized weights."""
    from ldmseg_tpu.ops.pallas.attention import (
        _abs_padded_prep, _abs_padded_s8_impl,
        absorbed_padded_self_attention_s8, quantize_head_weights,
        _xla_bthd)
    b, t, heads, d = 2, 32, 4, 8
    c = heads * d
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    wq, wk, wv, wo = (jnp.asarray(rng.randn(c, c), jnp.float32) * 0.2
                      for _ in range(4))
    scale = d**-0.5
    q = (x @ wq).reshape(b, t, heads, d)
    k = (x @ wk).reshape(b, t, heads, d)
    v = (x @ wv).reshape(b, t, heads, d)
    ref = _xla_bthd(q, k, v, scale).reshape(b, t, c) @ wo

    wq8, wk8, wv8, wo8, scales = quantize_head_weights(wq, wk, wv, wo,
                                                       heads)
    flat_qkv = lambda w8: jnp.transpose(  # noqa: E731
        w8, (1, 0, 2)).reshape(c, c)
    wq8f, wk8f, wv8f = flat_qkv(wq8), flat_qkv(wk8), flat_qkv(wv8)
    wo8f = wo8.reshape(c, c)
    act_scale = float(np.abs(np.asarray(x)).max()) / 127.0
    attn_scale = float(max(np.abs(np.asarray(p)).max()
                           for p in (q, k, v))) / 127.0

    wqp, wkp, wvp, wop, m, sc = _abs_padded_prep(
        wq8f, wk8f, wv8f, wo8f, scales, heads, act_scale, attn_scale,
        scale)
    # dead padded lanes must be exact zeros (they ride through QK^T/PV)
    assert np.asarray(wqp).shape == (c, heads * 128)
    assert not np.asarray(wqp).reshape(c, heads, 128)[:, :, d:].any()
    x8 = jnp.clip(jnp.round(x / act_scale), -127, 127).astype(jnp.int8)
    out = _abs_padded_s8_impl(x8, wqp, wkp, wvp, wop, m, sc, heads,
                              interpret=True)
    out = np.asarray(out, np.float32)
    rel = np.abs(out - np.asarray(ref)).mean() / \
        np.abs(np.asarray(ref)).mean()
    assert rel < 0.10, rel
    corr = np.corrcoef(out.ravel(), np.asarray(ref).ravel())[0, 1]
    assert corr > 0.985, corr
    # dispatch fallback (CPU backend): dequantized float math
    fb = absorbed_padded_self_attention_s8(
        x, wq8f, wk8f, wv8f, wo8f, scales, heads, scale, act_scale,
        attn_scale)
    fb = np.asarray(fb, np.float32)
    rel_fb = np.abs(fb - np.asarray(ref)).mean() / \
        np.abs(np.asarray(ref)).mean()
    assert rel_fb < 0.05, rel_fb


def test_unet_padded_attention_builds_and_prequantizes():
    """UNet with use_padded_attention keeps the Dense param tree and
    consumes the absorbed-attention prequantized tree (CPU fallback)."""
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    from ldmseg_tpu.ops.quant import prequantize_conv_tree
    base = dict(in_channels=4, block_out_channels=(32, 64),
                layers_per_block=1, attn_down=(True, True),
                attention_head_dim=2, norm_num_groups=8,
                use_cross_attention=False)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    t = jnp.array([3, 7], jnp.int32)
    u0 = UNet2DCondition(config=UNetConfig(**base))
    u1 = UNet2DCondition(config=UNetConfig(**base,
                                           use_padded_attention=True))
    p = u0.init(jax.random.key(0), x, t)
    p1 = u1.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(p) == \
        jax.tree_util.tree_structure(p1)
    y0 = u0.apply(p, x, t)
    # non-prequantized path quantizes in-graph (weight-only s8 error)
    y1 = u1.apply(p, x, t)
    corr = np.corrcoef(np.asarray(y0).ravel(), np.asarray(y1).ravel())[0, 1]
    assert np.isfinite(np.asarray(y1)).all() and corr > 0.99, corr
    # prequantized dict leaves ride the same dispatch (use_int8_conv so
    # the resnet QuantConvs consume the prequantized conv dicts too)
    pq = prequantize_conv_tree(p, absorbed_attention=True,
                               attention_heads=2)
    uq = UNet2DCondition(config=UNetConfig(**base,
                                           use_padded_attention=True,
                                           use_int8_conv=True))
    yq = uq.apply(pq, x, t)
    corr = np.corrcoef(np.asarray(y0).ravel(), np.asarray(yq).ravel())[0, 1]
    assert np.isfinite(np.asarray(yq)).all() and corr > 0.99, corr


def test_geglu_ln_kernel_interpret_mode():
    """LN+GEGLU+residual kernel must match the XLA fallback math (same
    quantization semantics) within the gelu-approximation tolerance."""
    import functools
    from ldmseg_tpu.ops.pallas.geglu import (
        _geglu_ln_kernel, _geglu_ln_impl, _xla_geglu_ln_s8,
        fused_geglu_ln_s8)
    b, t, c, m = 2, 16, 64, 128
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    w1 = jnp.asarray(rng.randn(c, 2 * m) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(2 * m) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(m, c) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)

    def qd(w):
        ws = np.maximum(np.abs(np.asarray(w)).max(axis=0), 1e-8) / 127.0
        return (jnp.asarray(np.round(np.asarray(w) / ws), jnp.int8),
                jnp.asarray(ws, jnp.float32))
    w1q, s1 = qd(w1)
    w2q, s2 = qd(w2)
    act_scale = 0.05
    ref = _xla_geglu_ln_s8(x, g1, be1, w1q, w2q,
                           jnp.stack([s1, b1]), s2[None], b2,
                           act_scale, 1e-6)
    # interpret-mode kernel via the impl with the wrapper's tiles
    s1t = jnp.zeros((8, 2 * m), jnp.float32).at[0].set(s1).at[1].set(b1)
    s2t = jnp.zeros((8, c), jnp.float32).at[0].set(s2)
    gt = jnp.zeros((8, c), jnp.float32).at[0].set(g1).at[1].set(
        be1).at[2].set(b2)
    sc = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(act_scale)
    out = pl.pallas_call(
        functools.partial(_geglu_ln_kernel, eps=1e-6),
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec(w1q.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(w2q.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(s1t.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(s2t.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(gt.shape, lambda i, j: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        interpret=True,
    )(x, w1q, w2q, s1t, s2t, gt, sc)
    out = np.asarray(out, np.float32)
    refn = np.asarray(ref, np.float32)
    rel = np.abs(out - refn).mean() / np.abs(refn).mean()
    assert rel < 0.02, rel  # tanh-vs-exact gelu + bf16 rounding only
    # public wrapper on CPU dispatches the fallback exactly
    fb = fused_geglu_ln_s8(x, g1, be1, w1q, s1, b1, w2q, s2, b2,
                           act_scale)
    np.testing.assert_allclose(np.asarray(fb, np.float32), refn,
                               rtol=2e-2, atol=2e-2)


def test_absorbed_padded_ln_s8_kernel_interpret_mode():
    """LN+attention+residual padded kernel vs float LN->attn->residual
    reference; the CPU dispatch fallback matches the same semantics."""
    from ldmseg_tpu.ops.pallas.attention import (
        _abs_padded_prep, _abs_padded_ln_s8_impl,
        absorbed_padded_ln_self_attention_s8, quantize_head_weights,
        _xla_bthd)
    b, t, heads, d = 2, 32, 4, 8
    c = heads * d
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    bo = jnp.asarray(0.05 * rng.randn(c), jnp.float32)
    wq, wk, wv, wo = (jnp.asarray(rng.randn(c, c), jnp.float32) * 0.2
                      for _ in range(4))
    scale = d**-0.5

    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    hn = (xc / np.sqrt((xc * xc).mean(-1, keepdims=True) + 1e-6)
          * np.asarray(g1) + np.asarray(be1))
    hj = jnp.asarray(hn, jnp.float32)
    q = (hj @ wq).reshape(b, t, heads, d)
    k = (hj @ wk).reshape(b, t, heads, d)
    v = (hj @ wv).reshape(b, t, heads, d)
    ref = (xf + np.asarray(
        _xla_bthd(q, k, v, scale).reshape(b, t, c) @ wo)
        + np.asarray(bo))

    wq8, wk8, wv8, wo8, scales = quantize_head_weights(wq, wk, wv, wo,
                                                       heads)
    flat_qkv = lambda w8: jnp.transpose(  # noqa: E731
        w8, (1, 0, 2)).reshape(c, c)
    w8 = (flat_qkv(wq8), flat_qkv(wk8), flat_qkv(wv8),
          wo8.reshape(c, c))
    act_scale = float(np.abs(hn).max()) / 127.0
    attn_scale = float(max(np.abs(np.asarray(p)).max()
                           for p in (q, k, v))) / 127.0
    wqp, wkp, wvp, wop, mm, sc = _abs_padded_prep(
        *w8, scales, heads, act_scale, attn_scale, scale)
    sc = sc.at[0, 2].set(act_scale)
    gt = jnp.zeros((8, c), jnp.float32).at[0].set(g1).at[1].set(
        be1).at[2].set(bo)
    out = _abs_padded_ln_s8_impl(x, wqp, wkp, wvp, wop, mm, gt, sc,
                                 heads, 1e-6, interpret=True)
    out = np.asarray(out, np.float32)
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.10, rel
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.985, corr
    # dispatch fallback (CPU backend)
    fb = absorbed_padded_ln_self_attention_s8(
        x, g1, be1, bo, *w8, scales, heads, scale, act_scale, attn_scale)
    fb = np.asarray(fb, np.float32)
    rel_fb = np.abs(fb - ref).mean() / np.abs(ref).mean()
    assert rel_fb < 0.05, rel_fb


def test_unet_fused_norms_builds_and_matches():
    """use_fused_norms keeps the param tree identical (LN params via
    _LNParams) and matches the plain UNet on CPU through both the raw
    and prequantized trees."""
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    from ldmseg_tpu.ops.quant import prequantize_conv_tree
    base = dict(in_channels=4, block_out_channels=(32, 64),
                layers_per_block=1, attn_down=(True, True),
                attention_head_dim=2, norm_num_groups=8,
                use_cross_attention=False)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    t = jnp.array([3, 7], jnp.int32)
    u0 = UNet2DCondition(config=UNetConfig(**base))
    p = u0.init(jax.random.key(0), x, t)
    y0 = u0.apply(p, x, t)
    fused = dict(base, use_padded_attention=True, use_int8_ff=True,
                 use_fused_ff=True, use_fused_norms=True)
    uf = UNet2DCondition(config=UNetConfig(**fused))
    pf = uf.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(p) == \
        jax.tree_util.tree_structure(pf)
    y1 = uf.apply(p, x, t)
    corr = np.corrcoef(np.asarray(y0).ravel(), np.asarray(y1).ravel())[0, 1]
    assert np.isfinite(np.asarray(y1)).all() and corr > 0.99, corr
    pq = prequantize_conv_tree(p, quantize_ff=True,
                               absorbed_attention=True, attention_heads=2)
    uq = UNet2DCondition(config=UNetConfig(**fused, use_int8_conv=True))
    yq = uq.apply(pq, x, t)
    corr = np.corrcoef(np.asarray(y0).ravel(), np.asarray(yq).ravel())[0, 1]
    assert np.isfinite(np.asarray(yq)).all() and corr > 0.99, corr


def test_absorbed_padded_ln_vbf16_kernel_interpret_mode():
    """v_bf16 variant of the LN+attention+residual kernel (bf16 V /
    probabilities / to_out, no e8/of8 quantization) must BEAT the s8
    variant's error against the float reference."""
    from ldmseg_tpu.ops.pallas.attention import (
        _abs_padded_prep, _abs_padded_ln_s8_impl, quantize_head_weights,
        _xla_bthd)
    b, t, heads, d = 2, 32, 4, 8
    c = heads * d
    rng = np.random.RandomState(17)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    bo = jnp.asarray(0.05 * rng.randn(c), jnp.float32)
    wq, wk, wv, wo = (jnp.asarray(rng.randn(c, c), jnp.float32) * 0.2
                      for _ in range(4))
    scale = d**-0.5
    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    hn = (xc / np.sqrt((xc * xc).mean(-1, keepdims=True) + 1e-6)
          * np.asarray(g1) + np.asarray(be1))
    hj = jnp.asarray(hn, jnp.float32)
    q = (hj @ wq).reshape(b, t, heads, d)
    k = (hj @ wk).reshape(b, t, heads, d)
    v = (hj @ wv).reshape(b, t, heads, d)
    ref = (xf + np.asarray(
        _xla_bthd(q, k, v, scale).reshape(b, t, c) @ wo) + np.asarray(bo))

    wq8, wk8, wv8, wo8, scales = quantize_head_weights(wq, wk, wv, wo,
                                                       heads)
    flat_qkv = lambda w8: jnp.transpose(  # noqa: E731
        w8, (1, 0, 2)).reshape(c, c)
    w8 = (flat_qkv(wq8), flat_qkv(wk8), flat_qkv(wv8), wo8.reshape(c, c))
    act_scale = float(np.abs(hn).max()) / 127.0
    attn_scale = float(max(np.abs(np.asarray(p)).max()
                           for p in (q, k, v))) / 127.0
    gt = jnp.zeros((8, c), jnp.float32).at[0].set(g1).at[1].set(
        be1).at[2].set(bo)

    rels = {}
    for v_bf16 in (False, True):
        wqp, wkp, wvp, wop, mm, sc = _abs_padded_prep(
            *w8, scales, heads, act_scale, attn_scale, scale)
        sc = sc.at[0, 2].set(act_scale)
        if v_bf16:
            dp = wqp.shape[-1] // heads
            mm = mm.at[3].set(jnp.repeat(scales[:, 0, 2], dp) * act_scale)
            wop = (wop.astype(jnp.float32)
                   * jnp.repeat(scales[:, 0, 3], dp)[:, None]
                   ).astype(jnp.bfloat16)
        out = _abs_padded_ln_s8_impl(x, wqp, wkp, wvp, wop, mm, gt, sc,
                                     heads, 1e-6, v_bf16=v_bf16,
                                     interpret=True)
        out = np.asarray(out, np.float32)
        rels[v_bf16] = np.abs(out - ref).mean() / np.abs(ref).mean()
        assert np.isfinite(out).all()
    assert rels[True] < rels[False], rels
    assert rels[True] < 0.06, rels


def test_absorbed_padded_ln_vt_kernel_interpret_mode():
    """Transposed-value variant of the LN kernel (K-major value path, no
    PV lane padding) computes the same math as v_bf16 — match the float
    reference within the same tolerance AND the v_bf16 kernel output
    closely (same quantization points, only the matmul order differs)."""
    from ldmseg_tpu.ops.pallas.attention import (
        _abs_padded_prep, _abs_padded_ln_s8_impl,
        _abs_padded_ln_s8_vt_impl, quantize_head_weights, _xla_bthd)
    b, t, heads, d = 2, 32, 4, 8
    c = heads * d
    rng = np.random.RandomState(23)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    bo = jnp.asarray(0.05 * rng.randn(c), jnp.float32)
    wq, wk, wv, wo = (jnp.asarray(rng.randn(c, c), jnp.float32) * 0.2
                      for _ in range(4))
    scale = d**-0.5
    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    xc = xf - mu
    hn = (xc / np.sqrt((xc * xc).mean(-1, keepdims=True) + 1e-6)
          * np.asarray(g1) + np.asarray(be1))
    hj = jnp.asarray(hn, jnp.float32)
    q = (hj @ wq).reshape(b, t, heads, d)
    k = (hj @ wk).reshape(b, t, heads, d)
    v = (hj @ wv).reshape(b, t, heads, d)
    ref = (xf + np.asarray(
        _xla_bthd(q, k, v, scale).reshape(b, t, c) @ wo) + np.asarray(bo))

    wq8, wk8, wv8, wo8, scales = quantize_head_weights(wq, wk, wv, wo,
                                                       heads)
    flat_qkv = lambda w8: jnp.transpose(  # noqa: E731
        w8, (1, 0, 2)).reshape(c, c)
    w8 = (flat_qkv(wq8), flat_qkv(wk8), flat_qkv(wv8), wo8.reshape(c, c))
    act_scale = float(np.abs(hn).max()) / 127.0
    attn_scale = float(max(np.abs(np.asarray(p)).max()
                           for p in (q, k, v))) / 127.0
    gt = jnp.zeros((8, c), jnp.float32).at[0].set(g1).at[1].set(
        be1).at[2].set(bo)

    wqp, wkp, wvp, wop, mm, sc = _abs_padded_prep(
        *w8, scales, heads, act_scale, attn_scale, scale)
    sc = sc.at[0, 2].set(act_scale)
    # v_bf16 baseline
    dp = wqp.shape[-1] // heads
    mb = mm.at[3].set(jnp.repeat(scales[:, 0, 2], dp) * act_scale)
    wob = (wop.astype(jnp.float32)
           * jnp.repeat(scales[:, 0, 3], dp)[:, None]).astype(jnp.bfloat16)
    base = np.asarray(_abs_padded_ln_s8_impl(
        x, wqp, wkp, wvp, wob, mb, gt, sc, heads, 1e-6, v_bf16=True,
        interpret=True), np.float32)
    # transposed-value kernel
    sc2 = sc.at[2, :heads].set(scales[:, 0, 2] * act_scale)
    wvt8 = w8[2].T
    wo_dq = (w8[3].astype(jnp.float32)
             * jnp.repeat(scales[:, 0, 3], d)[:, None]).astype(jnp.bfloat16)
    out = np.asarray(_abs_padded_ln_s8_vt_impl(
        x, wqp, wkp, wvt8, wo_dq, mm, gt, sc2, heads, 1e-6,
        interpret=True), np.float32)
    assert np.isfinite(out).all()
    rel_ref = np.abs(out - ref).mean() / np.abs(ref).mean()
    rel_base = np.abs(out - base).mean() / (np.abs(base).mean() + 1e-9)
    assert rel_ref < 0.06, rel_ref
    assert rel_base < 0.02, rel_base


def test_flash_attention_backward_interpret():
    """The flash-style backward kernel (dQ/dK/dV without HBM score
    round-trips — the TPU training path) matches the XLA vjp through the
    reference attention, including accumulation across q-blocks."""
    from ldmseg_tpu.ops.pallas.attention import _flash_bwd
    bh, t, d, bq = 3, 64, 8, 16
    scale = d**-0.5
    ks = jax.random.split(jax.random.key(0), 4)
    q, k, v, g = (jax.random.normal(kk, (bh, t, d), jnp.float32)
                  for kk in ks)
    ref_out, vjp = jax.vjp(
        lambda a, b, c: attn_reference(a, b, c, scale), q, k, v)
    dq_r, dk_r, dv_r = vjp(g)
    dq, dk, dv = _flash_bwd(q, k, v, g, scale, bq, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r),
                               rtol=1e-4, atol=1e-4)
    # bf16 inputs: matmul operands stay bf16 (the fast MXU path — P/dS
    # rounded to bf16 only as operands, softmax/dS algebra fp32); grads
    # agree with the fp32 reference to bf16 resolution
    b16 = lambda x: x.astype(jnp.bfloat16)  # noqa: E731
    dq2, dk2, dv2 = _flash_bwd(b16(q), b16(k), b16(v), b16(g), scale, bq,
                               interpret=True)
    for got, ref in ((dq2, dq_r), (dk2, dk_r), (dv2, dv_r)):
        got = np.asarray(got, np.float32)
        ref = np.asarray(ref, np.float32)
        rel = np.abs(got - ref).mean() / np.abs(ref).mean()
        assert rel < 0.02, rel


def test_pack_padded_ln_vt_tiles_matches_manual():
    """pack_inference_tiles' attention helper must emit EXACTLY the
    operands the unpacked vt wrapper builds in-graph (same helper feeds
    both paths; this pins the packed-tree contract), and the vt kernel
    consuming the pack must reproduce the manual-tile output."""
    from ldmseg_tpu.ops.pallas.attention import (
        _abs_padded_prep, _abs_padded_ln_s8_vt_impl,
        pack_padded_ln_vt_tiles, quantize_head_weights)
    b, t, heads, d = 2, 32, 4, 8
    c = heads * d
    rng = np.random.RandomState(29)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    bo = jnp.asarray(0.05 * rng.randn(c), jnp.float32)
    wq, wk, wv, wo = (jnp.asarray(rng.randn(c, c), jnp.float32) * 0.2
                      for _ in range(4))
    wq8, wk8, wv8, wo8, scales = quantize_head_weights(wq, wk, wv, wo,
                                                       heads)
    flat_qkv = lambda w8: jnp.transpose(  # noqa: E731
        w8, (1, 0, 2)).reshape(c, c)
    w8 = (flat_qkv(wq8), flat_qkv(wk8), flat_qkv(wv8), wo8.reshape(c, c))
    act_scale, attn_scale, scale = 0.04, 0.1, d**-0.5

    # manual tiles exactly as the wrapper's vt branch builds them
    wqp, wkp, _, _, mm, sc = _abs_padded_prep(
        *w8, scales, heads, act_scale, attn_scale, scale)
    sc = sc.at[0, 2].set(jnp.float32(act_scale))
    sc = sc.at[2, :heads].set(scales[:, 0, 2] * jnp.float32(act_scale))
    gt = jnp.zeros((8, c), jnp.float32).at[0].set(g1).at[1].set(
        be1).at[2].set(bo)
    wvt8 = w8[2].T
    wo_dq = (w8[3].astype(jnp.float32)
             * jnp.repeat(scales[:, 0, 3], d)[:, None]).astype(jnp.bfloat16)

    pack = pack_padded_ln_vt_tiles(*w8, scales, heads, scale, act_scale,
                                   g1, be1, bo, attn_scale)
    for key, ref in (("wqp", wqp), ("wkp", wkp), ("wvt", wvt8),
                     ("wo", wo_dq), ("m", mm), ("g", gt), ("sc", sc)):
        np.testing.assert_array_equal(np.asarray(pack[key]),
                                      np.asarray(ref), err_msg=key)

    manual = np.asarray(_abs_padded_ln_s8_vt_impl(
        x, wqp, wkp, wvt8, wo_dq, mm, gt, sc, heads, 1e-6,
        interpret=True), np.float32)
    packed = np.asarray(_abs_padded_ln_s8_vt_impl(
        x, pack["wqp"], pack["wkp"], pack["wvt"], pack["wo"],
        pack["m"], pack["g"], pack["sc"], heads, 1e-6,
        interpret=True), np.float32)
    np.testing.assert_array_equal(packed, manual)


def test_pack_geglu_ln_tiles_matches_manual():
    """The GEGLU pack helper's tiles equal the wrapper's in-graph builds
    bit-for-bit (static and dynamic interior scale)."""
    from ldmseg_tpu.ops.pallas.geglu import pack_geglu_ln_tiles
    c, m = 64, 128
    rng = np.random.RandomState(31)
    s1 = jnp.asarray(np.abs(rng.randn(2 * m)) * 1e-3 + 1e-4, jnp.float32)
    b1 = jnp.asarray(rng.randn(2 * m) * 0.05, jnp.float32)
    s2 = jnp.asarray(np.abs(rng.randn(c)) * 1e-3 + 1e-4, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    for g_scale in (None, 0.04):
        pack = pack_geglu_ln_tiles(s1, b1, s2, b2, g1, be1, 0.05, g_scale)
        s1t = jnp.zeros((8, 2 * m), jnp.float32).at[0].set(
            s1).at[1].set(b1)
        s2t = jnp.zeros((8, c), jnp.float32).at[0].set(s2)
        gt = jnp.zeros((8, c), jnp.float32).at[0].set(g1).at[1].set(
            be1).at[2].set(b2)
        sc = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(0.05)
        if g_scale is not None:
            sc = sc.at[0, 1].set(g_scale)
        np.testing.assert_array_equal(np.asarray(pack["s1t"]),
                                      np.asarray(s1t))
        np.testing.assert_array_equal(np.asarray(pack["s2t"]),
                                      np.asarray(s2t))
        np.testing.assert_array_equal(np.asarray(pack["g"]),
                                      np.asarray(gt))
        np.testing.assert_array_equal(np.asarray(pack["sc"]),
                                      np.asarray(sc))


def test_pack_inference_tiles_tree_and_cpu_parity():
    """pack_inference_tiles adds t_* entries inside the prequantized
    kernel dicts of fused-norms transformer blocks (keys sorting after
    "q" — the flax first-leaf constraint), and the packed tree applies
    IDENTICALLY to the unpacked one on CPU (fallback path ignores the
    pack; on TPU the kernels consume it)."""
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    from ldmseg_tpu.ops.quant import (prequantize_conv_tree,
                                      pack_inference_tiles)
    base = dict(in_channels=4, block_out_channels=(32, 64),
                layers_per_block=1, attn_down=(True, True),
                attention_head_dim=2, norm_num_groups=8,
                use_cross_attention=False)
    fused = dict(base, use_padded_attention=True, use_int8_ff=True,
                 use_fused_ff=True, use_fused_norms=True,
                 use_int8_conv=True)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    t = jnp.array([3, 7], jnp.int32)
    u0 = UNet2DCondition(config=UNetConfig(**base))
    p = u0.init(jax.random.key(0), x, t)
    pq = prequantize_conv_tree(p, quantize_ff=True,
                               absorbed_attention=True, attention_heads=2)
    pk = pack_inference_tiles(pq, attention_heads=2)
    # entries exist with the kernel-facing shapes
    flat = jax.tree_util.tree_flatten_with_path(pk)[0]
    keys = {"/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in flat}
    assert any(k.endswith("to_q/kernel/t_wqp") for k in keys), keys
    assert any(k.endswith("proj_in/kernel/t_s1") for k in keys)
    assert any(k.endswith("to_out/kernel/t_g") for k in keys)
    blk = [path for path, _ in flat
           if str(getattr(path[-1], "key", "")) == "t_wqp"]
    assert blk, "no packed attention blocks found"
    # CPU parity: fallback ignores the pack — outputs identical
    uq = UNet2DCondition(config=UNetConfig(**fused))
    y_pq = uq.apply(pq, x, t)
    y_pk = uq.apply(pk, x, t)
    np.testing.assert_array_equal(np.asarray(y_pq), np.asarray(y_pk))


def test_padded_ln_vt_pin_kernel_interpret_mode():
    """proj_in-absorbed vt kernel == (XLA proj_in) -> vt kernel: the
    bf16 prologue matmul builds the same residual stream the plain vt
    kernel receives pre-projected."""
    from ldmseg_tpu.ops.pallas.attention import (
        _abs_padded_prep, _abs_padded_ln_s8_vt_impl,
        _abs_padded_ln_s8_vt_pin_impl, quantize_head_weights)
    b, t, heads, d = 2, 32, 4, 8
    c = heads * d
    rng = np.random.RandomState(31)
    xg = jnp.asarray(rng.randn(b, t, c), jnp.float32)  # GN output
    wpi = jnp.asarray(rng.randn(c, c) * 0.2, jnp.float32)
    bpi = jnp.asarray(0.05 * rng.randn(c), jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    bo = jnp.asarray(0.05 * rng.randn(c), jnp.float32)
    wq, wk, wv, wo = (jnp.asarray(rng.randn(c, c), jnp.float32) * 0.2
                      for _ in range(4))
    scale = d**-0.5
    h = jnp.einsum("btc,co->bto", xg, wpi) + bpi  # exact f32 prologue

    wq8, wk8, wv8, wo8, scales = quantize_head_weights(wq, wk, wv, wo,
                                                       heads)
    flat_qkv = lambda w8: jnp.transpose(  # noqa: E731
        w8, (1, 0, 2)).reshape(c, c)
    w8 = (flat_qkv(wq8), flat_qkv(wk8), flat_qkv(wv8), wo8.reshape(c, c))
    act_scale = float(np.abs(np.asarray(h)).max()) / 100.0
    attn_scale = 0.1
    wqp, wkp, wvp, wop, mm, sc = _abs_padded_prep(
        *w8, scales, heads, act_scale, attn_scale, scale)
    sc = sc.at[0, 2].set(act_scale)
    sc = sc.at[2, :heads].set(scales[:, 0, 2] * act_scale)
    wvt8 = w8[2].T
    wo_dq = (w8[3].astype(jnp.float32)
             * jnp.repeat(scales[:, 0, 3], d)[:, None]).astype(
        jnp.bfloat16)
    gt = jnp.zeros((8, c), jnp.float32).at[0].set(g1).at[1].set(
        be1).at[2].set(bo)
    ref = np.asarray(_abs_padded_ln_s8_vt_impl(
        h, wqp, wkp, wvt8, wo_dq, mm, gt, sc, heads, 1e-6,
        interpret=True), np.float32)
    gt3 = gt.at[3].set(bpi)
    out = np.asarray(_abs_padded_ln_s8_vt_pin_impl(
        xg, wpi, wqp, wkp, wvt8, wo_dq, mm, gt3, sc, heads, 1e-6,
        interpret=True), np.float32)
    assert np.isfinite(out).all()
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 1e-3, rel


def test_geglu_ln_pout_kernel_interpret_mode():
    """proj_out-absorbed LN+GEGLU kernel == LN+GEGLU kernel -> (XLA
    proj_out), within the bf16 epilogue-operand rounding."""
    import functools
    from ldmseg_tpu.ops.pallas.geglu import (
        _geglu_ln_kernel, _geglu_ln_pout_kernel)
    b, t, c, m = 2, 16, 64, 128
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * rng.randn(c), jnp.float32)
    be1 = jnp.asarray(0.1 * rng.randn(c), jnp.float32)
    w1 = jnp.asarray(rng.randn(c, 2 * m) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(2 * m) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(m, c) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
    wpo = jnp.asarray(rng.randn(c, c) * 0.2, jnp.float32)
    bpo = jnp.asarray(0.05 * rng.randn(c), jnp.float32)

    def qd(w):
        ws = np.maximum(np.abs(np.asarray(w)).max(axis=0), 1e-8) / 127.0
        return (jnp.asarray(np.round(np.asarray(w) / ws), jnp.int8),
                jnp.asarray(ws, jnp.float32))
    w1q, s1 = qd(w1)
    w2q, s2 = qd(w2)
    act_scale = 0.05
    s1t = jnp.zeros((8, 2 * m), jnp.float32).at[0].set(s1).at[1].set(b1)
    s2t = jnp.zeros((8, c), jnp.float32).at[0].set(s2)
    gt = jnp.zeros((8, c), jnp.float32).at[0].set(g1).at[1].set(
        be1).at[2].set(b2)
    sc = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(act_scale)
    base = pl.pallas_call(
        functools.partial(_geglu_ln_kernel, eps=1e-6),
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec(w1q.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(w2q.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(s1t.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(s2t.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(gt.shape, lambda i, j: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        interpret=True,
    )(x, w1q, w2q, s1t, s2t, gt, sc)
    ref = (jnp.einsum("btc,co->bto", base.astype(jnp.float32), wpo)
           + bpo)
    gt3 = gt.at[3].set(bpo)
    out = pl.pallas_call(
        functools.partial(_geglu_ln_pout_kernel, eps=1e-6),
        grid=(b, 1),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec(w1q.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(w2q.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(wpo.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(s1t.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(s2t.shape, lambda i, j: (0, 0)),
            pl.BlockSpec(gt3.shape, lambda i, j: (0, 0)),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        interpret=True,
    )(x, w1q, w2q, wpo, s1t, s2t, gt3, sc)
    out = np.asarray(out, np.float32)
    refn = np.asarray(ref, np.float32)
    rel = np.abs(out - refn).mean() / np.abs(refn).mean()
    assert np.isfinite(out).all()
    assert rel < 0.02, rel


def test_unet_fused_projs_builds_and_matches():
    """UNet with use_fused_projs keeps the param tree identical, matches
    the bf16 model through the CPU fallbacks, and consumes the
    prequantized + fuse_projs-packed tree."""
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    from ldmseg_tpu.ops.quant import (prequantize_conv_tree,
                                      pack_inference_tiles)
    base = dict(in_channels=4, block_out_channels=(32, 64),
                layers_per_block=1, attn_down=(True, True),
                attention_head_dim=2, norm_num_groups=8,
                use_cross_attention=False)
    fused = dict(base, use_padded_attention=True, use_fused_norms=True,
                 use_int8_conv=True, use_int8_ff=True, use_fused_ff=True,
                 use_fused_projs=True, int8_act_scale=0.05,
                 int8_attn_act_scale=0.1)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
    t = jnp.array([3, 7], jnp.int32)
    u0 = UNet2DCondition(config=UNetConfig(**base))
    u1 = UNet2DCondition(config=UNetConfig(**fused))
    p = u0.init(jax.random.key(0), x, t)
    p1 = u1.init(jax.random.key(0), x, t)
    assert jax.tree_util.tree_structure(p) == \
        jax.tree_util.tree_structure(p1)
    y0 = u0.apply(p, x, t)
    pq = prequantize_conv_tree(p, quantize_ff=True,
                               absorbed_attention=True,
                               attention_heads=2)
    pk = pack_inference_tiles(pq, attention_heads=2, fuse_projs=True)
    y1 = u1.apply(pk, x, t)
    corr = np.corrcoef(np.asarray(y0).ravel(),
                       np.asarray(y1).ravel())[0, 1]
    assert np.isfinite(np.asarray(y1)).all() and corr > 0.99, corr
