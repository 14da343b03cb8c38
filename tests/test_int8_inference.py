"""int8 inference mode: the quantized UNet (int8 resnet convs via the
fused GN+SiLU+quant pass, optional int8 attention) must track the bf16
model through a full DDIM sampling loop on the SAME parameters.

TPU-native optimization with no reference counterpart (the reference is
fp16 AMP on cuDNN, trainers_ldm_cond.py:106); opt-in and inference-only.
On CPU the fused pass uses the XLA fallback — identical quantization
math, so this gates the numerics the TPU kernel implements.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from ldmseg_tpu.models import UNet2DCondition, UNetConfig
from ldmseg_tpu.diffusion import make_ddim_schedule, ddim_sample

pytestmark = pytest.mark.slow

BASE = dict(in_channels=8, out_channels=4,
            block_out_channels=(16, 32, 32, 64), layers_per_block=1,
            attention_head_dim=2, norm_num_groups=8,
            use_cross_attention=False)


def _sample(unet, params, rgb_latents, steps=5):
    sched = make_ddim_schedule(beta_schedule="scaled_linear",
                               beta_start=0.00085, beta_end=0.012,
                               clip_sample=False, set_alpha_to_one=False)

    def model_fn(latents, condition, t):
        inp = jnp.concatenate([latents, rgb_latents], axis=-1)
        return unet.apply(params, inp, t)

    init = jax.random.normal(jax.random.key(3), rgb_latents.shape)
    return ddim_sample(sched, model_fn, init, num_inference_steps=steps)


def test_int8_sampling_tracks_bf16():
    u_bf = UNet2DCondition(config=UNetConfig(**BASE))
    u_i8 = UNet2DCondition(config=UNetConfig(
        **BASE, use_int8_conv=True, int8_fuse_gn=True))
    params = u_bf.init(jax.random.key(0), jnp.zeros((1, 8, 16, 8)),
                       jnp.zeros((1,), jnp.int32))
    rgb = jax.random.normal(jax.random.key(1), (2, 8, 16, 4))

    x_bf = np.asarray(_sample(u_bf, params, rgb))
    x_i8 = np.asarray(_sample(u_i8, params, rgb))

    assert np.all(np.isfinite(x_i8))
    rel = np.abs(x_i8 - x_bf).mean() / (np.abs(x_bf).mean() + 1e-8)
    corr = np.corrcoef(x_bf.ravel(), x_i8.ravel())[0, 1]
    # accumulated over the whole sampling trajectory
    assert rel < 0.25, rel
    assert corr > 0.97, corr


def test_int8_param_tree_identical():
    """The int8 flags must not change the checkpoint layout — the mode
    can be flipped on any loaded bf16 checkpoint."""
    u_bf = UNet2DCondition(config=UNetConfig(**BASE))
    u_i8 = UNet2DCondition(config=UNetConfig(
        **BASE, use_int8_conv=True, int8_fuse_gn=True,
        use_int8_attention=True))
    p_bf = u_bf.init(jax.random.key(0), jnp.zeros((1, 8, 16, 8)),
                     jnp.zeros((1,), jnp.int32))
    p_i8 = u_i8.init(jax.random.key(0), jnp.zeros((1, 8, 16, 8)),
                     jnp.zeros((1,), jnp.int32))
    t_bf = jax.tree_util.tree_structure(p_bf)
    t_i8 = jax.tree_util.tree_structure(p_i8)
    assert t_bf == t_i8


def test_prequantized_weights_match_in_graph_quant():
    """prequantize_conv_tree must be bit-identical to the in-graph weight
    quantization (same math, hoisted out of the sampling scan)."""
    from ldmseg_tpu.ops.quant import prequantize_conv_tree
    u_i8 = UNet2DCondition(config=UNetConfig(
        **BASE, use_int8_conv=True, int8_fuse_gn=True))
    params = u_i8.init(jax.random.key(0), jnp.zeros((1, 8, 16, 8)),
                       jnp.zeros((1,), jnp.int32))
    x = jax.random.normal(jax.random.key(1), (2, 8, 16, 8))
    t = jnp.array([3, 7], jnp.int32)
    y0 = np.asarray(u_i8.apply(params, x, t))
    y1 = np.asarray(u_i8.apply(prequantize_conv_tree(params), x, t))
    np.testing.assert_array_equal(y0, y1)


def test_prequantize_targets_only_resnet_convs():
    from ldmseg_tpu.ops.quant import prequantize_conv_tree
    u = UNet2DCondition(config=UNetConfig(**BASE, use_int8_conv=True))
    params = u.init(jax.random.key(0), jnp.zeros((1, 8, 16, 8)),
                    jnp.zeros((1,), jnp.int32))
    pq = prequantize_conv_tree(params)
    flat = jax.tree_util.tree_flatten_with_path(pq)[0]
    q_paths = [jax.tree_util.keystr(k) for k, v in flat
               if getattr(v, "dtype", None) == jnp.int8]
    assert q_paths, "no kernels were quantized"
    assert all(any(t in p for t in
                   ("conv1", "conv2", "downsample", "upsample"))
               for p in q_paths)
    # conv_in / shortcuts / attention projections stay bf16/f32
    assert not any("conv_in" in p or "shortcut" in p or "to_q" in p
                   for p in q_paths)


def test_prequantize_covers_down_up_convs():
    """use_int8_conv also routes Down/Upsample convs through QuantConv;
    prequantize must target them and keep accuracy."""
    from ldmseg_tpu.ops.quant import prequantize_conv_tree
    ub = UNet2DCondition(config=UNetConfig(**BASE))
    ui = UNet2DCondition(config=UNetConfig(**BASE, use_int8_conv=True))
    p = ub.init(jax.random.key(0), jnp.zeros((1, 8, 16, 8)),
                jnp.zeros((1,), jnp.int32))
    pq = prequantize_conv_tree(p)
    flat = jax.tree_util.tree_flatten_with_path(pq)[0]
    qp = [jax.tree_util.keystr(k) for k, v in flat
          if getattr(v, "dtype", None) == jnp.int8]
    assert any("downsample" in s for s in qp)
    assert any("upsample" in s for s in qp)
    x = jax.random.normal(jax.random.key(1), (2, 8, 16, 8))
    t = jnp.array([3, 7], jnp.int32)
    yb = np.asarray(ub.apply(p, x, t), np.float32)
    yi = np.asarray(ui.apply(pq, x, t), np.float32)
    corr = np.corrcoef(yb.ravel(), yi.ravel())[0, 1]
    assert np.isfinite(yi).all() and corr > 0.995, corr


def test_image_vae_int8_encoder():
    """ImageVAE.encode with use_int8 tracks the bf16 encoder."""
    from ldmseg_tpu.models import ImageVAE
    from ldmseg_tpu.ops.quant import prequantize_conv_tree
    import functools
    kw = dict(block_out_channels=(32, 64), decoder_enabled=False)
    vb = ImageVAE(**kw)
    vi = ImageVAE(**kw, use_int8=True, int8_act_scale=0.05)
    x = jax.random.normal(jax.random.key(1), (2, 32, 64, 3))
    p = vb.init(jax.random.key(0), x, method=ImageVAE.encode)
    enc = functools.partial(vb.apply, method=ImageVAE.encode)
    yb = np.asarray(enc(p, x).mode(), np.float32)
    yi = np.asarray(vi.apply(prequantize_conv_tree(p), x,
                             method=ImageVAE.encode).mode(), np.float32)
    corr = np.corrcoef(yb.ravel(), yi.ravel())[0, 1]
    assert np.isfinite(yi).all() and corr > 0.99, corr


def test_trainer_int8_inference_sampling(tmp_path):
    """TrainerDiffusion with sampling_kwargs.int8_inference samples
    through the s8 UNet on prequantized weights and tracks the bf16
    trainer's output."""
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

    small = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": [8, 16, 16, 32], "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8,
        },
        "train_kwargs": {"batch_size": 4, "train_num_steps": 1,
                         "weight_dtype": "bfloat16"},
        "sampling_kwargs": {"num_inference_steps": 2},
        "ignore_label": 0,
    })
    ucfg = UNetConfig(in_channels=8, out_channels=4,
                      block_out_channels=(16, 32), layers_per_block=1,
                      attention_head_dim=2, norm_num_groups=8,
                      attn_down=(True, True), use_cross_attention=False)
    ds = SyntheticDVPS(length=4, size=(64, 128), num_classes=20)
    batch = next(iter(Loader(ds, 4, shuffle=False)))

    outs = {}
    for name, extra in (("bf16", {}), ("int8", {"int8_inference": True})):
        cfg = merge_dicts(small, {"sampling_kwargs": extra})
        tr = TrainerDiffusion(cfg, unet_config=ucfg,
                              results_folder=str(tmp_path / name))
        tr.init_state(batch, seed=0)
        logits, _ = tr.sample_panoptic(batch, jax.random.key(0),
                                       num_inference_steps=2)
        outs[name] = np.asarray(logits, np.float32)
        assert np.isfinite(outs[name]).all()
    corr = np.corrcoef(outs["bf16"].ravel(), outs["int8"].ravel())[0, 1]
    assert corr > 0.98, corr


def test_calibrate_act_scale():
    """Calibration measures amax/127 over the GN+SiLU outputs; percentile
    mode clips outliers; result feeds int8_act_scale."""
    from ldmseg_tpu.ops.quant import calibrate_act_scale
    u = UNet2DCondition(config=UNetConfig(**BASE))
    x = jax.random.normal(jax.random.key(1), (2, 8, 16, 8))
    t = jnp.array([3, 7], jnp.int32)
    p = u.init(jax.random.key(0), x, t)
    s = calibrate_act_scale(u.apply, p, (x, t))
    s99 = calibrate_act_scale(u.apply, p, (x, t), percentile=99.9)
    assert 0 < s99 <= s < 1.0
    # the calibrated scale must reproduce the forward within the usual
    # int8 gate when used as the static conv scale
    ui = UNet2DCondition(config=UNetConfig(
        **BASE, use_int8_conv=True, int8_act_scale=s))
    yb = np.asarray(u.apply(p, x, t), np.float32)
    yi = np.asarray(ui.apply(p, x, t), np.float32)
    corr = np.corrcoef(yb.ravel(), yi.ravel())[0, 1]
    assert corr > 0.995, corr


def test_per_layer_calibration_beats_global_scale():
    """calibrate_act_scale_tree emits one scale per resnet conv site;
    threading them through apply_act_scales must be at least as accurate
    as the single global amax scale (per-site ranges waste fewer codes),
    and the site keys must match the prequantized conv paths."""
    from ldmseg_tpu.ops.quant import (
        calibrate_act_scale, calibrate_act_scale_tree,
        prequantize_conv_tree, apply_act_scales)
    u = UNet2DCondition(config=UNetConfig(**BASE))
    x = jax.random.normal(jax.random.key(1), (2, 8, 16, 8))
    t = jnp.array([3, 7], jnp.int32)
    p = u.init(jax.random.key(0), x, t)

    scales = calibrate_act_scale_tree(u.apply, p, (x, t))
    s_glob = calibrate_act_scale(u.apply, p, (x, t))
    conv_scales = {k: v for k, v in scales.items()
                   if k[-1] in ("conv1", "conv2")}
    assert len(conv_scales) >= 8  # conv1+conv2 per resnet, down+mid+up
    # transformer sites: attention input (LN1), FF input (LN3), FF
    # gated interior — keyed to the consuming matmul's param path
    assert all(k[-1] in ("conv1", "conv2", "to_q", "proj_in", "proj_out")
               for k in scales)
    for tail in ("to_q", "proj_in", "proj_out"):
        assert any(k[-1] == tail for k in scales), tail
    assert all(0 < v <= s_glob * (1 + 1e-6)
               for v in conv_scales.values())
    # per-site scales differ across the net (a global scalar can't fit)
    assert max(conv_scales.values()) / min(conv_scales.values()) > 1.1

    pq = prequantize_conv_tree(p)
    pq_cal = apply_act_scales(pq, scales)
    # every calibrated CONV site landed on a prequantized kernel dict
    # (FF/attention kernels stay bf16 without quantize_ff)
    hits = []

    def walk(node, path):
        if isinstance(node, dict):
            if set(node) >= {"q", "scale"}:
                if "x_scale" in node:
                    hits.append(path)
                return
            for k, v in node.items():
                walk(v, path + (k,))

    walk(pq_cal["params"], ())
    assert len(hits) == len(conv_scales), (len(hits), len(conv_scales))

    ui = UNet2DCondition(config=UNetConfig(**BASE, use_int8_conv=True,
                                           int8_act_scale=s_glob))
    yb = np.asarray(u.apply(p, x, t), np.float32)
    y_glob = np.asarray(ui.apply(prequantize_conv_tree(p), x, t),
                        np.float32)
    y_cal = np.asarray(ui.apply(pq_cal, x, t), np.float32)

    def rel(a):
        return np.abs(a - yb).mean() / (np.abs(yb).mean() + 1e-8)

    assert rel(y_cal) <= rel(y_glob) * 1.02, (rel(y_cal), rel(y_glob))
    corr = np.corrcoef(yb.ravel(), y_cal.ravel())[0, 1]
    assert corr > 0.995, corr


def test_trainer_calibrate_int8(tmp_path):
    """TrainerDiffusion.calibrate_int8 measures scales on a real batch
    and subsequent int8 sampling uses them (prequant pipeline gains
    act_scale leaves)."""
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts
    cfg = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": [8, 16, 16, 32], "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8},
        "train_kwargs": {"batch_size": 8, "train_num_steps": 1},
        "sampling_kwargs": {"int8_inference": True,
                            "num_inference_steps": 2},
        "ignore_label": 0})
    ucfg = UNetConfig(in_channels=8, out_channels=4,
                      block_out_channels=(8, 16, 16, 32),
                      layers_per_block=1, cross_attention_dim=16,
                      attention_head_dim=2, norm_num_groups=4,
                      use_cross_attention=False)
    ds = SyntheticDVPS(length=8, size=(64, 128), num_classes=20)
    tr = TrainerDiffusion(cfg, unet_config=ucfg, dataset=ds,
                          val_dataset=ds, results_folder=str(tmp_path))
    batch = next(iter(Loader(ds, 8, shuffle=False)))
    tr.init_state(batch)
    scales = tr.calibrate_int8(batch)
    assert len(scales) >= 8
    pq = tr._prequant(tr.state.eval_params())
    flat = [k for k, v in jax.tree_util.tree_leaves_with_path(pq)]
    assert any("x_scale" in jax.tree_util.keystr(k) for k in flat)
    logits, x0 = tr.sample_panoptic(batch, jax.random.key(0),
                                    num_inference_steps=2)
    assert np.all(np.isfinite(np.asarray(x0)))


def test_seg_vae_int8_decoder():
    """SegVAE.decode with use_int8 tracks the bf16 decoder (opt-in; at
    the bench shape the bandwidth-bound decoder measured FASTER in bf16,
    see BENCH_NOTES.md round 3 — the path stays for other shapes and as
    the checkpoint-compatible s8 form of ConvTranspose2x)."""
    import functools
    from ldmseg_tpu.models import SegVAE
    from ldmseg_tpu.ops.quant import prequantize_conv_tree

    v = SegVAE(in_channels=16, out_channels=32, num_upscalers=2,
               int_channels=64, upscale_channels=64, norm_num_groups=8,
               block_out_channels=(8, 16, 32, 64))
    vq = v.clone(use_int8=True)
    p = jax.jit(functools.partial(v.init, sample_posterior=False))(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 16), jnp.float32))
    # same param tree: the flag flips on any loaded checkpoint
    pi = jax.jit(functools.partial(vq.init, sample_posterior=False))(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 16), jnp.float32))
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(pi))

    pq = prequantize_conv_tree(p)
    dec = pq["params"]["decoder"]
    for leaf in ("in_conv", "up0_convt", "up1_convt", "out_conv"):
        assert isinstance(dec[leaf]["kernel"], dict), leaf
    # encoder untouched
    enc_flat = jax.tree_util.tree_flatten(pq["params"]["encoder"])[0]
    assert all(getattr(x, "dtype", None) != jnp.int8 for x in enc_flat)

    z = jax.random.normal(jax.random.key(2), (2, 8, 8, 4)) * 5.0
    ref = np.asarray(v.apply(p, z, True, method=SegVAE.decode), np.float32)
    for params in (p, pq):  # in-graph quant and prequantized
        out = np.asarray(vq.apply(params, z, True, method=SegVAE.decode),
                         np.float32)
        assert np.isfinite(out).all()
        corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
        agree = (ref.argmax(-1) == out.argmax(-1)).mean()
        assert corr > 0.99, corr
        assert agree > 0.9, agree


def test_trainer_int8_fused_norms_with_cross_attention(tmp_path):
    """The fused-norms default (padded s8 self-attention) must compose
    with LIVE cross-attention + CFG: self-attn rides the padded kernel,
    cross-attn stays bf16 Dense, and guided sampling stays finite and
    tracks the bf16 trainer."""
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.models.descriptors import DescriptorSpec
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

    small = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": [8, 16, 16, 32], "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8,
        },
        "train_kwargs": {"batch_size": 4, "train_num_steps": 1,
                         "weight_dtype": "bfloat16"},
        "sampling_kwargs": {"num_inference_steps": 2,
                            "guidance_scale": 3.0},
        "ignore_label": 0,
    })
    ucfg = UNetConfig(in_channels=8, out_channels=4,
                      block_out_channels=(16, 32), layers_per_block=1,
                      cross_attention_dim=16, attention_head_dim=2,
                      norm_num_groups=8, attn_down=(True, True),
                      use_cross_attention=True)
    spec = DescriptorSpec(kind="none", use_cross_attention=True)
    ds = SyntheticDVPS(length=4, size=(64, 128), num_classes=20)
    batch = next(iter(Loader(ds, 4, shuffle=False)))
    batch["context"] = np.random.RandomState(0).randn(
        4, 4, 16).astype(np.float32)

    outs = {}
    for name, extra in (("bf16", {}), ("int8", {"int8_inference": True})):
        cfg = merge_dicts(small, {"sampling_kwargs": extra})
        tr = TrainerDiffusion(cfg, unet_config=ucfg, descriptor=spec,
                              results_folder=str(tmp_path / name))
        tr.init_state(batch, seed=0)
        assert tr.unet_infer.config.use_padded_attention == \
            (name == "int8")
        logits, _ = tr.sample_panoptic(batch, jax.random.key(0),
                                       num_inference_steps=2)
        outs[name] = np.asarray(logits, np.float32)
        assert np.isfinite(outs[name]).all()
    corr = np.corrcoef(outs["bf16"].ravel(), outs["int8"].ravel())[0, 1]
    assert corr > 0.98, corr


def test_calibrated_transformer_scales_fused_norms():
    """Per-site calibration now covers the transformer sites (attention
    input, FF input, FF gated interior). Threaded through the fused-norms
    int8 UNet, the calibrated tree must track bf16 at least as well as
    the global-scalar config — with the FF interior quantized by a STATIC
    scale (no in-kernel amax)."""
    import functools
    from ldmseg_tpu.ops.quant import (
        calibrate_act_scale_tree, prequantize_conv_tree, apply_act_scales)

    u = UNet2DCondition(config=UNetConfig(**BASE))
    x = jax.random.normal(jax.random.key(1), (2, 8, 16, 8))
    t = jnp.array([3, 7], jnp.int32)
    p = u.init(jax.random.key(0), x, t)
    yb = np.asarray(u.apply(p, x, t), np.float32)

    scales = calibrate_act_scale_tree(u.apply, p, (x, t))
    heads = BASE["attention_head_dim"]
    pq = jax.jit(functools.partial(prequantize_conv_tree, quantize_ff=True,
                                   absorbed_attention=True,
                                   attention_heads=heads))(p)
    pq_cal = apply_act_scales(pq, scales)

    # the FF interior scale landed on proj_out kernels
    def find(node, tail, out):
        if isinstance(node, dict):
            if set(node) >= {"q", "scale"}:
                return
            for k, v in node.items():
                if k == tail and isinstance(v, dict) and \
                        isinstance(v.get("kernel"), dict) and \
                        "x_scale" in v["kernel"]:
                    out.append(k)
                find(v, tail, out)

    hits = []
    find(pq_cal["params"], "proj_out", hits)
    assert hits, "no proj_out interior scale attached"

    ui = UNet2DCondition(config=UNetConfig(
        **BASE, use_padded_attention=True, use_fused_norms=True,
        use_int8_conv=True, int8_act_scale=0.05,
        use_int8_ff=True, use_fused_ff=True, int8_attn_act_scale=0.1))
    y_glob = np.asarray(ui.apply(pq, x, t), np.float32)
    y_cal = np.asarray(ui.apply(pq_cal, x, t), np.float32)
    assert np.isfinite(y_cal).all()

    def rel(a):
        return np.abs(a - yb).mean() / (np.abs(yb).mean() + 1e-8)

    assert rel(y_cal) <= rel(y_glob) * 1.05, (rel(y_cal), rel(y_glob))
    corr = np.corrcoef(yb.ravel(), y_cal.ravel())[0, 1]
    assert corr > 0.99, corr


def test_int8_auto_calibration_on_imported_weights(tmp_path):
    """int8 sampling on IMPORTED (pretrained) weights must not silently
    use the global default act scales: the first sampling call
    auto-calibrates per-site scales through the torch-import path, and
    opting out of auto-calibration without scales fails loudly."""
    import pytest
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts
    from ldmseg_tpu.models.torch_export import unet_sd_from_params
    from ldmseg_tpu.models.torch_import import unet_params_from_sd

    small = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": [8, 16, 16, 32], "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8,
        },
        "train_kwargs": {"batch_size": 4, "train_num_steps": 1,
                         "weight_dtype": "bfloat16"},
        "sampling_kwargs": {"num_inference_steps": 2},
        "ignore_label": 0,
    })
    ucfg = UNetConfig(in_channels=8, out_channels=4,
                      block_out_channels=(16, 32), layers_per_block=1,
                      attention_head_dim=2, norm_num_groups=8,
                      attn_down=(True, True), use_cross_attention=False)
    ds = SyntheticDVPS(length=4, size=(64, 128), num_classes=20)
    batch = next(iter(Loader(ds, 4, shuffle=False)))

    # source run (bf16): its params round-trip through the torch
    # checkpoint layout, standing in for a reference training run
    tr_src = TrainerDiffusion(small, unet_config=ucfg,
                              results_folder=str(tmp_path / "src"))
    tr_src.init_state(batch, seed=0)
    sd = unet_sd_from_params(jax.device_get(tr_src.state.params), ucfg)
    imported = unet_params_from_sd(sd, ucfg)
    logits_bf, _ = tr_src.sample_panoptic(batch, jax.random.key(0),
                                          num_inference_steps=2)

    cfg_i8 = merge_dicts(small,
                         {"sampling_kwargs": {"int8_inference": True}})
    tr = TrainerDiffusion(cfg_i8, unet_config=ucfg,
                          results_folder=str(tmp_path / "i8"))
    tr.init_state(batch, seed=0, unet_params=imported)
    assert tr._params_pretrained and tr._int8_act_scales is None
    logits_i8, _ = tr.sample_panoptic(batch, jax.random.key(0),
                                      num_inference_steps=2)
    # auto-calibration ran and produced per-site scales
    assert tr._int8_act_scales
    corr = np.corrcoef(np.asarray(logits_bf, np.float32).ravel(),
                       np.asarray(logits_i8, np.float32).ravel())[0, 1]
    assert corr > 0.98, corr

    # opting out without scales must fail loudly, not sample silently
    cfg_no = merge_dicts(cfg_i8, {"sampling_kwargs":
                                  {"int8_auto_calibrate": False}})
    tr2 = TrainerDiffusion(cfg_no, unet_config=ucfg,
                           results_folder=str(tmp_path / "i8no"))
    tr2.init_state(batch, seed=0, unet_params=imported)
    with pytest.raises(RuntimeError, match="int8"):
        tr2.sample_panoptic(batch, jax.random.key(0),
                            num_inference_steps=2)
