"""UNet structural tests: shapes at non-square KITTI latents, surgery
transforms (conv_in expansion parity with unet.py:178-233 init modes),
cross-attn removal, separate conv/encoder paths, upscaler head.

Uses a tiny config — full SD-1.4 config is exercised in bench/graft entry.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ldmseg_tpu.models import (
    UNet2DCondition, UNetConfig, expand_conv_in, freeze_filter, PoseExpNet)

TINY = UNetConfig(
    in_channels=8,
    out_channels=4,
    block_out_channels=(8, 16, 16, 32),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_head_dim=2,
    norm_num_groups=4,
    use_cross_attention=False,
)


def _init(cfg, h=24, w=80, cin=None):
    model = UNet2DCondition(config=cfg)
    cin = cin if cin is not None else cfg.in_channels
    x = jnp.zeros((2, h, w, cin))
    # jit the init: unjitted flax init dispatches one slow compile per
    # param initializer in this environment. With cross attention on, init
    # must see a real context so to_k/to_v infer the context dim.
    args = [x, jnp.zeros((2,), jnp.int32)]
    if cfg.use_cross_attention:
        args.append(jnp.zeros((2, 7, cfg.cross_attention_dim)))
    params = jax.jit(model.init)(jax.random.key(0), *args)
    return model, params, x


def test_forward_nonsquare_kitti_latent():
    model, params, x = _init(TINY)
    out = model.apply(params, x, jnp.asarray([10, 500]))
    assert out.shape == (2, 24, 80, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_forward_256x512_latent():
    model, params, x = _init(TINY, h=32, w=64)
    out = model.apply(params, x, jnp.asarray(999))
    assert out.shape == (2, 32, 64, 4)


def test_cross_attention_toggle_changes_params():
    cfg_no = TINY
    cfg_yes = UNetConfig(**{**TINY.__dict__, "use_cross_attention": True})
    _, p_no, _ = _init(cfg_no)
    _, p_yes, _ = _init(cfg_yes)
    flat_no = jax.tree_util.tree_leaves_with_path(p_no)
    flat_yes = jax.tree_util.tree_leaves_with_path(p_yes)
    names_no = {jax.tree_util.keystr(k) for k, _ in flat_no}
    names_yes = {jax.tree_util.keystr(k) for k, _ in flat_yes}
    attn2 = {n for n in names_yes if "attn2" in n}
    assert attn2 and not any("attn2" in n for n in names_no)
    # with cross attention, context is consumed
    model = UNet2DCondition(config=cfg_yes)
    x = jnp.zeros((1, 24, 80, 8))
    ctx = jnp.ones((1, 7, 16))
    out = model.apply(p_yes, x, jnp.asarray(1), ctx)
    assert out.shape == (1, 24, 80, 4)


def test_expand_conv_in_modes():
    cfg4 = UNetConfig(**{**TINY.__dict__, "in_channels": 4})
    _, params4, _ = _init(cfg4, cin=4)
    base = np.asarray(params4["params"]["conv_in"]["kernel"])
    assert base.shape[2] == 4

    # copy/zero (the LDM config: init_mode_seg=copy, init_mode_image=zero,
    # base.yaml:38-40)
    p8 = expand_conv_in(params4, "copy", "zero")
    k8 = np.asarray(p8["params"]["conv_in"]["kernel"])
    assert k8.shape[2] == 8
    np.testing.assert_array_equal(k8[:, :, :4], base)
    np.testing.assert_array_equal(k8[:, :, 4:8], np.zeros_like(base))

    # mean / div
    p = expand_conv_in(params4, "mean", "div")
    k = np.asarray(p["params"]["conv_in"]["kernel"])
    np.testing.assert_allclose(
        k[:, :, :4], np.repeat(base.mean(axis=2, keepdims=True), 4, axis=2),
        rtol=1e-6)
    np.testing.assert_allclose(k[:, :, 4:8], base / 2.0, rtol=1e-6)

    # cond channels zero-init (train_diffusion.sh: cond_channels=4 w/ zero)
    p = expand_conv_in(params4, "copy", "copy", cond_channels=4,
                       init_mode_cond="zero")
    k = np.asarray(p["params"]["conv_in"]["kernel"])
    assert k.shape[2] == 12
    np.testing.assert_array_equal(k[:, :, 8:], np.zeros_like(base))

    # expanded params actually run (self-condition input layout)
    cfg12 = UNetConfig(**{**TINY.__dict__, "in_channels": 12})
    model = UNet2DCondition(config=cfg12)
    out = model.apply(p, jnp.zeros((1, 24, 80, 12)), jnp.asarray(0))
    assert out.shape == (1, 24, 80, 4)

    # bias preserved (unet.py:213)
    np.testing.assert_array_equal(
        np.asarray(p["params"]["conv_in"]["bias"]),
        np.asarray(params4["params"]["conv_in"]["bias"]))


def test_separate_conv_path():
    cfg = UNetConfig(**{**TINY.__dict__, "separate_conv": True})
    model, params, _ = _init(cfg, cin=8)
    names = {jax.tree_util.keystr(k)
             for k, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert any("conv_in_seg" in n for n in names)
    out = model.apply(params, jnp.zeros((1, 24, 80, 8)), jnp.asarray(5))
    assert out.shape == (1, 24, 80, 4)


def test_separate_encoder_path():
    cfg = UNetConfig(**{**TINY.__dict__, "separate_encoder": True,
                        "add_adaptor": True})
    model, params, _ = _init(cfg, cin=8)
    names = {jax.tree_util.keystr(k)
             for k, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert any("conv_in_img" in n for n in names)
    assert any("down_blocks_img" in n for n in names)
    assert any("adaptor" in n for n in names)
    out = model.apply(params, jnp.zeros((1, 24, 80, 8)), jnp.asarray(5),
                      timesteps_img=jnp.asarray(3))
    assert out.shape == (1, 24, 80, 4)


def test_upscaler_head():
    cfg = UNetConfig(**{**TINY.__dict__, "upscaler_classes": 12,
                        "upscaler_dim": 8})
    model, params, _ = _init(cfg)
    out = model.apply(params, jnp.zeros((1, 24, 80, 8)), jnp.asarray(0))
    assert out.shape == (1, 48, 160, 12)  # x2 upscale + class logits


def test_freeze_filter():
    _, params, _ = _init(TINY)
    flt = freeze_filter(("norm", "time_embedding"))
    frozen = [jax.tree_util.keystr(k)
              for k, _ in jax.tree_util.tree_leaves_with_path(params)
              if flt(k)]
    assert any("time_embedding" in n for n in frozen)
    assert any("norm" in n for n in frozen)
    assert not any("conv_out" in n for n in frozen)


def test_posenet():
    model = PoseExpNet(nb_ref_imgs=2, output_exp=True)
    tgt = jnp.zeros((1, 64, 192, 3))
    refs = [jnp.zeros((1, 64, 192, 3))] * 2
    params = model.init(jax.random.key(0), tgt, refs)
    masks, pose = model.apply(params, tgt, refs, train=True)
    assert pose.shape == (1, 2, 6)
    assert masks[0].shape[:3] == (1, 64, 192)  # full-res explainability
    exp1, pose_eval = model.apply(params, tgt, refs, train=False)
    assert pose_eval.shape == (1, 2, 6)


def test_odd_latent_sizes():
    """Latents whose spatial dims go odd mid-way (e.g. 12 -> 6 -> 3 -> 2)
    must round-trip through the up path via exact skip-size upsampling
    (the reference's forward_upsample_size, unet.py:297-299,:409-410)."""
    model, params, _ = _init(TINY, h=12, w=40)
    out = model.apply(params, jnp.zeros((2, 12, 40, 8)), jnp.asarray(0))
    assert out.shape == (2, 12, 40, 4)
    # 20-wide: 20 -> 10 -> 5 -> 3(ceil)
    model2, params2, _ = _init(TINY, h=16, w=20)
    out = model2.apply(params2, jnp.zeros((2, 16, 20, 8)), jnp.asarray(0))
    assert out.shape == (2, 16, 20, 4)
