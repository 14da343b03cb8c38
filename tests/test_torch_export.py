"""Reference-format checkpoint EXPORT round-trip.

``torch_export`` writes the fork's stage-2 save dict (reference
construct_save_dict, trainers_ldm_cond.py:1844-1877) and the stage-1
GeneralVAESeg state dict from our flax trees; loading them back through
``torch_import`` must reproduce the source trees exactly — guaranteeing
a model trained here is consumable by torch/diffusers tooling.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldmseg_tpu.models import UNet2DCondition, UNetConfig, ImageVAE, SegVAE

UCFG = UNetConfig(in_channels=8, out_channels=4,
                  block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                  cross_attention_dim=16, attention_head_dim=2,
                  norm_num_groups=4, use_cross_attention=False)
SEG_BOC = (8, 16, 16, 32)


def _trees_equal(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x, np.float32),
                                      np.asarray(y, np.float32))


def _small_trees():
    unet = UNet2DCondition(config=UCFG)
    up = unet.init(jax.random.key(0), jnp.zeros((1, 8, 16, 8)),
                   jnp.zeros((1,), jnp.int32))
    vimg = ImageVAE(block_out_channels=(32, 32, 32, 32),
                    decoder_enabled=False)
    ip = vimg.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)),
                   method=ImageVAE.encode)
    vseg = SegVAE(in_channels=10, out_channels=32,
                  block_out_channels=SEG_BOC, num_upscalers=2)
    import functools
    sp = jax.jit(functools.partial(vseg.init, sample_posterior=False))(
        {"params": jax.random.key(2), "sample": jax.random.key(3)},
        jnp.zeros((1, 64, 64, 10)))
    return up, ip, sp


def test_reference_ldm_export_roundtrip(tmp_path):
    pytest.importorskip("torch")
    from ldmseg_tpu.models.torch_export import export_reference_ldm
    from ldmseg_tpu.models.torch_import import load_reference_ldm

    up, ip, sp = _small_trees()
    ema = jax.tree_util.tree_map(lambda x: x + 0.5, up)
    path = str(tmp_path / "model.pt")
    export_reference_ldm(path, up, ip, sp, UCFG,
                         block_out_channels=SEG_BOC, num_upscalers=2,
                         ema_params=ema, step=123, epoch=4)

    back = load_reference_ldm(path, UCFG, block_out_channels=SEG_BOC,
                              num_upscalers=2)
    assert back["step"] == 123
    _trees_equal(back["unet"], up)
    _trees_equal(back["vae_image"], ip)
    _trees_equal(back["vae_semseg"], sp)
    _trees_equal(back["ema"], ema)


def test_seg_vae_export_matches_reference_loader(tmp_path):
    """Stage-1 export: the torch dict loads through the stage-1 importer
    (module.-prefixed, {'vae': ...} wrapped — the trainers_ae.py:534-548
    layout)."""
    torch = pytest.importorskip("torch")
    from ldmseg_tpu.models.torch_export import seg_vae_sd_from_params
    from ldmseg_tpu.models.torch_import import load_reference_seg_vae

    _, _, sp = _small_trees()
    sd = seg_vae_sd_from_params(sp, SEG_BOC, num_upscalers=2)
    wrapped = {"vae": {f"module.{k}": torch.from_numpy(
        np.ascontiguousarray(v)) for k, v in sd.items()}}
    path = str(tmp_path / "ae.pt")
    torch.save(wrapped, path)
    back = load_reference_seg_vae(path, SEG_BOC, num_upscalers=2)
    _trees_equal(back, sp)


def test_export_rejects_prequantized_tree():
    from ldmseg_tpu.ops.quant import prequantize_conv_tree
    from ldmseg_tpu.models.torch_export import unet_sd_from_params
    up, _, _ = _small_trees()
    with pytest.raises(ValueError, match="prequantized"):
        unet_sd_from_params(prequantize_conv_tree(up), UCFG)


def test_exported_unet_numerics(tmp_path):
    """Export -> import -> apply reproduces the source model's output
    bit-for-bit (the transposes/flips are exact inverses)."""
    pytest.importorskip("torch")
    from ldmseg_tpu.models.torch_export import export_reference_ldm
    from ldmseg_tpu.models.torch_import import load_reference_ldm

    up, ip, sp = _small_trees()
    path = str(tmp_path / "model.pt")
    export_reference_ldm(path, up, ip, sp, UCFG,
                         block_out_channels=SEG_BOC, num_upscalers=2)
    back = load_reference_ldm(path, UCFG, block_out_channels=SEG_BOC,
                              num_upscalers=2)
    unet = UNet2DCondition(config=UCFG)
    x = jax.random.normal(jax.random.key(5), (2, 8, 16, 8))
    t = jnp.array([1, 9], jnp.int32)
    y0 = np.asarray(unet.apply(up, x, t))
    y1 = np.asarray(unet.apply(back["unet"], x, t))
    np.testing.assert_array_equal(y0, y1)


def test_trainer_export_reference(tmp_path):
    """TrainerDiffusion.export_reference writes a torch save dict that
    warm-starts the importer with the trainer's exact weights."""
    pytest.importorskip("torch")
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.models.torch_import import load_reference_ldm
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

    cfg = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": list(SEG_BOC), "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8},
        "train_kwargs": {"batch_size": 4, "train_num_steps": 1},
        "ignore_label": 0})
    ds = SyntheticDVPS(length=4, size=(64, 128), num_classes=20)
    tr = TrainerDiffusion(cfg, unet_config=UCFG, dataset=ds,
                          results_folder=str(tmp_path))
    tr.init_state(next(iter(Loader(ds, 4, shuffle=False))))
    path = tr.export_reference(str(tmp_path / "export.pt"))
    back = load_reference_ldm(path, UCFG, block_out_channels=SEG_BOC,
                              num_upscalers=2)
    _trees_equal(back["unet"], jax.device_get(tr.state.params))
    _trees_equal(back["vae_semseg"],
                 jax.device_get(tr.frozen_params["vae_seg"]))


def test_trainer_ae_export_reference(tmp_path):
    """TrainerAE.export_reference writes the stage-1 {'vae': ...} dict
    the reference's own load path (and our stage-1 importer) consumes."""
    pytest.importorskip("torch")
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.train.trainer_ae import TrainerAE
    from ldmseg_tpu.models.torch_import import load_reference_seg_vae
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

    cfg = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": list(SEG_BOC), "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8},
        "train_kwargs": {"batch_size": 4, "train_num_steps": 1},
        "ignore_label": 0})
    ds = SyntheticDVPS(length=4, size=(64, 128), num_classes=20)
    tr = TrainerAE(cfg, dataset=ds, results_folder=str(tmp_path))
    tr.init_state(next(iter(Loader(ds, 4, shuffle=False))))
    path = tr.export_reference(str(tmp_path / "ae.pt"))
    back = load_reference_seg_vae(path, SEG_BOC, num_upscalers=2)
    _trees_equal(back, jax.device_get(tr.state.params))


def test_export_checkpoint_cli(tmp_path):
    """End-to-end: prepare_config run dir -> orbax save -> CLI rebuilds
    the trainer from config.json, restores, and writes the reference
    torch dict."""
    pytest.importorskip("torch")
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.models.torch_import import load_reference_ldm
    from ldmseg_tpu.tools.export_checkpoint import main as export_main
    from ldmseg_tpu.utils.config import (
        DEFAULT_CONFIG, merge_dicts, prepare_config)

    cfg = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": list(SEG_BOC), "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8},
        "model_kwargs": {
            "in_channels": 8, "block_out_channels": [8, 16, 16, 32],
            "layers_per_block": 1, "cross_attention_dim": 16,
            "attention_head_dim": 2, "norm_num_groups": 4},
        "train_kwargs": {"batch_size": 2, "train_num_steps": 1},
        "ignore_label": 0})
    cfg = prepare_config(cfg, str(tmp_path), run_idx=7)
    run_dir = cfg["output_dir"]

    ds = SyntheticDVPS(length=2, size=(64, 128), num_classes=20)
    from ldmseg_tpu.tools.main_ldm import build_unet_config
    tr = TrainerDiffusion(cfg, unet_config=build_unet_config(cfg),
                          dataset=ds,
                          results_folder=cfg["checkpoint_dir"])
    tr.init_state(next(iter(Loader(ds, 2, shuffle=False))))
    tr.save(step=5)
    src = jax.device_get(tr.state.params)

    out = str(tmp_path / "exported.pt")
    export_main(["--run_dir", run_dir, "--out", out])
    back = load_reference_ldm(out, tr.unet_config,
                              block_out_channels=SEG_BOC,
                              num_upscalers=2)
    _trees_equal(back["unet"], src)
