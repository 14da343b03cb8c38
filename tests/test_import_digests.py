"""Golden digests for the torch-checkpoint import paths.

The round-trip tests (test_unet_blocks_parity.py) prove import(export(x))
== x, but a consistent error in BOTH directions would cancel. This test
freezes the import direction alone: a committed fixture records (a) the
exact torch-side key names + shapes the importers consume (reviewable
against the diffusers / reference layouts: conv [O,I,kh,kw], dense
[out,in], the fork's `module.<idx>` Sequential names —
/root/reference/ldmseg/trainers/trainers_ldm_cond.py:1844-1877) and (b)
a position-weighted digest of every leaf of the imported JAX tree built
from crc32-seeded values. Any change to key handling or layout
transposes shifts flat element order and breaks the digest.

Regenerate after an INTENTIONAL importer change with:
    python tests/test_import_digests.py --regen
"""

import functools
import json
import os
import zlib

import numpy as np
import jax
import jax.numpy as jnp

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "import_digests.json")

UNET_CFG = dict(in_channels=4, out_channels=4,
                block_out_channels=(8, 16, 16, 32), layers_per_block=2,
                cross_attention_dim=16, attention_head_dim=2,
                norm_num_groups=4, use_cross_attention=True)
SVAE_CFG = dict(in_channels=10, int_channels=16, out_channels=16,
                block_out_channels=(8, 8, 16, 16), latent_channels=4,
                norm_num_groups=4, num_upscalers=2, upscale_channels=16)
IVAE_CFG = dict(block_out_channels=(32, 32, 32, 32),
                latent_channels=4, decoder_enabled=False)


def _seeded_value(name, shape):
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    return rng.standard_normal(shape, dtype=np.float32) * 0.05


def _build_sd(keys):
    import torch
    return {name: torch.from_numpy(_seeded_value(name, shape))
            for name, shape in keys.items()}


def _digest(x):
    flat = np.asarray(x, np.float64).ravel()
    w = ((np.arange(flat.size) * 2654435761) % 1000003) / 1000003.0
    return float(flat @ w)


def _tree_digests(tree):
    out = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(tree):
        out[jax.tree_util.keystr(kp)] = _digest(leaf)
    return out


def _import_all(tmp_dir, keys_unet, keys_ivae, keys_svae):
    import torch
    from ldmseg_tpu.models import UNetConfig
    from ldmseg_tpu.models.torch_import import (
        load_diffusers_unet, load_diffusers_vae, load_reference_seg_vae)

    os.makedirs(os.path.join(tmp_dir, "unet"), exist_ok=True)
    os.makedirs(os.path.join(tmp_dir, "vae"), exist_ok=True)
    torch.save(_build_sd(keys_unet),
               os.path.join(tmp_dir, "unet", "diffusion_pytorch_model.bin"))
    torch.save(_build_sd(keys_ivae),
               os.path.join(tmp_dir, "vae", "diffusion_pytorch_model.bin"))
    torch.save({"vae": _build_sd(keys_svae)},
               os.path.join(tmp_dir, "segvae.pt"))

    unet_tree = load_diffusers_unet(tmp_dir, UNetConfig(**UNET_CFG))
    ivae_tree = load_diffusers_vae(tmp_dir, decoder_enabled=False)
    svae_tree = load_reference_seg_vae(
        os.path.join(tmp_dir, "segvae.pt"),
        SVAE_CFG["block_out_channels"], SVAE_CFG["num_upscalers"])
    return {"unet": _tree_digests(unet_tree),
            "image_vae": _tree_digests(ivae_tree),
            "seg_vae": _tree_digests(svae_tree)}


def test_import_golden_digests(tmp_path):
    with open(FIXTURE) as fh:
        fx = json.load(fh)
    keys = {k: {n: tuple(s) for n, s in fx["keys"][k].items()}
            for k in ("unet", "image_vae", "seg_vae")}
    got = _import_all(str(tmp_path), keys["unet"], keys["image_vae"],
                      keys["seg_vae"])
    for part, want in fx["digests"].items():
        assert set(got[part]) == set(want), (
            f"{part}: imported tree paths changed — if intentional, "
            f"regenerate with `python {__file__} --regen`")
        for path, d in want.items():
            assert np.isclose(got[part][path], d, rtol=1e-9, atol=1e-9), (
                f"{part}{path}: digest {got[part][path]!r} != golden {d!r}"
                " — the import mapping changed for this leaf")


def _enumerate_keys():
    """One-time fixture generation: enumerate the torch-side key names +
    shapes via the reverse-map test helpers (names/shapes only — the
    committed fixture is then independent of them)."""
    import test_unet_blocks_parity as rt
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig, SegVAE
    from ldmseg_tpu.models.torch_import import seg_vae_key_map

    unet = UNet2DCondition(config=UNetConfig(**UNET_CFG))
    up = jax.jit(unet.init)(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 3, 16)))
    unet_sd = rt._unet_sd_from_params(up["params"])

    from ldmseg_tpu.models import ImageVAE
    ivae = ImageVAE(**IVAE_CFG)
    ip = jax.jit(functools.partial(ivae.init, method=ImageVAE.encode))(
        jax.random.key(1), jnp.zeros((1, 32, 32, 3)))
    iv = ip["params"]
    ivae_sd = {}
    rt._put_conv(ivae_sd, "encoder.conv_in", iv["encoder"]["conv_in"])
    for i in range(len(IVAE_CFG["block_out_channels"])):
        blk = iv["encoder"][f"down{i}"]
        for j in range(2):
            rt._put_resnet(ivae_sd, f"encoder.down_blocks.{i}.resnets.{j}",
                           blk[f"resnet{j}"])
        if "downsample" in blk:
            rt._put_conv(ivae_sd,
                         f"encoder.down_blocks.{i}.downsamplers.0.conv",
                         blk["downsample"])
    rt._put_resnet(ivae_sd, "encoder.mid_block.resnets.0",
                   iv["encoder"]["mid_resnet0"])
    rt._put_resnet(ivae_sd, "encoder.mid_block.resnets.1",
                   iv["encoder"]["mid_resnet1"])
    ma = iv["encoder"]["mid_attn"]
    rt._put_norm(ivae_sd, "encoder.mid_block.attentions.0.group_norm",
                 ma["group_norm"])
    for nm, tnm in (("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"),
                    ("to_out", "to_out.0")):
        rt._put_dense(ivae_sd, f"encoder.mid_block.attentions.0.{tnm}",
                      ma[nm])
    rt._put_norm(ivae_sd, "encoder.conv_norm_out", iv["encoder"]["norm_out"])
    rt._put_conv(ivae_sd, "encoder.conv_out", iv["encoder"]["conv_out"])
    rt._put_conv(ivae_sd, "quant_conv", iv["quant_conv"])

    svae = SegVAE(**SVAE_CFG)
    sp = jax.jit(
        lambda k, x: svae.init({"params": k, "sample": jax.random.key(0)},
                               x, sample_posterior=False))(
        jax.random.key(2), jnp.zeros((1, 32, 32, 10)))
    keymap = seg_vae_key_map(SVAE_CFG["block_out_channels"],
                             SVAE_CFG["num_upscalers"])
    svae_sd = {}
    for src, (group, name, kind) in keymap.items():
        leaf = sp["params"][group][name]
        if kind == "conv":
            w = np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1)
        elif kind == "convt":
            w = np.asarray(leaf["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1)
        elif kind == "norm":
            w = np.asarray(leaf["scale"])
        else:
            w = np.asarray(leaf["ln"]["scale"])
        b = (np.asarray(leaf["bias"]) if kind in ("conv", "convt", "norm")
             else np.asarray(leaf["ln"]["bias"]))
        svae_sd[f"module.{src}.weight"] = w
        svae_sd[f"module.{src}.bias"] = b

    def shapes(sd):
        return {k: list(np.asarray(v).shape) for k, v in sd.items()}
    return {"unet": shapes(unet_sd), "image_vae": shapes(ivae_sd),
            "seg_vae": shapes(svae_sd)}


if __name__ == "__main__":
    import sys
    import tempfile
    sys.path.insert(0, os.path.dirname(__file__))
    assert "--regen" in sys.argv
    keys = _enumerate_keys()
    with tempfile.TemporaryDirectory() as td:
        digests = _import_all(
            td, {n: tuple(s) for n, s in keys["unet"].items()},
            {n: tuple(s) for n, s in keys["image_vae"].items()},
            {n: tuple(s) for n, s in keys["seg_vae"].items()})
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as fh:
        json.dump({"keys": keys, "digests": digests}, fh, indent=1,
                  sort_keys=True)
    n = sum(len(v) for v in digests.values())
    print(f"wrote {FIXTURE}: {n} leaf digests")
