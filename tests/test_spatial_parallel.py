"""Spatial parallelism (parallel/sp.py): H-sharding the full-res VAE
stages over the model mesh axis must be numerically identical to the
unsharded path — GSPMD inserts the conv halo exchanges and GroupNorm
cross-shard reductions; the math must not change. No reference
equivalent (its only parallelism is DDP) — TPU-native extension.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ldmseg_tpu.models import SegVAE
from ldmseg_tpu.parallel import make_mesh
from ldmseg_tpu.parallel.sp import (
    spatial_constraint, batch_constraint, has_spatial_axis, spatial_spec)

pytestmark = pytest.mark.slow

CFG = dict(
    in_channels=10,
    int_channels=64,
    out_channels=32,
    block_out_channels=(8, 16, 32, 64),
    latent_channels=4,
    norm_num_groups=8,
    num_upscalers=2,
    upscale_channels=64,
    num_latents=2,
)


def _model_and_params(h=64, w=64):
    model = SegVAE(**CFG)
    x = jnp.zeros((1, h, w, CFG["in_channels"]))
    params = model.init({"params": jax.random.key(0)}, x,
                        sample_posterior=False)
    return model, params


def test_spatial_spec_and_gates():
    assert spatial_spec(4) == P("data", "model", None, None)
    mesh_dp = make_mesh(num_data=8, num_model=1)
    mesh_sp = make_mesh(num_data=2, num_model=4)
    assert not has_spatial_axis(mesh_dp)
    assert has_spatial_axis(mesh_sp)
    # no-op gates: model axis 1, indivisible H, low rank
    x = jnp.ones((2, 7, 5, 3))
    assert spatial_constraint(x, mesh_dp) is x
    assert spatial_constraint(jnp.ones((2, 7, 5, 3)), mesh_sp).shape == \
        (2, 7, 5, 3)  # H=7 % 4 != 0 -> unconstrained passthrough


def test_sp_encode_matches_unsharded():
    """SegVAE encode under an H-sharding constraint on a (2, 4) mesh ==
    the single-spec result (conv halos are a layout detail)."""
    mesh = make_mesh(num_data=2, num_model=4)
    model, params = _model_and_params()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 10),
                    jnp.float32)

    def encode_plain(p, x):
        return model.apply(p, x, method=SegVAE.encode).mode()

    def encode_sp(p, x):
        xs = spatial_constraint(x, mesh)
        z = model.apply(p, xs, method=SegVAE.encode).mode()
        return batch_constraint(z, mesh)

    ref = jax.jit(encode_plain)(params, x)
    xin = jax.device_put(x, NamedSharding(mesh, P("data")))
    pin = jax.device_put(params, NamedSharding(mesh, P()))
    out = jax.jit(encode_sp)(pin, xin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sp_decode_matches_unsharded():
    """Full-res decode with the output H-sharded == unsharded decode."""
    mesh = make_mesh(num_data=2, num_model=4)
    model, params = _model_and_params()
    z = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 4),
                    jnp.float32)

    def dec_plain(p, z):
        return model.apply(p, z, True, method=SegVAE.decode)

    def dec_sp(p, z):
        out = model.apply(p, z, True, method=SegVAE.decode)
        return spatial_constraint(out, mesh)

    ref = jax.jit(dec_plain)(params, z)
    zin = jax.device_put(z, NamedSharding(mesh, P("data")))
    pin = jax.device_put(params, NamedSharding(mesh, P()))
    out = jax.jit(dec_sp)(pin, zin)
    # GSPMD trims trailing Nones from the spec
    assert tuple(out.sharding.spec) == ("data", "model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_trainer_encode_with_spatial_parallel(tmp_path):
    """TrainerDiffusion on a (2, 4) mesh with spatial_parallel=True:
    the jitted encode path compiles and matches the DP-only trainer."""
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.models import UNetConfig
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

    cfg = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": [8, 16, 16, 32], "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8,
        },
        "train_kwargs": {"batch_size": 8},
        "ignore_label": 0,
    })
    tiny_unet = UNetConfig(
        in_channels=8, out_channels=4, block_out_channels=(8, 16, 16, 32),
        layers_per_block=1, cross_attention_dim=16, attention_head_dim=2,
        norm_num_groups=4, use_cross_attention=False)
    ds = SyntheticDVPS(length=8, size=(64, 128), num_classes=20)
    batch = next(iter(Loader(ds, 8, shuffle=False)))

    def build(spatial):
        c = {**cfg, "spatial_parallel": spatial}
        tr = TrainerDiffusion(
            c, unet_config=tiny_unet, dataset=ds, val_dataset=ds,
            mesh=make_mesh(num_data=2, num_model=4),
            results_folder=str(tmp_path / ("sp" if spatial else "dp")))
        tr.init_state(batch)
        return tr

    jb = {k: jnp.asarray(batch[k])
          for k in ("image", "image_semseg", "semseg", "mask")}

    tr_sp = build(True)
    assert tr_sp.spatial_parallel
    _, mean_sp, rgb_sp, _ = tr_sp._encode(
        tr_sp.frozen_params, jb, jax.random.key(7))

    tr_dp = build(False)
    assert not tr_dp.spatial_parallel
    _, mean_dp, rgb_dp, _ = tr_dp._encode(
        tr_dp.frozen_params, jb, jax.random.key(7))

    np.testing.assert_allclose(np.asarray(mean_sp), np.asarray(mean_dp),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb_sp), np.asarray(rgb_dp),
                               rtol=1e-2, atol=1e-2)  # bf16 RGB path


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
