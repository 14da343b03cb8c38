"""SegVAE parity tests against a torch re-derivation of the reference
architecture (ldmseg/models/vae.py:124-245): we build the same Sequential
stack in torch, copy the flax weights into it, and require matching
outputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from ldmseg_tpu.models import SegVAE

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


class TorchLayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


def build_torch_encoder(cfg):
    boc, ic = cfg["block_out_channels"], cfg["int_channels"]
    layers = [nn.Conv2d(cfg["in_channels"], boc[0], 3, padding=1), nn.SiLU()]
    for i in range(len(boc) - 1):
        layers += [
            nn.Conv2d(boc[i], boc[i], 3, padding=1),
            nn.Conv2d(boc[i], boc[i + 1], 3, padding=1, stride=2),
            nn.SiLU(),
        ]
    layers += [nn.Conv2d(boc[-1], ic, 3, padding=1)]
    layers += [
        nn.GroupNorm(cfg["norm_num_groups"], ic, eps=1e-6),
        nn.SiLU(),
        nn.Conv2d(ic, cfg["latent_channels"] * cfg["num_latents"], 3,
                  padding=1),
    ]
    return nn.Sequential(*layers)


def build_torch_decoder(cfg):
    ic, uc = cfg["int_channels"], cfg["upscale_channels"]
    layers = [nn.Conv2d(cfg["latent_channels"], ic, 3, padding=1)]
    for i in range(cfg["num_upscalers"]):
        cin = ic if i == 0 else uc
        layers += [nn.ConvTranspose2d(cin, uc, 2, stride=2),
                   TorchLayerNorm2d(uc), nn.SiLU()]
    layers += [nn.GroupNorm(cfg["norm_num_groups"], uc), nn.SiLU(),
               nn.Conv2d(uc, cfg["out_channels"], 3, padding=1)]
    return nn.Sequential(*layers)


def _copy_conv(tconv, fparams):
    tconv.weight.data = torch.from_numpy(
        np.asarray(fparams["kernel"]).transpose(3, 2, 0, 1).copy())
    tconv.bias.data = torch.from_numpy(np.asarray(fparams["bias"]).copy())


def _copy_convt(tconv, fparams):
    # flax ConvTranspose kernels are spatially flipped relative to torch
    # ConvTranspose2d (lax.conv_transpose correlates, torch convolves)
    tconv.weight.data = torch.from_numpy(
        np.asarray(fparams["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1).copy())
    tconv.bias.data = torch.from_numpy(np.asarray(fparams["bias"]).copy())


def _copy_norm(tnorm, fparams):
    tnorm.weight.data = torch.from_numpy(np.asarray(fparams["scale"]).copy())
    tnorm.bias.data = torch.from_numpy(np.asarray(fparams["bias"]).copy())


def _init_flax(cfg, h=64, w=64):
    model = SegVAE(**cfg)
    x = jnp.zeros((1, h, w, cfg["in_channels"]))
    params = model.init({"params": jax.random.key(0)}, x,
                        sample_posterior=False)
    return model, params


def _sync_torch_from_flax(params, cfg):
    enc = build_torch_encoder(cfg)
    dec = build_torch_decoder(cfg)
    p = params["params"]["encoder"]
    n_down = len(cfg["block_out_channels"]) - 1
    _copy_conv(enc[0], p["in_conv"])
    li = 2
    for i in range(n_down):
        _copy_conv(enc[li], p[f"down{i}_conv1"])
        _copy_conv(enc[li + 1], p[f"down{i}_conv2"])
        li += 3
    _copy_conv(enc[li], p["out_conv1"])
    _copy_norm(enc[li + 1], p["norm"])
    _copy_conv(enc[li + 3], p["out_conv2"])

    p = params["params"]["decoder"]
    _copy_conv(dec[0], p["in_conv"])
    li = 1
    for i in range(cfg["num_upscalers"]):
        _copy_convt(dec[li], p[f"up{i}_convt"])
        _copy_norm(dec[li + 1], p[f"up{i}_ln"]["ln"])
        li += 3
    _copy_norm(dec[li], p["norm"])
    _copy_conv(dec[li + 2], p["out_conv"])
    return enc, dec


def test_encoder_decoder_parity():
    cfg = dict(CFG)
    model, params = _init_flax(cfg)
    enc, dec = _sync_torch_from_flax(params, cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, cfg["in_channels"], 64, 64).astype(np.float32)

    with torch.no_grad():
        t_moments = enc(torch.from_numpy(x)).numpy()
    f_post = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         method=SegVAE.encode)
    f_moments = np.concatenate(
        [np.asarray(f_post.mean), np.asarray(f_post.logvar)], axis=-1)
    np.testing.assert_allclose(f_moments.transpose(0, 3, 1, 2), t_moments,
                               rtol=1e-4, atol=1e-4)

    z = rng.randn(2, cfg["latent_channels"], 8, 8).astype(np.float32)
    with torch.no_grad():
        t_dec = dec(torch.from_numpy(z)).numpy()
        # reference decode() applies bilinear x interpolation_factor
        # (vae.py:268-272); num_upscalers=2 -> factor 2
        t_dec_interp = F.interpolate(torch.from_numpy(t_dec), scale_factor=2,
                                     mode="bilinear",
                                     align_corners=False).numpy()
    f_dec = model.apply(params, jnp.asarray(z.transpose(0, 2, 3, 1)), False,
                        method=SegVAE.decode)
    np.testing.assert_allclose(np.asarray(f_dec).transpose(0, 3, 1, 2), t_dec,
                               rtol=1e-4, atol=1e-4)
    f_dec_i = model.apply(params, jnp.asarray(z.transpose(0, 2, 3, 1)), True,
                          method=SegVAE.decode)
    np.testing.assert_allclose(np.asarray(f_dec_i).transpose(0, 3, 1, 2),
                               t_dec_interp, rtol=1e-4, atol=1e-4)


def test_gaussian_kl_and_logvar_clamp():
    cfg = dict(CFG)
    model, params = _init_flax(cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64, cfg["in_channels"]).astype(np.float32))
    post = model.apply(params, x, method=SegVAE.encode)
    mean = np.asarray(post.mean)
    logvar = np.asarray(post.logvar)
    var = np.exp(logvar)
    ref_kl = 0.5 * np.sum(mean**2 + var - 1 - logvar, axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(post.kl()), ref_kl, rtol=1e-4)
    assert logvar.min() >= -30 and logvar.max() <= 20


def test_full_forward_shapes_and_determinism():
    cfg = dict(CFG)
    model, params = _init_flax(cfg)
    x = jnp.zeros((2, 64, 64, cfg["in_channels"]))
    dec, post = model.apply(params, x, sample_posterior=False)
    # decoder: latent 8x8, 2 upscalers -> 32x32 logits (no final interp in
    # forward, vae.py:303)
    assert dec.shape == (2, 32, 32, cfg["out_channels"])
    dec2, _ = model.apply(params, x, sample_posterior=True,
                          rngs={"sample": jax.random.key(0)})
    assert dec2.shape == dec.shape


def test_valid_mask_zeroes_latents():
    cfg = dict(CFG)
    model, params = _init_flax(cfg)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 64, 64, cfg["in_channels"]).astype(np.float32))
    mask = jnp.zeros((1, 8, 8))
    dec_masked, _ = model.apply(params, x, sample_posterior=False,
                                valid_mask=mask)
    dec_zero, _ = model.apply(params, jnp.zeros_like(x),
                              sample_posterior=False,
                              valid_mask=jnp.zeros((1, 8, 8)))
    np.testing.assert_allclose(np.asarray(dec_masked), np.asarray(dec_zero),
                               rtol=1e-5, atol=1e-5)


def test_bottleneck_variants():
    for param in ["auto", "discrete_gumbel_softmax", "discrete_codebook"]:
        cfg = dict(CFG)
        cfg["parametrization"] = param
        model = SegVAE(**cfg)
        x = jnp.zeros((1, 64, 64, cfg["in_channels"]))
        variables = model.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)}, x)
        dec, post = model.apply(variables, x,
                                rngs={"sample": jax.random.key(2)})
        assert dec.shape == (1, 32, 32, cfg["out_channels"])
        kl = post.kl()
        assert np.all(np.isfinite(np.asarray(kl)))


def test_skip_encoder_variant():
    cfg = dict(CFG)
    cfg["skip_encoder"] = True
    model, params = _init_flax(cfg)
    x = jnp.zeros((1, 64, 64, cfg["in_channels"]))
    post = model.apply(params, x, method=SegVAE.encode)
    assert post.mean.shape == (1, 8, 8, cfg["latent_channels"])


def test_shared_image_encoder_variant():
    """shared_vae_encoder (base.yaml:13): SegVAE built on the SD
    AutoencoderKL encoder topology; param subtree matches ImageVAE's
    encoder so SD weights drop in."""
    from ldmseg_tpu.models import SegVAE
    from ldmseg_tpu.models.image_vae import ImageVAE

    model = SegVAE(in_channels=3, out_channels=16, latent_channels=4,
                   num_latents=2, num_upscalers=2, upscale_channels=16,
                   int_channels=16, norm_num_groups=4, image_encoder=True)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(lambda k, xx: model.init(
        {"params": k, "sample": jax.random.key(0)}, xx,
        sample_posterior=False))(jax.random.key(0), x)
    dec, post = model.apply(params, x, sample_posterior=False)
    assert post.mean.shape == (1, 8, 8, 4)

    # identical encoder param paths as ImageVAE.encoder
    iv = ImageVAE(decoder_enabled=False)
    iv_params = jax.jit(lambda k, xx: iv.init(
        {"params": k}, xx, method=ImageVAE.encode))(
        jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    ours = {jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_leaves_with_path(
                params["params"]["encoder"])}
    theirs = {jax.tree_util.keystr(k)
              for k, _ in jax.tree_util.tree_leaves_with_path(
                  iv_params["params"]["encoder"])}
    assert ours == theirs
