"""e2e stage breakdown of the bench pipeline at the current config."""
import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ldmseg_tpu.models import (
        SegVAE, ImageVAE, UNet2DCondition, UNetConfig)
    from ldmseg_tpu.diffusion import make_ddim_schedule, ddim_sample
    from ldmseg_tpu.ops.quant import prequantize_conv_tree

    batch = 16
    h, w = 256, 512
    lh, lw = h // 8, w // 8
    dtype = jnp.bfloat16

    unet_cfg = UNetConfig(in_channels=8, use_cross_attention=False,
                          use_padded_attention=True, use_fused_norms=True,
                          use_int8_conv=True, int8_act_scale=0.05,
                          use_int8_ff=True, use_fused_ff=True,
                          int8_attn_act_scale=0.1)
    unet = UNet2DCondition(config=unet_cfg)
    vae_img = ImageVAE(decoder_enabled=False, use_fused_attention=True,
                       use_int8=True, int8_act_scale=0.05)
    vae_seg = SegVAE(in_channels=16, out_channels=128, num_upscalers=2)

    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    unet_params = jax.jit(unet.init)(
        k1, jnp.zeros((1, lh, lw, 8), dtype), jnp.zeros((1,), jnp.int32))
    img_params = jax.jit(functools.partial(
        vae_img.init, method=ImageVAE.encode))(
        k2, jnp.zeros((1, h, w, 3), dtype))
    seg_params = jax.jit(functools.partial(
        vae_seg.init, sample_posterior=False))(
        {"params": k3, "sample": k4}, jnp.zeros((1, h, w, 16), dtype))

    cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(dtype) if hasattr(x, "dtype")
        and x.dtype == jnp.float32 else x, t)
    unet_params, img_params, seg_params = (
        cast(unet_params), cast(img_params), cast(seg_params))
    unet_params = jax.jit(functools.partial(
        prequantize_conv_tree, quantize_ff=True,
        absorbed_attention=True, attention_heads=8))(unet_params)
    img_params = jax.jit(prequantize_conv_tree)(img_params)

    sched = make_ddim_schedule(
        beta_schedule="scaled_linear", beta_start=0.00085, beta_end=0.012,
        clip_sample=False, set_alpha_to_one=False)

    @jax.jit
    def enc(img_params, rgb):
        post = vae_img.apply(img_params, rgb, method=ImageVAE.encode)
        return post.mode().astype(dtype) * 0.18215

    @jax.jit
    def scan(unet_params, rgb_latents, key):
        def model_fn(latents, condition, t):
            inp = jnp.concatenate(
                [latents.astype(dtype), rgb_latents], axis=-1)
            return unet.apply(unet_params, inp, t).astype(jnp.float32)
        init = jax.random.normal(key, (batch, lh, lw, 4))
        return ddim_sample(sched, model_fn, init, num_inference_steps=50)

    @jax.jit
    def dec(seg_params, x0):
        z = (x0 * (1.0 / 0.2)).astype(dtype)
        return vae_seg.apply(seg_params, z, True, method=SegVAE.decode)

    rgb = jax.random.normal(jax.random.key(1), (batch, h, w, 3),
                            dtype=dtype)

    rl = enc(img_params, rgb)
    x0 = scan(unet_params, rl, jax.random.key(2))
    lg = dec(seg_params, x0)
    np.asarray(lg.ravel()[0])

    def bench(fn, *a, iters=5):
        out = fn(*a)
        np.asarray(out.ravel()[0] if hasattr(out, 'ravel')
                   else out[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        np.asarray(out.ravel()[0] if hasattr(out, 'ravel')
                   else out[0].ravel()[0])
        return (time.perf_counter() - t0) / iters

    t_enc = bench(enc, img_params, rgb)
    t_scan = bench(scan, unet_params, rl, jax.random.key(2), iters=3)
    t_dec = bench(dec, seg_params, x0)
    print(f"encode  {t_enc*1e3:8.1f} ms")
    print(f"scan50  {t_scan*1e3:8.1f} ms  ({t_scan*1e3/50:.2f} ms/step)")
    print(f"decode  {t_dec*1e3:8.1f} ms")
    tot = t_enc + t_scan + t_dec
    print(f"total   {tot*1e3:8.1f} ms -> {batch/tot:.2f} f/s")


if __name__ == "__main__":
    main()
