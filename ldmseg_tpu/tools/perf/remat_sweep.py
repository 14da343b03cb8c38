"""Train-step throughput under different remat settings (real TPU).

With the flash-style attention backward landed (no [BH,T,T] HBM round
trip), activation memory is much lower and full recompute may no longer
be the right default. Measures samples/s for: full remat (None policy),
remat keeping weight-matmul outputs, and no remat at all.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ldmseg_tpu.models import UNet2DCondition, UNetConfig  # noqa: E402
from ldmseg_tpu.diffusion import make_ddim_schedule, add_noise  # noqa: E402

import os
batch, lh, lw = int(os.environ.get("REMAT_SWEEP_BATCH", "16")), 32, 64
dtype = jnp.bfloat16
sched = make_ddim_schedule(beta_schedule="scaled_linear",
                           beta_start=0.00085, beta_end=0.012,
                           clip_sample=False, set_alpha_to_one=False)


def measure(gc, policy):
    cfg = UNetConfig(in_channels=8, use_cross_attention=False,
                     use_fused_attention=True, gradient_checkpointing=gc,
                     remat_policy=policy)
    unet = UNet2DCondition(config=cfg)
    p = jax.jit(unet.init)(jax.random.key(0),
                           jnp.zeros((1, lh, lw, 8), dtype),
                           jnp.zeros((1,), jnp.int32))
    p = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype")
        and x.dtype == jnp.float32 else x, p)
    tx = optax.adafactor(1e-4)
    opt_state = jax.jit(tx.init)(p)

    def loss_fn(params, noisy, t, noise):
        pred = unet.apply(params, noisy, t).astype(jnp.float32)
        return jnp.mean((pred - noise.astype(jnp.float32)) ** 2)

    @jax.jit
    def train_step(params, opt_state, latents, rgbl, key):
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (batch,), 0, 1000)
        noise = jax.random.normal(kn, latents.shape, jnp.float32)
        noisy = add_noise(sched, latents.astype(jnp.float32), noise, t)
        inp = jnp.concatenate([noisy.astype(dtype), rgbl], axis=-1)
        loss, grads = jax.value_and_grad(loss_fn)(params, inp, t, noise)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    latents = jax.random.normal(jax.random.key(7), (batch, lh, lw, 4))
    rgbl = jax.random.normal(jax.random.key(8), (batch, lh, lw, 4), dtype)
    p, opt_state, loss = train_step(p, opt_state, latents, rgbl,
                                    jax.random.key(9))
    np.asarray(loss)
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        p, opt_state, loss = train_step(p, opt_state, latents, rgbl,
                                        jax.random.key(10 + i))
    np.asarray(loss)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


configs = [("full-remat", True, None),
           ("remat-dots-saved", True, "dots_with_no_batch_dims_saveable"),
           ("no-remat", False, None)]
if len(sys.argv) > 1:
    configs = [c for c in configs if c[0] in sys.argv[1:]]
for name, gc, policy in configs:
    try:
        sps = measure(gc, policy)
        print(f"{name:18s} {sps:7.2f} samples/s")
    except Exception as e:  # OOM etc — report and continue
        print(f"{name:18s} FAILED {type(e).__name__}: {str(e)[:120]}")
    jax.clear_caches()
    import gc as _gc
    _gc.collect()
