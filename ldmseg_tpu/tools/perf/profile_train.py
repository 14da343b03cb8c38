"""Trace the bench training step (UNet fwd/bwd + adafactor) and
summarize op-time by name — the train-side sibling of profile_fwd.py."""
import functools  # noqa: F401
import glob
import gzip
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ldmseg_tpu.models import UNet2DCondition, UNetConfig  # noqa: E402
from ldmseg_tpu.diffusion import make_ddim_schedule, add_noise  # noqa: E402

batch, lh, lw = 16, 32, 64
dtype = jnp.bfloat16
cfg = UNetConfig(in_channels=8, use_cross_attention=False,
                 use_fused_attention=True,
                 gradient_checkpointing=os.environ.get(
                     "PROFILE_TRAIN_REMAT", "0") == "1")
unet = UNet2DCondition(config=cfg)
p = jax.jit(unet.init)(jax.random.key(0), jnp.zeros((1, lh, lw, 8), dtype),
                       jnp.zeros((1,), jnp.int32))
p = jax.tree_util.tree_map(
    lambda x: x.astype(dtype) if hasattr(x, "dtype")
    and x.dtype == jnp.float32 else x, p)
tx = optax.adafactor(1e-4)
opt_state = jax.jit(tx.init)(p)
sched = make_ddim_schedule(beta_schedule="scaled_linear",
                           beta_start=0.00085, beta_end=0.012,
                           clip_sample=False, set_alpha_to_one=False)


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

import time  # noqa: E402
iters = 5
t0 = time.perf_counter()
for i in range(iters):
    p, opt_state, loss = train_step(p, opt_state, latents, rgbl,
                                    jax.random.key(10 + i))
np.asarray(loss)
dt = (time.perf_counter() - t0) / iters
print(f"train step {dt*1e3:.1f} ms -> {batch/dt:.1f} samples/s")

logdir = "/tmp/ldmseg_trace_train"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
for i in range(2):
    p, opt_state, loss = train_step(p, opt_state, latents, rgbl,
                                    jax.random.key(20 + i))
np.asarray(loss)
jax.profiler.stop_trace()

import re  # noqa: E402

ev = {}
cat = {}
for f in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    # device-op track only: XLA op events carry run/hlo metadata in args
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        name = e.get("name", "")
        args = e.get("args") or {}
        if not ("hlo_category" in args or "long_name" in args
                or re.fullmatch(r"[\w.\-]+\.\d+", name)):
            continue
        if name.startswith("jit_") or "/" in name or "$" in name:
            continue
        dur = e.get("dur", 0)
        ev.setdefault(name, [0, 0])
        ev[name][0] += dur
        ev[name][1] += 1
        group = args.get("hlo_category") or re.sub(r"\.\d+$", "", name)
        cat.setdefault(group, [0, 0])
        cat[group][0] += dur
        cat[group][1] += 1

print("== by category ==")
for name, (dur, cnt) in sorted(cat.items(), key=lambda kv: -kv[1][0])[:15]:
    print(f"{dur/1e3/2:8.3f} ms/step x{cnt:4d}  {name[:90]}")
print("== top ops ==")
for name, (dur, cnt) in sorted(ev.items(), key=lambda kv: -kv[1][0])[:25]:
    print(f"{dur/1e3/2:8.3f} ms/step x{cnt:4d}  {name[:110]}")
