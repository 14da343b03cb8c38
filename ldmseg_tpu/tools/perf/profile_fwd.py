"""Trace the current bench UNet config and summarize op-time by category."""
import functools, glob, gzip, json, os, sys, time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from ldmseg_tpu.models import UNet2DCondition, UNetConfig
from ldmseg_tpu.ops.quant import prequantize_conv_tree

batch, lh, lw = 16, 32, 64
dtype = jnp.bfloat16
cfg = UNetConfig(in_channels=8, use_cross_attention=False,
                 use_padded_attention=True, use_fused_norms=True,
                 use_int8_conv=True, int8_act_scale=0.05,
                 use_int8_ff=True, use_fused_ff=True,
                 int8_attn_act_scale=0.1)
unet = UNet2DCondition(config=cfg)
p = jax.jit(unet.init)(jax.random.key(0), jnp.zeros((1, lh, lw, 8), dtype),
                       jnp.zeros((1,), jnp.int32))
cast = lambda t: jax.tree_util.tree_map(
    lambda x: x.astype(dtype) if hasattr(x, "dtype")
    and x.dtype == jnp.float32 else x, t)
from ldmseg_tpu.ops.quant import pack_inference_tiles
p = jax.jit(functools.partial(prequantize_conv_tree, quantize_ff=True,
                              absorbed_attention=True,
                              attention_heads=8))(cast(p))
p = jax.jit(functools.partial(pack_inference_tiles,
                              attention_heads=8))(p)

@jax.jit
def run(p, x0):
    def body(x, i):
        y = unet.apply(p, x, jnp.full((batch,), i, jnp.int32))
        nxt = jnp.concatenate(
            [(y * 0.01 + x[..., :4] * 0.99).astype(dtype), x[..., 4:]],
            axis=-1)
        return nxt, ()
    out, _ = jax.lax.scan(body, x0, jnp.arange(50))
    return out

x0 = jax.random.normal(jax.random.key(1), (batch, lh, lw, 8), dtype)
np.asarray(run(p, x0).ravel()[0])

logdir = "/tmp/ldmseg_trace_r3"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
out = run(p, x0)
np.asarray(out.ravel()[0])
jax.profiler.stop_trace()

# parse the perfetto trace
files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
ev_by_name = {}
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        # keep only TPU op events (pid/tid naming varies; filter by dur)
        name = e.get("name", "")
        dur = e.get("dur", 0)
        ev_by_name.setdefault(name, [0, 0])
        ev_by_name[name][0] += dur
        ev_by_name[name][1] += 1
top = sorted(ev_by_name.items(), key=lambda kv: -kv[1][0])[:45]
for name, (dur, cnt) in top:
    print(f"{dur/1e3/50:8.3f} ms/fwd x{cnt:5d}  {name[:110]}")
