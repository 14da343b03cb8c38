"""The full DDIM sampling loop as ONE ``lax.scan`` — compile once, no host
round-trips between the 50 UNet calls.

Mirrors the reference python loop (ldmseg/trainers/trainers_ldm_cond.py:
1130-1162): per step it concatenates [latents, rgb_latents(, condition)],
runs the UNet, optionally applies classifier-free guidance, updates the
self-conditioning channel with the predicted x0, and DDIM-steps. At the
final timestep the reference returns ``pred_original_sample`` instead of
``prev_sample`` (:1157-1162) — reproduced here by carrying the last x0.

Differences from the reference (deliberate, documented):
  * the whole loop lives inside jit; timesteps are a static table.
  * latents keep the true (possibly non-square) spatial shape; the
    reference hardcodes square ``(latent_size, latent_size)`` noise
    (:1092-1094), which breaks 24x80 KITTI latents (SURVEY §7 bug list).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .ddim import DDIMSchedule, ddim_step, inference_timesteps


def ddim_sample(
    sched: DDIMSchedule,
    model_fn: Callable[[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray], jnp.ndarray],
    init_latents: jnp.ndarray,
    num_inference_steps: int = 50,
    self_condition: bool = False,
    tmin: int = 0,
    return_all: bool = False,
    unroll: int = 1,
) -> jnp.ndarray:
    """Run the deterministic DDIM sampler.

    Args:
      sched: schedule tables.
      model_fn: ``(latents, condition_or_None, t) -> noise/sample pred``.
        The caller closes over rgb latents / encoder hidden states / CFG
        duplication — the sampler stays model-agnostic.
      init_latents: ``[B, H, W, C]`` standard-normal noise (times
        ``init_noise_sigma``).
      num_inference_steps: static step count (reference default 50).
      self_condition: thread predicted x0 back in as conditioning
        (reference :1135-1153).
      tmin: drop timesteps below this (reference ``set_timesteps_inference``
        tmin).
      return_all: also return the per-step latent trajectory
        (reference ``return_all_latents``).

    Returns: predicted x0 latents ``[B, H, W, C]`` (and, if ``return_all``,
      the stacked trajectory ``[S, B, H, W, C]``).
    """
    ts = inference_timesteps(sched.num_train_timesteps, num_inference_steps,
                             tmin=tmin)
    ts = jnp.asarray(ts)

    condition0 = jnp.zeros_like(init_latents) if self_condition else None

    def body(carry, t):
        latents, condition, _ = carry
        pred = model_fn(latents, condition, t)
        prev, x0 = ddim_step(sched, pred, t, latents, num_inference_steps)
        new_condition = x0 if self_condition else None
        out = prev if return_all else 0.0
        return (prev, new_condition, x0), out

    init = (init_latents * sched.init_noise_sigma, condition0,
            jnp.zeros_like(init_latents))
    (final_prev, _, final_x0), traj = jax.lax.scan(body, init, ts,
                                                   unroll=unroll)
    del final_prev
    if return_all:
        return final_x0, traj
    return final_x0


def ddim_refine(
    sched: DDIMSchedule,
    model_fn: Callable,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    num_inference_steps: int = 50,
    strength: float = 0.3,
    self_condition: bool = False,
    tmin: int = 0,
) -> jnp.ndarray:
    """Partial (SDEdit-style) DDIM: re-noise an x0 estimate to the
    timestep ``strength`` of the way up the inference schedule and run
    only the remaining tail of the SAME trajectory the full sampler would
    take. Used by pose-consistent clip sampling: frame latents blended
    with the pose-warped anchor frame are refined back onto the model
    manifold without paying for a full 50-step resample. No reference
    counterpart (the fork's video story stops at ``repeat_noise``,
    trainers_ldm_cond.py:1097-1098).
    """
    from .ddim import add_noise

    ts_full = inference_timesteps(sched.num_train_timesteps,
                                  num_inference_steps, tmin=tmin)
    k = max(1, min(len(ts_full), int(round(strength * len(ts_full)))))
    ts = jnp.asarray(ts_full[-k:])  # the low-noise tail, descending

    b = x0.shape[0]
    t_start = jnp.full((b,), ts_full[-k], dtype=jnp.int32)
    latents = add_noise(sched, x0, noise, t_start)
    condition0 = jnp.zeros_like(latents) if self_condition else None

    def body(carry, t):
        lat, condition, _ = carry
        pred = model_fn(lat, condition, t)
        prev, x0_ = ddim_step(sched, pred, t, lat, num_inference_steps)
        return (prev, x0_ if self_condition else None, x0_), 0.0

    init = (latents, condition0, jnp.zeros_like(latents))
    (_, _, final_x0), _ = jax.lax.scan(body, init, ts)
    return final_x0


def cfg_model_fn(
    raw_model_fn: Callable[
        [jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray], jnp.ndarray],
    uncond_model_fn: Callable[
        [jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray], jnp.ndarray],
    guidance_scale: float,
) -> Callable:
    """Classifier-free guidance wrapper (reference :1147-1149).

    ``pred = uncond + scale * (cond - uncond)``. The reference implements
    this by doubling the batch; on TPU two jitted calls fuse equally well
    and keep shapes static.
    """

    def fn(latents, condition, t):
        cond = raw_model_fn(latents, condition, t)
        uncond = uncond_model_fn(latents, condition, t)
        return uncond + guidance_scale * (cond - uncond)

    return fn
