"""DDIM noise schedule — pure-function JAX redesign.

Capabilities mirrored from the reference scheduler
(ldmseg/schedulers/ddim_scheduler.py:26-291):

  * four beta schedules: linear / scaled_linear / squaredcos_cap_v2 (Glide
    cosine) / sigmoid                         (:51-66)
  * per-timestep loss weights, five modes: inverse_log_snr / max_clamp_snr /
    linear / fixed / none                     (:97-117)
  * inference timesteps with the fork's ``steps_offset = step_ratio - 1``
    shift so t=999 is always sampled          (:119-131)
  * ``add_noise`` (with optional noise-dropout mask) and ``remove_noise``
    inversion                                 (:155-216)
  * DDIM ``step`` for epsilon / sample / v_prediction with clipping
                                              (:218-269)

Design: the schedule is a frozen pytree of precomputed tables; every
transform is a pure function usable inside ``jit`` with traced timesteps
(``prev_t < 0`` handled by ``jnp.where``, not python branching).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """Glide cosine schedule (reference :138-153)."""

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float32)


def make_betas(
    beta_schedule: str,
    num_train_timesteps: int,
    beta_start: float,
    beta_end: float,
) -> np.ndarray:
    """Beta table for the four supported schedules (reference :51-66)."""
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float32)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps,
                        dtype=np.float32) ** 2
        )
    if beta_schedule == "squaredcos_cap_v2":
        return _betas_for_alpha_bar(num_train_timesteps)
    if beta_schedule == "sigmoid":
        x = np.linspace(-6, 6, num_train_timesteps, dtype=np.float32)
        return (1.0 / (1.0 + np.exp(-x))) * (beta_end - beta_start) + beta_start
    raise NotImplementedError(f"beta_schedule {beta_schedule!r}")


def compute_loss_weights(
    alphas_cumprod: np.ndarray,
    mode: str = "max_clamp_snr",
    max_snr: float = 5.0,
) -> np.ndarray:
    """Per-timestep loss weights (reference :97-117)."""
    assert mode in ("inverse_log_snr", "max_clamp_snr", "linear", "fixed",
                    "none")
    snr = alphas_cumprod / (1.0 - alphas_cumprod)
    if mode == "inverse_log_snr":
        w = np.clip(np.log(1.0 / snr), 1.0, None)
        w = w / w[-1]
    elif mode == "max_clamp_snr":
        w = np.clip(snr, None, max_snr) / snr
    elif mode == "fixed":
        w = snr.copy()
        w[: len(w) // 4] = 0.1
    elif mode == "linear":
        w = np.arange(1, len(snr) + 1, dtype=np.float64) / len(snr)
    else:
        w = np.ones_like(snr)
    return w.astype(np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed noise-schedule tables (a jit-friendly pytree)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    final_alpha_cumprod: jnp.ndarray
    weights: jnp.ndarray
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))
    prediction_type: str = dataclasses.field(metadata=dict(static=True))
    clip_sample: bool = dataclasses.field(metadata=dict(static=True))
    clip_sample_range: float = dataclasses.field(metadata=dict(static=True))
    init_noise_sigma: float = dataclasses.field(metadata=dict(static=True))


def make_ddim_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    beta_schedule: str = "linear",
    clip_sample: bool = True,
    set_alpha_to_one: bool = True,
    prediction_type: str = "epsilon",
    clip_sample_range: float = 1.0,
    weight: str = "none",
    max_snr: float = 5.0,
    **_unused,
) -> DDIMSchedule:
    """Build the schedule. Defaults mirror the reference constructor
    (ddim_scheduler.py:32-50); the LDM config uses scaled_linear
    8.5e-4→0.012, clip_sample=False, set_alpha_to_one=False
    (tools/configs/base/base.yaml:48-62)."""
    betas = make_betas(beta_schedule, num_train_timesteps, beta_start, beta_end)
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    final = np.float32(1.0) if set_alpha_to_one else alphas_cumprod[0]
    weights = compute_loss_weights(alphas_cumprod, mode=weight, max_snr=max_snr)
    return DDIMSchedule(
        betas=jnp.asarray(betas),
        alphas_cumprod=jnp.asarray(alphas_cumprod),
        final_alpha_cumprod=jnp.asarray(final, dtype=jnp.float32),
        weights=jnp.asarray(weights),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
        clip_sample=clip_sample,
        clip_sample_range=clip_sample_range,
        init_noise_sigma=1.0,
    )


def inference_timesteps(
    num_train_timesteps: int,
    num_inference_steps: int,
    tmin: int = 0,
) -> np.ndarray:
    """Descending inference timesteps with the fork's offset.

    ``steps_offset = step_ratio - 1`` guarantees the last training step
    (t = T-1) is always included (reference :119-131). Static (numpy) so the
    sampler scan length is a compile-time constant.
    """
    step_ratio = num_train_timesteps // num_inference_steps
    offset = step_ratio - 1
    ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
    ts = ts.astype(np.int64) + offset
    return ts[ts >= tmin]


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and reshape for broadcasting over
    ``[B, ...]`` arrays (reference's unsqueeze loop :171-179)."""
    vals = table[t].reshape((-1,) + (1,) * (ndim - 1))
    return vals


def add_noise(
    sched: DDIMSchedule,
    original_samples: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
    scale: float = 1.0,
    mask_noise_perc: Optional[float] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0) (reference :155-187)."""
    ac = sched.alphas_cumprod.astype(original_samples.dtype)
    sqrt_a = _extract(ac, timesteps, original_samples.ndim) ** 0.5
    sqrt_1ma = (1.0 - _extract(ac, timesteps, original_samples.ndim)) ** 0.5
    if mask_noise_perc is not None:
        assert key is not None, "mask_noise_perc requires a PRNG key"
        mask = jax.random.uniform(key, original_samples.shape) < mask_noise_perc
        noise = noise * mask
    return sqrt_a * scale * original_samples + sqrt_1ma * noise


def remove_noise(
    sched: DDIMSchedule,
    noisy_samples: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Invert :func:`add_noise` given the (predicted) noise (reference
    :189-216)."""
    ac = sched.alphas_cumprod.astype(noisy_samples.dtype)
    sqrt_a = _extract(ac, timesteps, noisy_samples.ndim) ** 0.5
    sqrt_1ma = (1.0 - _extract(ac, timesteps, noisy_samples.ndim)) ** 0.5
    return (noisy_samples - sqrt_1ma * noise) / (sqrt_a * scale)


def ddim_step(
    sched: DDIMSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    sample: jnp.ndarray,
    num_inference_steps: int,
    use_clipped_model_output: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One deterministic (eta=0) DDIM update (reference :218-269).

    Works with a traced ``timestep``; the t<0 "previous alpha" case uses
    ``final_alpha_cumprod`` via ``where`` instead of python control flow.

    Returns: (prev_sample, pred_original_sample).
    """
    prev_t = timestep - sched.num_train_timesteps // num_inference_steps
    alpha_prod_t = sched.alphas_cumprod[timestep]
    alpha_prod_t_prev = jnp.where(
        prev_t >= 0,
        sched.alphas_cumprod[jnp.clip(prev_t, 0, None)],
        sched.final_alpha_cumprod,
    )
    beta_prod_t = 1.0 - alpha_prod_t

    if sched.prediction_type == "epsilon":
        pred_x0 = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
        pred_eps = model_output
    elif sched.prediction_type == "sample":
        pred_x0 = model_output
        pred_eps = (sample - alpha_prod_t**0.5 * pred_x0) / beta_prod_t**0.5
    elif sched.prediction_type == "v_prediction":
        pred_x0 = alpha_prod_t**0.5 * sample - beta_prod_t**0.5 * model_output
        pred_eps = alpha_prod_t**0.5 * model_output + beta_prod_t**0.5 * sample
    else:
        raise NotImplementedError(sched.prediction_type)

    if sched.clip_sample:
        pred_x0 = jnp.clip(pred_x0, -sched.clip_sample_range,
                           sched.clip_sample_range)
    if use_clipped_model_output:
        pred_eps = (sample - alpha_prod_t**0.5 * pred_x0) / beta_prod_t**0.5

    direction = (1.0 - alpha_prod_t_prev) ** 0.5 * pred_eps
    prev_sample = alpha_prod_t_prev**0.5 * pred_x0 + direction
    return prev_sample, pred_x0
