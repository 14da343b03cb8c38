"""DDIM schedule parity tests.

The reference scheduler formulas (ldmseg/schedulers/ddim_scheduler.py) are
re-derived here independently with torch/numpy and compared against the
jit-friendly JAX implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from ldmseg_tpu.diffusion import (
    make_ddim_schedule,
    compute_loss_weights,
    inference_timesteps,
    add_noise,
    remove_noise,
    ddim_step,
    ddim_sample,
)
from ldmseg_tpu.diffusion.ddim import make_betas


def _torch_betas(schedule, T, b0, b1):
    if schedule == "linear":
        return torch.linspace(b0, b1, T, dtype=torch.float32)
    if schedule == "scaled_linear":
        return torch.linspace(b0**0.5, b1**0.5, T, dtype=torch.float32) ** 2
    if schedule == "sigmoid":
        betas = torch.linspace(-6, 6, T)
        return torch.sigmoid(betas) * (b1 - b0) + b0
    raise ValueError


def test_beta_schedules_parity():
    for schedule in ["linear", "scaled_linear", "sigmoid"]:
        ours = make_betas(schedule, 1000, 0.00085, 0.012)
        ref = _torch_betas(schedule, 1000, 0.00085, 0.012).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)
    # glide cosine: check endpoints + monotonicity of alphas_cumprod
    betas = make_betas("squaredcos_cap_v2", 1000, 0.0, 0.0)
    assert betas.shape == (1000,)
    assert betas.max() <= 0.999 and betas.min() > 0
    ac = np.cumprod(1 - betas)
    assert np.all(np.diff(ac) < 0)


def test_loss_weight_modes():
    betas = make_betas("scaled_linear", 1000, 0.00085, 0.012)
    ac = np.cumprod(1 - betas)
    snr = torch.from_numpy(ac / (1 - ac))
    # max_clamp_snr (the LDM training config, train_diffusion.sh:22-23)
    ref = (snr.clamp(max=2.0) / snr).numpy()
    np.testing.assert_allclose(
        compute_loss_weights(ac, "max_clamp_snr", max_snr=2.0), ref, rtol=1e-6)
    # inverse_log_snr
    w = torch.log(1.0 / snr).clamp(min=1)
    ref = (w / w[-1]).numpy()
    np.testing.assert_allclose(
        compute_loss_weights(ac, "inverse_log_snr"), ref, rtol=1e-5)
    # fixed
    w = snr.clone()
    w[: len(w) // 4] = 0.1
    np.testing.assert_allclose(compute_loss_weights(ac, "fixed"), w.numpy(),
                               rtol=1e-6)
    # linear / none
    np.testing.assert_allclose(compute_loss_weights(ac, "linear"),
                               np.arange(1, 1001) / 1000, rtol=1e-6)
    np.testing.assert_allclose(compute_loss_weights(ac, "none"),
                               np.ones(1000), rtol=0)


def test_inference_timesteps():
    # reference :119-131 -> step_ratio 20, offset 19 -> 999, 979, ..., 19
    ts = inference_timesteps(1000, 50)
    assert ts[0] == 999 and ts[-1] == 19 and len(ts) == 50
    assert np.all(np.diff(ts) == -20)
    # tmin filter
    ts = inference_timesteps(1000, 50, tmin=500)
    assert ts.min() >= 500


def test_add_remove_noise_inverse():
    sched = make_ddim_schedule(beta_schedule="scaled_linear",
                               beta_start=0.00085, beta_end=0.012)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(4, 8, 8, 4).astype(np.float32))
    noise = jnp.asarray(rng.randn(4, 8, 8, 4).astype(np.float32))
    t = jnp.asarray([0, 100, 500, 999])
    xt = add_noise(sched, x0, noise, t)
    rec = remove_noise(sched, xt, noise, t)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3,
                               atol=1e-3)


def test_add_noise_parity_torch():
    sched = make_ddim_schedule(beta_schedule="scaled_linear",
                               beta_start=0.00085, beta_end=0.012)
    rng = np.random.RandomState(1)
    x0 = rng.randn(3, 4, 4, 2).astype(np.float32)
    noise = rng.randn(3, 4, 4, 2).astype(np.float32)
    t = np.array([5, 250, 900])
    ours = add_noise(sched, jnp.asarray(x0), jnp.asarray(noise),
                     jnp.asarray(t))
    ac = np.asarray(sched.alphas_cumprod)
    sa = np.sqrt(ac[t])[:, None, None, None]
    s1 = np.sqrt(1 - ac[t])[:, None, None, None]
    np.testing.assert_allclose(np.asarray(ours), sa * x0 + s1 * noise,
                               rtol=1e-5, atol=1e-6)


def _ref_step(ac, final_ac, pred_type, clip, clip_range, model_out, t, sample,
              T, S):
    """Direct numpy port of reference step() :218-269 (eta=0)."""
    prev_t = t - T // S
    a_t = ac[t]
    a_prev = ac[prev_t] if prev_t >= 0 else final_ac
    b_t = 1 - a_t
    if pred_type == "epsilon":
        x0 = (sample - b_t**0.5 * model_out) / a_t**0.5
        eps = model_out
    elif pred_type == "sample":
        x0 = model_out
        eps = (sample - a_t**0.5 * x0) / b_t**0.5
    else:  # v_prediction
        x0 = a_t**0.5 * sample - b_t**0.5 * model_out
        eps = a_t**0.5 * model_out + b_t**0.5 * sample
    if clip:
        x0 = np.clip(x0, -clip_range, clip_range)
    direction = (1 - a_prev) ** 0.5 * eps
    return a_prev**0.5 * x0 + direction, x0


def test_ddim_step_parity_all_prediction_types():
    rng = np.random.RandomState(2)
    for pred_type in ["epsilon", "sample", "v_prediction"]:
        for clip in [False, True]:
            sched = make_ddim_schedule(
                beta_schedule="scaled_linear", beta_start=0.00085,
                beta_end=0.012, prediction_type=pred_type, clip_sample=clip,
                set_alpha_to_one=False)
            ac = np.asarray(sched.alphas_cumprod)
            final = float(np.asarray(sched.final_alpha_cumprod))
            sample = rng.randn(2, 4, 4, 4).astype(np.float32)
            out = rng.randn(2, 4, 4, 4).astype(np.float32)
            for t in [999, 500, 19]:  # 19 -> prev_t = -1 branch
                prev, x0 = ddim_step(sched, jnp.asarray(out),
                                     jnp.asarray(t), jnp.asarray(sample), 50)
                ref_prev, ref_x0 = _ref_step(ac, final, pred_type, clip, 1.0,
                                             out, t, sample, 1000, 50)
                np.testing.assert_allclose(np.asarray(prev), ref_prev,
                                           rtol=2e-4, atol=2e-5)
                np.testing.assert_allclose(np.asarray(x0), ref_x0,
                                           rtol=2e-4, atol=2e-5)


def test_scan_sampler_matches_python_loop():
    """The lax.scan sampler must reproduce the reference python loop
    (trainers_ldm_cond.py:1130-1162) step-for-step, incl. the final-step
    pred_original_sample return."""
    sched = make_ddim_schedule(beta_schedule="scaled_linear",
                               beta_start=0.00085, beta_end=0.012,
                               clip_sample=False, set_alpha_to_one=False)
    rng = np.random.RandomState(3)
    init = rng.randn(2, 6, 10, 4).astype(np.float32)

    # a fake but deterministic "unet": mixes sample and timestep
    def model(latents, condition, t):
        tt = jnp.asarray(t, jnp.float32) / 1000.0
        return 0.3 * latents + 0.1 * jnp.sin(latents * 3.0) + 0.05 * tt

    ours = ddim_sample(sched, model, jnp.asarray(init),
                       num_inference_steps=10)

    # python loop reference
    ac = np.asarray(sched.alphas_cumprod)
    final = float(np.asarray(sched.final_alpha_cumprod))
    ts = inference_timesteps(1000, 10)
    latents = init.copy()
    for i, t in enumerate(ts):
        pred = np.asarray(model(jnp.asarray(latents), None, jnp.asarray(t)))
        prev, x0 = _ref_step(ac, final, "epsilon", False, 1.0, pred, int(t),
                             latents, 1000, 10)
        latents = x0 if i == len(ts) - 1 else prev
    np.testing.assert_allclose(np.asarray(ours), latents, rtol=2e-3,
                               atol=2e-4)


def test_self_condition_threading():
    sched = make_ddim_schedule(clip_sample=False)
    init = jnp.ones((1, 4, 4, 4))
    seen = []

    def model(latents, condition, t):
        seen.append(condition is not None)
        return latents * 0.1 + condition * 0.1

    out = ddim_sample(sched, model, init, num_inference_steps=5,
                      self_condition=True)
    assert out.shape == (1, 4, 4, 4)
    assert all(seen)
    assert np.all(np.isfinite(np.asarray(out)))
