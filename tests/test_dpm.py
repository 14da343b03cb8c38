"""DPM-Solver++(2M) sampler (diffusion/dpm.py — no reference
counterpart; validates against analytic diffusion models where the
probability-flow ODE is known)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ldmseg_tpu.diffusion import (
    make_ddim_schedule, ddim_sample, dpmpp_2m_sample)


def _sched(**kw):
    base = dict(num_train_timesteps=1000, beta_start=8.5e-4,
                beta_end=0.012, beta_schedule="scaled_linear",
                clip_sample=False, set_alpha_to_one=False,
                prediction_type="epsilon")
    base.update(kw)
    return make_ddim_schedule(**base)


def _point_model(sched, x_star):
    """Exact eps for a single-point data distribution: the model's x0
    prediction is constant, so DPM++'s 2nd-order correction vanishes and
    its trajectory must equal DDIM's EXACTLY."""

    def fn(x, cond, t):
        a = sched.alphas_cumprod[t]
        return (x - jnp.sqrt(a) * x_star) / jnp.sqrt(1.0 - a)

    return fn


def _mixture_model(sched, mu1, mu2):
    """Exact eps for a two-point mixture: E[x0|x_t] is a softmax-weighted
    blend, a genuinely nonlinear ODE where solver order matters."""

    def fn(x, cond, t):
        a = sched.alphas_cumprod[t]
        sa, s1a = jnp.sqrt(a), jnp.sqrt(1.0 - a)
        # log posterior weights of the two mixture components
        l1 = -jnp.sum((x - sa * mu1) ** 2, axis=-1, keepdims=True) / (
            2 * (1 - a))
        l2 = -jnp.sum((x - sa * mu2) ** 2, axis=-1, keepdims=True) / (
            2 * (1 - a))
        w1 = jax.nn.sigmoid(l1 - l2)
        x0 = w1 * mu1 + (1 - w1) * mu2
        return (x - sa * x0) / s1a

    return fn


def test_dpmpp_equals_ddim_on_linear_model():
    sched = _sched()
    x_star = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3),
                         jnp.float32)
    model = _point_model(sched, x_star)
    init = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 3),
                       jnp.float32)
    a = ddim_sample(sched, model, init, num_inference_steps=10)
    b = dpmpp_2m_sample(sched, model, init, num_inference_steps=10)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
    # and both recover the data point
    np.testing.assert_allclose(np.asarray(b), np.asarray(x_star),
                               rtol=1e-3, atol=1e-3)


def test_dpmpp_higher_order_convergence():
    """On a nonlinear ODE, DPM++(2M) at N steps must be closer to the
    dense-DDIM solution than DDIM at the same N."""
    sched = _sched()
    rng = np.random.RandomState(2)
    mu1 = jnp.asarray(rng.randn(8), jnp.float32)
    mu2 = jnp.asarray(-mu1 + 0.5 * rng.randn(8).astype(np.float32))
    model = _mixture_model(sched, mu1, mu2)
    init = jnp.asarray(rng.randn(16, 8) * 1.0, jnp.float32)

    truth = np.asarray(ddim_sample(sched, model, init,
                                   num_inference_steps=500))
    errs = {}
    for n in (10, 20):
        d = np.asarray(ddim_sample(sched, model, init,
                                   num_inference_steps=n))
        p = np.asarray(dpmpp_2m_sample(sched, model, init,
                                       num_inference_steps=n))
        errs[("ddim", n)] = np.abs(d - truth).mean()
        errs[("dpm", n)] = np.abs(p - truth).mean()
        assert np.isfinite(p).all()
        assert errs[("dpm", n)] < errs[("ddim", n)], errs
    # 2nd order: halving the step size should shrink the error faster
    # than first order does
    assert errs[("dpm", 20)] < 0.6 * errs[("dpm", 10)], errs


@pytest.mark.parametrize("pred_type", ["epsilon", "v_prediction", "sample"])
def test_dpmpp_prediction_types(pred_type):
    sched = _sched(prediction_type=pred_type, clip_sample=True)
    x_star = jnp.asarray(np.random.RandomState(3).rand(2, 8) * 0.8,
                         jnp.float32)

    def model(x, cond, t):
        a = sched.alphas_cumprod[t]
        sa, s1a = jnp.sqrt(a), jnp.sqrt(1.0 - a)
        eps = (x - sa * x_star) / s1a
        if pred_type == "epsilon":
            return eps
        if pred_type == "sample":
            return jnp.broadcast_to(x_star, x.shape)
        return sa * eps - s1a * x_star  # v = sqrt(a) eps - sqrt(1-a) x0

    init = jnp.asarray(np.random.RandomState(4).randn(2, 8), jnp.float32)
    out = np.asarray(dpmpp_2m_sample(sched, model, init,
                                     num_inference_steps=8))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, np.asarray(x_star), atol=5e-2)


def test_dpmpp_self_condition_runs():
    sched = _sched()
    calls = []

    def model(x, cond, t):
        calls.append(cond is not None)
        return x * 0.1 + (0.0 if cond is None else 0.01 * cond)

    init = jnp.ones((1, 4), jnp.float32)
    out = dpmpp_2m_sample(sched, model, init, num_inference_steps=4,
                          self_condition=True)
    assert np.isfinite(np.asarray(out)).all()
    assert calls and all(calls)  # traced with a condition tensor


def test_dpmpp_golden_trajectory():
    """Fixed-seed golden stats (same pattern as test_golden_ddim.py) —
    any solver-coefficient regression shifts these numbers. Captured on
    the CPU mesh at 10.1-f/s round-3 state."""
    sched = make_ddim_schedule(
        beta_schedule="scaled_linear", beta_start=0.00085, beta_end=0.012,
        clip_sample=False, set_alpha_to_one=False)

    def model(latents, condition, t):
        tt = jnp.asarray(t, jnp.float32) / 1000.0
        return 0.25 * latents + 0.1 * jnp.tanh(latents) + 0.05 * tt

    init = jax.random.normal(jax.random.key(42), (2, 4, 6, 4))
    out = np.asarray(dpmpp_2m_sample(sched, model, init,
                                     num_inference_steps=10), np.float64)
    stats = np.array([out.mean(), out.std(), out.min(), out.max()])
    golden = np.array([-0.2741657436, 5.2899328886, -14.7012767792,
                       14.912062645])
    np.testing.assert_allclose(stats, golden, rtol=2e-4, atol=1e-5)


def test_trainer_dpmpp_sampler_config(tmp_path):
    """sampling_kwargs.sampler='dpmpp_2m' drives sample_panoptic end to
    end and produces finite logits that differ from the DDIM path at the
    same (small) step count."""
    from ldmseg_tpu.data import SyntheticDVPS, Loader
    from ldmseg_tpu.models import UNetConfig
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.utils.config import DEFAULT_CONFIG, merge_dicts

    small = merge_dicts(DEFAULT_CONFIG, {
        "vae_model_kwargs": {
            "in_channels": 10, "int_channels": 32, "out_channels": 32,
            "block_out_channels": [8, 16, 16, 32], "num_upscalers": 2,
            "upscale_channels": 32, "norm_num_groups": 8,
        },
        "train_kwargs": {"batch_size": 2, "train_num_steps": 2},
        "sampling_kwargs": {"num_inference_steps": 4,
                            "guidance_scale": 1.0},
        "eval_kwargs": {"count_th": 16},
        "ignore_label": 0,
    })
    unet_cfg = UNetConfig(in_channels=8, out_channels=4,
                          block_out_channels=(8, 16, 16, 32),
                          layers_per_block=1, attention_head_dim=2,
                          norm_num_groups=4, use_cross_attention=False)
    ds = SyntheticDVPS(length=4, size=(64, 128), num_classes=20)
    outs = {}
    for sampler in ("ddim", "dpmpp_2m"):
        cfg = merge_dicts(small, {"sampling_kwargs": {"sampler": sampler}})
        tr = TrainerDiffusion(cfg, unet_config=unet_cfg, dataset=ds,
                              val_dataset=ds,
                              results_folder=str(tmp_path / sampler))
        batch = next(iter(Loader(ds, 2, shuffle=False)))
        tr.init_state(batch)
        logits, x0 = tr.sample_panoptic(batch, jax.random.key(0))
        outs[sampler] = np.asarray(x0)
        assert np.isfinite(outs[sampler]).all()
    # different integrators -> different few-step trajectories
    assert not np.allclose(outs["ddim"], outs["dpmpp_2m"])
