"""Golden-value regression tests for the DDIM loop (SURVEY §4: fixed-seed
golden tests). The output statistics of the scan sampler with a fixed
analytic "model" are locked; any schedule/step/sampler regression shifts
these numbers. Captured on the CPU mesh at framework v0.1.0.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ldmseg_tpu.diffusion import make_ddim_schedule, ddim_sample


def _sched():
    return make_ddim_schedule(
        beta_schedule="scaled_linear", beta_start=0.00085, beta_end=0.012,
        clip_sample=False, set_alpha_to_one=False)


def test_ddim_golden_trajectory():
    def model(latents, condition, t):
        tt = jnp.asarray(t, jnp.float32) / 1000.0
        return 0.25 * latents + 0.1 * jnp.tanh(latents) + 0.05 * tt

    init = jax.random.normal(jax.random.key(42), (2, 4, 6, 4))
    out = np.asarray(ddim_sample(_sched(), model, init,
                                 num_inference_steps=10), np.float64)
    stats = np.array([out.mean(), out.std(), out.min(), out.max()])
    golden = np.array([-0.3141664505, 5.68927126, -15.8010149002,
                       15.9876384735])
    np.testing.assert_allclose(stats, golden, rtol=2e-4, atol=1e-5)


def test_ddim_golden_self_condition():
    def model(latents, condition, t):
        return 0.2 * latents + 0.1 * condition

    init = jax.random.normal(jax.random.key(7), (1, 4, 4, 4))
    out = np.asarray(ddim_sample(_sched(), model, init,
                                 num_inference_steps=5,
                                 self_condition=True), np.float64)
    stats = np.array([out.mean(), out.std(), out.min(), out.max()])
    golden = np.array([0.0414271122, 4.7881295414, -9.8352880478,
                       9.9894561768])
    np.testing.assert_allclose(stats, golden, rtol=2e-4, atol=1e-5)
