"""TrainState: gradient accumulation (reference gradient_accumulate_every,
trainers_ae.py:326-341) and EMA shadow-parameter semantics
(ldmseg/models/unet.py:443-459)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ldmseg_tpu.train.state import TrainState


def test_grad_accum_matches_one_big_batch_sgd():
    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((3,))}
    g1 = {"w": jnp.array([1.0, 2.0, 3.0])}
    g2 = {"w": jnp.array([3.0, 2.0, 1.0])}

    s = TrainState.create(params, tx, accumulate=2)
    s = s.apply_gradients(g1)
    # first micro-batch: no optimizer step yet, params unchanged
    assert int(s.step) == 0
    np.testing.assert_allclose(np.asarray(s.params["w"]),
                               np.asarray(params["w"]))
    s = s.apply_gradients(g2)
    assert int(s.step) == 1
    # accumulation buffer reset after the step
    np.testing.assert_allclose(np.asarray(s.grad_accum["w"]), 0.0)

    mean = {"w": (g1["w"] + g2["w"]) / 2.0}
    big = TrainState.create(params, tx).apply_gradients(mean)
    np.testing.assert_allclose(np.asarray(s.params["w"]),
                               np.asarray(big.params["w"]), rtol=1e-6)


def test_grad_accum_under_jit():
    tx = optax.adamw(1e-2)
    params = {"w": jnp.ones((4,))}
    s = TrainState.create(params, tx, accumulate=3)

    @jax.jit
    def step(state, g):
        return state.apply_gradients({"w": g})

    for i in range(6):
        s = step(s, jnp.full((4,), float(i + 1)))
    assert int(s.step) == 2
    assert int(s.micro_step) == 6
    assert np.isfinite(np.asarray(s.params["w"])).all()


def test_ema_tracks_params_and_eval_params():
    tx = optax.sgd(1.0)
    params = {"w": jnp.zeros((2,))}
    s = TrainState.create(params, tx, ema=True)
    assert s.eval_params() is s.ema_params
    s = s.apply_gradients({"w": jnp.ones((2,))}, ema_decay=0.5)
    # params moved to -1; ema = 0.5*0 + 0.5*(-1) = -0.5
    np.testing.assert_allclose(np.asarray(s.params["w"]), -1.0)
    np.testing.assert_allclose(np.asarray(s.ema_params["w"]), -0.5)

    s2 = TrainState.create(params, tx, ema=False)
    assert s2.eval_params() is s2.params
