"""Optimizer chain + mesh/sharding tests (virtual 8-device CPU mesh)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import optax

from ldmseg_tpu.train import make_optimizer, make_lr_schedule, TrainState
from ldmseg_tpu.train.optim import default_unet_lr_factor, is_norm_param
from ldmseg_tpu.parallel import (
    make_mesh, shard_batch, replicate, zero1_opt_state_sharding)

pytestmark = pytest.mark.slow


def test_lr_schedules():
    # warmup: linear ramp then constant (utils.py:119-133)
    s = make_lr_schedule("warmup", 1e-4, 1000, warmup_iters=200)
    assert float(s(0)) < 1e-5
    np.testing.assert_allclose(float(s(199)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(999)), 1e-4, rtol=1e-5)
    # cosine decays to final_lr (utils.py:84-105)
    s = make_lr_schedule("cosine", 1e-4, 1000, warmup_iters=0, final_lr=1e-6)
    np.testing.assert_allclose(float(s(1000)), 1e-6, rtol=1e-3)
    assert float(s(500)) < 1e-4
    # step decay
    s = make_lr_schedule("step", 1e-2, 1000, warmup_iters=0, step_size=100,
                         gamma=0.1)
    np.testing.assert_allclose(float(s(150)), 1e-3, rtol=1e-5)


def test_weight_decay_masks_and_lr_factor():
    params = {
        "conv_in": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
        "mid": {"norm1": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))}},
    }
    tx = make_optimizer("adamw", learning_rate=1.0, weight_decay=0.1,
                        weight_decay_norm=0.0,
                        lr_factor_fn=default_unet_lr_factor(0.0))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    # conv_in update zeroed by lr factor 0 despite weight decay
    assert np.allclose(np.asarray(updates["conv_in"]["kernel"]), 0.0)
    # norm scale gets weight_decay_norm = 0 -> no update from decay
    assert np.allclose(np.asarray(updates["mid"]["norm1"]["scale"]), 0.0)


def test_norm_param_detection():
    from jax.tree_util import tree_flatten_with_path
    params = {"enc": {"norm": {"scale": 0}, "conv1": {"kernel": 0},
                      "up0_ln": {"ln": {"scale": 0}}}}
    leaves, _ = tree_flatten_with_path(params)
    flags = {"/".join(str(k.key) for k in path): is_norm_param(path)
             for path, _ in leaves}
    assert flags["enc/norm/scale"]
    assert flags["enc/up0_ln/ln/scale"]
    assert not flags["enc/conv1/kernel"]


def test_train_state_sgd_step():
    params = {"w": jnp.ones((4,))}
    tx = make_optimizer("sgd", learning_rate=0.1, momentum=0.0)
    ts = TrainState.create(params, tx)
    grads = {"w": jnp.ones((4,))}
    ts = ts.apply_gradients(grads)
    np.testing.assert_allclose(np.asarray(ts.params["w"]), 0.9, rtol=1e-6)
    assert int(ts.step) == 1


def test_mesh_and_zero1_sharding():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1

    batch = {"x": np.zeros((16, 4, 4, 3), np.float32)}
    sb = shard_batch(mesh, batch)
    assert sb["x"].sharding.spec == jax.sharding.PartitionSpec(
        "data", None, None, None)

    params = {"w": jnp.ones((32, 7)), "small": jnp.ones((3,))}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    shardings = zero1_opt_state_sharding(mesh, opt_state)
    # adam mu for 'w' should shard dim0 (32 % 8 == 0); 'small' replicated
    mu_shard = shardings[0].mu["w"]
    assert mu_shard.spec == jax.sharding.PartitionSpec("data", None)
    assert shardings[0].mu["small"].spec == jax.sharding.PartitionSpec()
    # placing actually works
    placed = jax.device_put(opt_state, shardings)
    assert placed[0].mu["w"].sharding.spec == jax.sharding.PartitionSpec(
        "data", None)


def test_data_parallel_grad_allreduce_semantics():
    """jit with sharded batch + replicated params must equal the single
    device computation (XLA inserts the psum.)"""
    mesh = make_mesh()
    params = {"w": jnp.full((3,), 0.5)}

    def loss_fn(p, x):
        return jnp.mean((x @ jnp.ones((4, 3)) * p["w"]) ** 2)

    x = np.random.RandomState(0).randn(16, 4).astype(np.float32)
    g_ref = jax.grad(loss_fn)(params, jnp.asarray(x))

    xs = shard_batch(mesh, x)
    ps = replicate(mesh, params)
    g = jax.jit(jax.grad(loss_fn))(ps, xs)
    np.testing.assert_allclose(np.asarray(g["w"]), np.asarray(g_ref["w"]),
                               rtol=1e-5)


def test_prefetch_to_device():
    from ldmseg_tpu.parallel.mesh import prefetch_to_device
    mesh = make_mesh()
    batches = [{"x": np.full((8, 4), i, np.float32), "meta": [i]}
               for i in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh, size=2))
    assert len(out) == 5
    assert out[3]["meta"] == [3]
    assert out[2]["x"].sharding.spec == jax.sharding.PartitionSpec(
        "data", None)
    np.testing.assert_allclose(np.asarray(out[4]["x"]), 4.0)


def test_tensor_parallel_unet_step():
    """UNet forward with params sharded over a (4, 2) data x model mesh
    must match the replicated result — GSPMD inserts the collectives."""
    import jax.numpy as jnp
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    from ldmseg_tpu.parallel import apply_tp, shard_batch
    from ldmseg_tpu.parallel.mesh import make_mesh

    cfg = UNetConfig(in_channels=8, out_channels=4,
                     block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                     cross_attention_dim=16, attention_head_dim=2,
                     norm_num_groups=4, use_cross_attention=False)
    model = UNet2DCondition(config=cfg)
    x = jnp.zeros((4, 24, 80, 8))
    t = jnp.zeros((4,), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), x, t)
    xr = jnp.asarray(np.random.RandomState(0).randn(4, 24, 80, 8),
                     jnp.float32)
    ref = model.apply(params, xr, t)

    mesh = make_mesh(num_data=4, num_model=2)
    tp_params = apply_tp(mesh, params)
    # some kernels must actually be sharded over 'model'
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda v: v.sharding.spec, tp_params))
    assert any("model" in str(s) for s in specs)
    xb = shard_batch(mesh, np.asarray(xr))
    out = jax.jit(model.apply)(tp_params, xb, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_tensor_parallel_training_step():
    """A full grad step with TP-sharded params on a (4, 2) mesh must match
    the replicated computation (GSPMD handles both fwd and bwd
    collectives)."""
    import jax.numpy as jnp
    from ldmseg_tpu.models import UNet2DCondition, UNetConfig
    from ldmseg_tpu.parallel import apply_tp, shard_batch
    from ldmseg_tpu.parallel.mesh import make_mesh

    cfg = UNetConfig(in_channels=8, out_channels=4,
                     block_out_channels=(8, 16, 16, 32), layers_per_block=1,
                     cross_attention_dim=16, attention_head_dim=2,
                     norm_num_groups=4, use_cross_attention=False)
    model = UNet2DCondition(config=cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(4, 8, 16, 8),
                    jnp.float32)
    t = jnp.zeros((4,), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), x, t)

    def loss(p, xx):
        return jnp.mean(model.apply(p, xx, t) ** 2)

    g_ref = jax.grad(loss)(params, x)
    l_ref = float(loss(params, x))

    mesh = make_mesh(num_data=4, num_model=2)
    tp_params = apply_tp(mesh, params)
    xb = shard_batch(mesh, np.asarray(x))
    l_tp, g_tp = jax.jit(jax.value_and_grad(loss))(tp_params, xb)
    np.testing.assert_allclose(float(l_tp), l_ref, rtol=1e-4)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_tp),
            jax.tree_util.tree_leaves_with_path(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(kp))
