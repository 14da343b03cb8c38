"""Optimizers + LR schedules (optax).

Reference surface being mirrored:
  * detectron2-style param groups with per-module lr factors, a separate
    weight-decay for norm layers, and bias handling
    (ldmseg/trainers/optim.py:148-217)
  * the UNet lr factor: ``conv_in.*`` and ``down_blocks.*`` scaled by a
    backbone multiplier (ldmseg/models/unet.py:107-119 ``get_lr_func``,
    config ``optimizer_backbone_multiplier``)
  * adamw / adam / sgd (optim.py:128-142); adamw8bit is replaced by an
    optional factored/8-bit state later
  * LR schedules: cosine (with final_lr), linear warmup, step
    (ldmseg/utils/utils.py:84-157)
  * gradient clipping by global norm (trainers clip_grad, e.g.
    trainers_ldm_cond.py:773-779)

In optax, param "groups" become per-leaf masks derived from the param path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


NORM_KEYS = ("norm", "group_norm", "layer_norm", "ln", "groupnorm")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path).lower()


def is_norm_param(path) -> bool:
    """Heuristic matching torch's isinstance(module, norm_types) check
    (optim.py:184-195): our norm layers are all named *norm* / *ln*."""
    s = _path_str(path)
    parts = s.split("/")
    return any(any(nk == p or p.endswith("_" + nk) or p.startswith(nk)
                   for nk in NORM_KEYS) for p in parts[:-1])


def is_bias_param(path) -> bool:
    return _path_str(path).endswith("bias")


def default_unet_lr_factor(multiplier: float) -> Callable:
    """conv_in / down_blocks lr multiplier (unet.py:107-119)."""

    def fn(path) -> float:
        s = _path_str(path)
        if s.startswith("conv_in") or s.startswith("down_blocks") or \
           "/conv_in/" in s or "/down_blocks" in s:
            return multiplier
        return 1.0

    return fn


def scale_by_path(factor_fn: Callable) -> optax.GradientTransformation:
    """Multiply updates per-leaf by a path-dependent factor (the optax
    equivalent of per-param-group lr factors)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: u * factor_fn(path), updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def make_lr_schedule(
    name: str,
    base_lr: float,
    total_steps: int,
    warmup_iters: int = 200,
    final_lr: float = 1e-6,
    step_size: Optional[int] = None,
    gamma: float = 0.1,
) -> optax.Schedule:
    """LR schedules mirroring ldmseg/utils/utils.py:84-157.

    * 'warmup': linear 0->base over ``warmup_iters`` then constant
    * 'cosine': warmup then cosine decay to ``final_lr``
    * 'step':   warmup then stepwise decay by ``gamma`` every ``step_size``
    * 'none':   constant
    """
    if name in (None, "none"):
        return optax.constant_schedule(base_lr)
    if name == "warmup":
        def fn(step):
            warm = base_lr * jnp.minimum(step + 1, warmup_iters) / warmup_iters
            return jnp.where(step < warmup_iters, warm, base_lr)
        return fn
    if name == "cosine":
        def fn(step):
            warm = base_lr * jnp.minimum(step + 1, warmup_iters) / warmup_iters
            t = jnp.clip((step - warmup_iters) /
                         jnp.maximum(total_steps - warmup_iters, 1), 0.0, 1.0)
            cos = final_lr + 0.5 * (base_lr - final_lr) * \
                (1.0 + jnp.cos(jnp.pi * t))
            return jnp.where(step < warmup_iters, warm, cos)
        return fn
    if name == "step":
        assert step_size is not None
        def fn(step):
            warm = base_lr * jnp.minimum(step + 1, warmup_iters) / warmup_iters
            decayed = base_lr * gamma ** jnp.floor(step / step_size)
            return jnp.where(step < warmup_iters, warm, decayed)
        return fn
    raise NotImplementedError(name)


def make_optimizer(
    name: str = "adamw",
    learning_rate: float | optax.Schedule = 1e-4,
    betas: tuple = (0.9, 0.999),
    weight_decay: float = 0.0,
    weight_decay_norm: Optional[float] = None,
    weight_decay_bias: Optional[float] = None,
    clip_grad: float = 0.0,
    lr_factor_fn: Optional[Callable] = None,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """Build the training transformation chain.

    Equivalent knobs to get_optim_general/get_optimizer_params:
    base optimizer + per-leaf weight-decay overrides for norm/bias params +
    per-leaf lr factors + global-norm clipping.
    """
    chain = []
    if clip_grad and clip_grad > 0:
        chain.append(optax.clip_by_global_norm(clip_grad))

    if name in ("adamw", "adam"):
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
    elif name == "adafactor":
        # memory-saving factored second moments — the TPU stand-in for the
        # reference's bitsandbytes AdamW8bit option (optim.py:108)
        chain.append(optax.scale_by_factored_rms())
    elif name == "sgd":
        if momentum:
            chain.append(optax.trace(decay=momentum))
    else:
        raise NotImplementedError(f"optimizer {name!r}")

    # weight decay with per-leaf values (decoupled, like AdamW)
    def wd_mask_value(path, _leaf):
        if is_norm_param(path) and weight_decay_norm is not None:
            return weight_decay_norm
        if is_bias_param(path) and weight_decay_bias is not None:
            return weight_decay_bias
        return weight_decay

    if name in ("adamw", "adafactor") or (name == "sgd" and weight_decay):
        def add_decay(updates, state, params=None):
            assert params is not None
            updates = jax.tree_util.tree_map_with_path(
                lambda path, u, p: u + wd_mask_value(path, p) * p,
                updates, params)
            return updates, state
        chain.append(optax.GradientTransformation(
            lambda params: optax.EmptyState(), add_decay))

    if lr_factor_fn is not None:
        chain.append(scale_by_path(lr_factor_fn))

    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
