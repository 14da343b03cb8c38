"""Train state pytree (params + optimizer state + step + optional EMA).

Mirrors the logical checkpoint layout of the reference save dicts
(``{step, epoch, vae/unet, opt, scaler?}``; trainers_ae.py:534-548,
trainers_ldm_cond.py:1844-1877) as a single flax struct.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct


def cast_f32(tree, dtype):
    """Cast every fp32 leaf to ``dtype`` (no-op for fp32); non-float and
    already-low-precision leaves (int8 weights, packed scale tiles) pass
    through untouched. The torch-autocast equivalent for pure-function
    trainers: masters stay fp32, forwards run on a cast working copy."""
    import jax.numpy as jnp
    if dtype == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    grad_accum: Optional[Any] = None
    micro_step: Optional[jax.Array] = None
    accumulate: int = struct.field(pytree_node=False, default=1)
    tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                    default=None)

    @classmethod
    def create(cls, params, tx, ema: bool = False, mesh=None,
               zero1: bool = False, accumulate: int = 1,
               tp: bool = False):
        """``zero1``: shard the optimizer state over the mesh's data axis
        (the ZeroRedundancyOptimizer equivalent, reference
        optim.py:102-126). ``accumulate``: gradient accumulation factor
        (reference gradient_accumulate_every, trainers_ae.py:326-341).
        ``tp``: the params are tensor-parallel over the mesh's model axis
        — compose the ZeRO-1 data-axis sharding with the TP specs."""
        import jax.numpy as jnp
        opt_state = tx.init(params)
        if zero1 and mesh is not None:
            from ..parallel import zero1_opt_state_sharding
            opt_state = jax.device_put(
                opt_state, zero1_opt_state_sharding(mesh, opt_state,
                                                    tp=tp))
        zeros_like = lambda t: jax.tree_util.tree_map(  # noqa: E731
            jnp.zeros_like, t)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            # real copies, not aliases — donated train steps must not see
            # the same buffer twice (params + ema)
            ema_params=jax.tree_util.tree_map(jnp.copy, params)
            if ema else None,
            grad_accum=zeros_like(params) if accumulate > 1 else None,
            micro_step=jnp.zeros((), jnp.int32) if accumulate > 1 else None,
            accumulate=accumulate,
            tx=tx,
        )

    def eval_params(self):
        """Parameters to evaluate/sample with — EMA shadow when kept
        (reference evaluates the EMA model when ema_on, unet.py:443-459)."""
        return self.ema_params if self.ema_params is not None else self.params

    def _apply(self, grads, ema_decay):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + (1.0 - ema_decay) * p,
                new_ema, new_params)
        return new_params, new_opt_state, new_ema

    def apply_gradients(self, grads, ema_decay: float = 0.9999):
        """Optimizer update; with ``accumulate > 1`` gradients are summed
        in ``grad_accum`` and the optimizer steps every N micro-batches on
        the mean gradient (== reference's loss / gradient_accumulate_every
        followed by a conditional step, trainers_ae.py:326-341). ``step``
        counts optimizer steps, as in the reference."""
        if self.accumulate <= 1:
            new_params, new_opt_state, new_ema = self._apply(grads, ema_decay)
            return self.replace(step=self.step + 1, params=new_params,
                                opt_state=new_opt_state, ema_params=new_ema)

        import jax.numpy as jnp
        accum = jax.tree_util.tree_map(jnp.add, self.grad_accum, grads)
        micro = self.micro_step + 1
        do_step = (micro % self.accumulate) == 0

        def step_branch(_):
            mean = jax.tree_util.tree_map(
                lambda g: g / self.accumulate, accum)
            new_params, new_opt_state, new_ema = self._apply(mean, ema_decay)
            zeros = jax.tree_util.tree_map(jnp.zeros_like, accum)
            return (self.step + 1, new_params, new_opt_state, new_ema, zeros)

        def hold_branch(_):
            return (self.step, self.params, self.opt_state, self.ema_params,
                    accum)

        step, params, opt_state, ema, accum = jax.lax.cond(
            do_step, step_branch, hold_branch, None)
        return self.replace(step=step, params=params, opt_state=opt_state,
                            ema_params=ema, grad_accum=accum,
                            micro_step=micro)
