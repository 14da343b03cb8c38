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


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                    default=None)

    @classmethod
    def create(cls, params, tx, ema: bool = False, mesh=None,
               zero1: bool = False):
        """``zero1``: shard the optimizer state over the mesh's data axis
        (the ZeroRedundancyOptimizer equivalent, reference
        optim.py:102-126)."""
        import jax.numpy as jnp
        opt_state = tx.init(params)
        if zero1 and mesh is not None:
            from ..parallel import zero1_opt_state_sharding
            opt_state = jax.device_put(
                opt_state, zero1_opt_state_sharding(mesh, opt_state))
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            ema_params=jax.tree_util.tree_map(lambda x: x, params)
            if ema else None,
            tx=tx,
        )

    def apply_gradients(self, grads, ema_decay: float = 0.9999):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + (1.0 - ema_decay) * p,
                new_ema, new_params)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, ema_params=new_ema)
