"""Device mesh + sharding rules.

The reference's only parallelism is DDP data-parallel with optional ZeRO-1
optimizer-state sharding (SURVEY §2: torch DDP `tools/main_ldm.py:189-193`,
``ZeroRedundancyOptimizer`` `ldmseg/trainers/optim.py:102-126`). The
TPU-native equivalents:

  * DDP            -> batch sharded over a 1-D ``data`` mesh axis; gradient
                      all-reduce is inserted by XLA from the shardings.
  * ZeRO-1         -> optimizer-state leaves sharded over ``data`` on their
                      largest divisible axis (jax.sharding.NamedSharding).
  * NCCL           -> ICI/DCN collectives, chosen by the compiler.

A second ``model`` axis is laid out for headroom (the reference never
shards parameters; models fit per chip), so meshes are created as
``(data, model)`` with ``model=1`` by default.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    devs = np.asarray(devices[: num_data * num_model]).reshape(
        num_data, num_model)
    return Mesh(devs, ("data", "model"))


def shard_batch(mesh: Mesh, tree):
    """Place a host batch with the leading axis sharded over ``data``."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_spec(ndim: int) -> P:
    return P("data", *([None] * (ndim - 1)))


def param_sharding(mesh: Mesh, params) -> object:
    """Replicated parameter shardings (pure data parallel)."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), params)


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2,
                       keys=None):
    """Double-buffered host->device transfer: batches are scattered onto
    the mesh ``size`` steps ahead so the input pipeline overlaps device
    compute (the torch DataLoader ``pin_memory``/prefetch equivalent).

    ``keys``: optional subset of batch keys to transfer; the rest pass
    through untouched (meta/text stay host-side).
    """
    import collections
    buf = collections.deque()

    def put(batch):
        if keys is None:
            arrays = {k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
        else:
            arrays = {k: batch[k] for k in keys if k in batch}
        rest = {k: v for k, v in batch.items() if k not in arrays}
        return {**shard_batch(mesh, arrays), **rest}

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def zero1_opt_state_sharding(mesh: Mesh, opt_state,
                             tp: bool = False) -> object:
    """ZeRO-1 style sharding: each optimizer-state leaf is sharded over the
    ``data`` axis along its largest evenly-divisible dimension; leaves that
    cannot be divided stay replicated.

    This mirrors ``ZeroRedundancyOptimizer`` (reference optim.py:102-126):
    the optimizer state (adam moments) is partitioned across data-parallel
    workers while parameters remain replicated.

    ``tp``: compose with tensor parallelism — moment leaves first take the
    TP spec of the parameter they mirror (the optax state paths embed the
    param paths, so :func:`~ldmseg_tpu.parallel.tp.tp_spec_for` applies
    directly), then the ``data`` axis is added on the first still-free
    divisible dimension. ZeRO-1 and TP shard DIFFERENT axes of the same
    moment tensor.
    """
    n = mesh.shape["data"]
    n_model = mesh.shape.get("model", 1)
    if tp and n_model > 1:
        from .tp import tp_spec_for

        def spec_for_tp(path, x):
            if not hasattr(x, "ndim") or x.ndim == 0:
                return NamedSharding(mesh, P())
            base = list(tp_spec_for(path, x, n_model))
            base += [None] * (x.ndim - len(base))
            for axis in range(x.ndim):
                if base[axis] is None and x.shape[axis] % n == 0 \
                        and x.shape[axis] >= n:
                    base[axis] = "data"
                    break
            return NamedSharding(mesh, P(*base))

        return jax.tree_util.tree_map_with_path(spec_for_tp, opt_state)

    def spec_for(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return NamedSharding(mesh, P())
        for axis in range(x.ndim):
            if x.shape[axis] % n == 0 and x.shape[axis] >= n:
                parts: list = [None] * x.ndim
                parts[axis] = "data"
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, opt_state)
