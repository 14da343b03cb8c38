"""Tensor-parallel parameter sharding over the ``model`` mesh axis.

The reference has no TP (SURVEY §2: models fit per GPU); the TPU build
lays out 2-D ``(data, model)`` headroom so larger UNets / bigger batches
can shard parameters. The scheme is GSPMD-driven: kernels are sharded on
their output-feature dim (and Dense inputs on the reduce dim where it
pairs up), XLA propagates shardings through the graph and inserts the
ICI collectives. This is the "annotate and let the compiler partition"
recipe rather than hand-written collective calls.

Rules (per leaf, by path + shape):
  * conv kernels ``[kh, kw, cin, cout]``        -> shard cout
  * Dense kernels ``[cin, cout]``               -> shard cout,
    EXCEPT attention ``to_out`` / ff ``proj_out`` (row-parallel: shard
    cin so the preceding col-parallel matmul feeds it without a gather)
  * biases/scales of col-parallel layers        -> shard dim 0
  * norms, time embeddings, small leaves        -> replicated
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


ROW_PARALLEL_MARKERS = ("to_out", "proj_out")
REPLICATED_MARKERS = ("norm", "ln", "time_embedding", "codebook")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path).lower()


def tp_spec_for(path, leaf, model_axis_size: int) -> P:
    """PartitionSpec for one parameter leaf."""
    s = _path_str(path)
    if any(m in s for m in REPLICATED_MARKERS):
        return P()
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    row = any(m in s for m in ROW_PARALLEL_MARKERS)
    if s.endswith("kernel"):
        if len(shape) == 4:  # conv [kh, kw, cin, cout]
            if row and shape[2] % model_axis_size == 0:
                return P(None, None, "model", None)
            if shape[3] % model_axis_size == 0:
                return P(None, None, None, "model")
        elif len(shape) == 2:  # dense [cin, cout]
            if row and shape[0] % model_axis_size == 0:
                return P("model", None)
            if shape[1] % model_axis_size == 0:
                return P(None, "model")
    elif s.endswith("bias") and len(shape) == 1 and not row:
        if shape[0] % model_axis_size == 0:
            return P("model")
    return P()


def tp_param_sharding(mesh: Mesh, params):
    """NamedShardings for a param tree under the mesh's ``model`` axis."""
    n = mesh.shape.get("model", 1)
    if n == 1:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh,
                                         tp_spec_for(path, leaf, n)),
        params)


def apply_tp(mesh: Mesh, params):
    """Place a param tree with TP shardings."""
    return jax.device_put(params, tp_param_sharding(mesh, params))
