"""Debug / numerical-safety utilities.

The reference's only correctness tooling is dist.barrier fences (SURVEY
§5: no sanitizers, no NaN guards). SPMD removes the races; this module
adds what the torch stack lacked:

  * ``checkified(fn)`` — wrap a jitted step with jax.experimental.checkify
    NaN/div/oob checks; errors surface as python exceptions with the op
    location instead of silent NaN propagation.
  * ``assert_all_finite(tree)`` — host-side pytree finiteness sweep for
    post-mortems.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checkified(fn, errors=checkify.float_checks):
    """Return a wrapped fn that raises on NaN/Inf produced inside."""
    cfn = checkify.checkify(fn, errors=errors)

    def wrapped(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def assert_all_finite(tree, name: str = "tree") -> None:
    import numpy as np
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            arr = np.asarray(leaf)
            if not np.isfinite(arr).all():
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}: {bad[:10]}"
            + ("..." if len(bad) > 10 else ""))
