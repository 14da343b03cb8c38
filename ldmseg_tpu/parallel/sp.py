"""Spatial parallelism (SP) for the full-resolution VAE stages.

The reference has no equivalent (its only parallelism is DDP,
`tools/main_ldm.py:189-193`); this is a TPU-native extension. At
production image sizes the pixel-space SegVAE/ImageVAE activations are
the memory peak of the pipeline (a [B, 1024, 2048, 320] bf16 tensor is
1.3 GB/layer; the latent UNet is comparatively small). GSPMD supports
spatial partitioning of convolutions natively: sharding the H axis of
NHWC activations over the ``model`` mesh axis makes XLA insert the halo
exchanges for conv windows and the cross-shard reductions for
GroupNorm stats automatically — no manual ppermute choreography, and
the collectives ride ICI.

Usage: annotate the pixel-space tensors entering (and leaving) the VAE
encoders/decoders with :func:`spatial_constraint`; everything the
compiler propagates between the annotations runs H-sharded. Latent-space
tensors should be re-annotated with the plain batch spec so the UNet's
own (data, model) layouts (tensor parallel, ZeRO-1) are unaffected.

Enabled by ``cfg['spatial_parallel']`` in TrainerDiffusion; validated
for numerical equivalence vs the unsharded path in
``tests/test_spatial_parallel.py`` and exercised by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_spec(ndim: int = 4) -> P:
    """Batch over ``data``, H (second axis, NHWC) over ``model``."""
    return P("data", "model", *([None] * (ndim - 2)))


def has_spatial_axis(mesh: Mesh | None) -> bool:
    return mesh is not None and mesh.shape.get("model", 1) > 1


def spatial_constraint(x, mesh: Mesh | None):
    """H-shard an NHWC activation over the ``model`` axis (no-op when the
    mesh has no model axis to spread over, or H does not divide)."""
    if not has_spatial_axis(mesh) or x.ndim < 3:
        return x
    if x.shape[1] % mesh.shape["model"] != 0:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, spatial_spec(x.ndim)))


def batch_constraint(x, mesh: Mesh | None):
    """Back to batch-only sharding (the UNet/latent-space layout)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))
