"""Test configuration: force a virtual 8-device CPU mesh before jax import.

This is the standard JAX way to test pjit/sharding without TPU hardware
(SURVEY.md §4). Must run before anything imports jax.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests
# must run on the virtual CPU mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = os.environ.get("LDMSEG_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pre-imports jax with JAX_PLATFORMS=axon; the env
# mutation above only helps XLA_FLAGS (read lazily at backend init). Force
# the platform through the config, which always wins.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_default_matmul_precision", "highest")
# Per-program compiles are slow in this environment (~0.6s even for tiny
# shapes); a persistent cache makes re-runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
