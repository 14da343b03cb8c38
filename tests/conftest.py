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

import signal  # noqa: E402

import pytest  # noqa: E402
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

# Per-test wall-clock cap: one hung compile must not eat a whole round
# (no pytest-timeout in this image — SIGALRM in the main thread does the
# same job; big integration tests legitimately take minutes on this
# 1-CPU VM, hence the generous default).
TEST_TIMEOUT_S = int(os.environ.get("LDMSEG_TEST_TIMEOUT", "1200"))


# Smoke tier (-m smoke): fast, wide-coverage modules for round-end
# hygiene — one module per subsystem family, no multi-minute trainer/CLI
# integrations. Keep the whole tier under ~10 min on this 1-CPU VM.
SMOKE_MODULES = {
    "test_bits",            # bits codec vs numpy oracle
    "test_native_codec",    # C++ codec binding
    "test_ddim",            # schedule tables + sampler steps
    "test_golden_ddim",     # golden-trajectory regression
    "test_dpm",             # DPM-Solver++ sampler
    "test_grid_sample",     # torch-parity point sampling
    "test_panoptic_post",   # post-processing
    "test_evals",           # VPQ/PQ numpy-oracle parity
    "test_train_state",     # EMA/accum/optimizer state machine
    "test_data",            # datasets/loader/collate
    "test_point_losses",    # PointRend losses
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::")[0].rsplit("/", 1)[-1][:-3]
        if mod in SMOKE_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    def _alarm(signum, frame):
        raise TimeoutError(
            f"{item.nodeid} exceeded {TEST_TIMEOUT_S}s "
            f"(LDMSEG_TEST_TIMEOUT)")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(TEST_TIMEOUT_S)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
