"""Test configuration.

By default tests run on CPU with 8 virtual devices so sharding logic is
exercised without TPU hardware (the SURVEY.md §4 strategy).  Set
``BNB_TEST_DEVICE=tpu`` to run the same suite against real TPU chips
(mirrors the reference's BNB_TEST_DEVICE, tests/helpers.py:22-25).
"""

import os

if os.environ.get("BNB_TEST_DEVICE", "cpu") == "cpu":
    # jax may be pre-imported (sitecustomize) with a TPU platform; switching
    # via jax.config still works as long as no backend was initialized.
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # jax 0.9 + the axon PJRT plugin ignores --xla_force_host_platform_
    # device_count; the config knob is what actually works.
    jax.config.update("jax_num_cpu_devices", 8)
    # Persistent compile cache (CPU runs only — the remote-TPU axon backend
    # compiles through the tunnel and must not be disk-cached): this rig has
    # ONE core and the suite is compile-dominated, so warm re-runs drop from
    # ~10+ min to a few minutes.  Wiped automatically when jaxlib changes
    # (the cache key covers the compiler version).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import jax as _jax

# Test-side reference matmuls must be true f32 on TPU: the terminal sets
# --xla_allow_excess_precision=true, which truncates f32 dots to bf16 and
# makes naive jnp references LESS accurate than the kernels under test.
_jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def seed_rng():
    np.random.seed(0)
    yield


def pytest_collection_modifyitems(config, items):
    import jax

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    skip_tpu = pytest.mark.skip(reason="requires TPU hardware")
    for item in items:
        if "tpu_only" in item.keywords and not on_tpu:
            item.add_marker(skip_tpu)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu_only: test requires real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running test")
