"""Paged (host-offloaded) optimizer states.

TPU-native analog of the reference's CUDA unified-memory paging
(functional.py:91-109 `get_paged`/`prefetch_tensor`,
pythonInterface.cpp:557-585 `cudaMallocManaged`/`cudaMemPrefetchAsync`):
on TPU, optimizer states are placed in **host memory** via JAX's memory-kind
API (`pinned_host`) and streamed to the device by XLA when the update step
runs.  When resident states fit in HBM there is zero overhead; when
offloaded, transfer overlaps with the step's compute, mirroring the
reference's paging behavior (docs/source/explanations/optimizers.mdx:46-52).
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)

__all__ = ["to_host", "paged_state_sharding", "host_memory_supported"]


def host_memory_supported() -> bool:
    try:
        dev = jax.devices()[0]
        return "pinned_host" in getattr(dev, "memory_kinds", lambda: ())()
    except Exception:
        return False


def _host_sharding(x):
    dev = jax.devices()[0]
    s = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")
    return s


def to_host(tree):
    """Move every array leaf of `tree` to host (pinned) memory.  No-op with a
    warning if the backend lacks a pinned_host memory space."""
    if not host_memory_supported():
        logger.warning(
            "paged optimizer states requested but this backend has no "
            "pinned_host memory space; states stay in device memory"
        )
        return tree
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, _host_sharding(x)), tree)


def paged_state_sharding(tree):
    """Sharding pytree (memory_kind=pinned_host) for use as jit
    in/out_shardings of the optimizer-state argument, keeping paged states
    host-resident across steps."""
    return jax.tree_util.tree_map(lambda x: _host_sharding(x), tree)
