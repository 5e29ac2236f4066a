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

__all__ = [
    "to_host",
    "paged_state_sharding",
    "host_memory_supported",
    "repin_if_eager",
    "make_paged_update",
]


def host_memory_supported() -> bool:
    try:
        dev = jax.devices()[0]
        return "pinned_host" in {m.kind for m in dev.addressable_memories()}
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


def _is_eager(tree) -> bool:
    leaves = jax.tree_util.tree_leaves(tree)
    return bool(leaves) and not any(isinstance(x, jax.core.Tracer) for x in leaves)


def repin_if_eager(tree):
    """Re-pin array leaves to host memory when called OUTSIDE a jit trace;
    a no-op on traced values (placement is the jitted caller's out_shardings
    concern — see :func:`make_paged_update`)."""
    if not _is_eager(tree) or not host_memory_supported():
        return tree
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, _host_sharding(x)), tree)


def unpin_if_eager(tree):
    """Stream host-pinned leaves to device memory when called OUTSIDE a jit
    trace (the page-in half of a paged update: eager compute on pinned_host
    operands is rejected by the CPU backend and slow elsewhere)."""
    if not _is_eager(tree):
        return tree

    def unpin(x):
        if getattr(getattr(x, "sharding", None), "memory_kind", None) == "pinned_host":
            dev = x.sharding._device_assignment[0]
            return jax.device_put(x, jax.sharding.SingleDeviceSharding(dev))
        return x

    return jax.tree_util.tree_map(unpin, tree)


def make_paged_update(optimizer, opt_state, donate: bool = True):
    """Jit ``optimizer.update`` for host-resident (paged) states: the state
    is streamed HBM-ward inside the program, updated, and the new state
    written back to pinned_host, with the old state's buffers donated — the
    TPU analog of the reference's cudaMallocManaged paging
    (functional.py:91-109; docs/source/explanations/optimizers.mdx:46-52).

    ``opt_state`` supplies the state pytree structure for the sharding
    annotations.  Requires a backend whose compiler executes memory-space
    annotations (TPU); on the CPU backend the device_put annotations are
    ignored — there, the plain eager ``optimizer.update`` already pages via
    :func:`unpin_if_eager`/:func:`repin_if_eager`.

    Returns ``update(grads, opt_state, params) -> (updates, new_state)``.
    """
    # Mirror each leaf's CURRENT placement: `init` pins the state leaves to
    # pinned_host but scalars like `step` stay device-resident — pinning the
    # whole tree would reject the real state at call time.
    def cur_sharding(x):
        return getattr(x, "sharding", None)

    def is_pinned(x):
        return getattr(cur_sharding(x), "memory_kind", None) == "pinned_host"

    placement = jax.tree_util.tree_map(cur_sharding, opt_state)
    dev0 = jax.devices()[0]
    paged_in = jax.tree_util.tree_map(
        lambda x: jax.sharding.SingleDeviceSharding(dev0)
        if is_pinned(x)
        else cur_sharding(x),
        opt_state,
    )

    def update(grads, state, params):
        state = jax.device_put(state, paged_in)  # page in
        return optimizer.update(grads, state, params)

    return jax.jit(
        update,
        in_shardings=(None, placement, None),
        out_shardings=(None, placement),  # page out: new state lands on host
        donate_argnums=(1,) if donate else (),
    )
