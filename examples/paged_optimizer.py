"""Paged (host-offloaded) 8-bit optimizer states (reference
examples/xpu/paged_xpu_training.py): states live in pinned host memory and
stream to the device during the update."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import jax.numpy as jnp
import optax

from bitsandbytes_tpu import optim


def main():
    params = {"w": jax.random.normal(jax.random.PRNGKey(0), (1024, 1024))}
    opt = optim.paged_adamw8bit(1e-3)
    state = opt.init(params)  # uint8 states placed in pinned_host when available
    for i in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: 0.01 * jax.random.normal(jax.random.PRNGKey(i), p.shape), params
        )
        # eager opt.update re-pins the new states to host every step (sticky
        # paging); jitted training loops use optim.make_paged_update(opt,
        # state) instead, whose out_shardings pin the state output to host
        # with the old buffers donated.
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        kinds = {
            getattr(x.sharding, "memory_kind", "?")
            for x in jax.tree_util.tree_leaves(state.leaves)
        }
        print(
            f"step {i}: |w| = {float(jnp.abs(params['w']).mean()):.5f} "
            f"(state memory: {sorted(kinds)})"
        )


if __name__ == "__main__":
    main()
