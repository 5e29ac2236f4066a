"""Pipeline parallelism (GPipe) over a mesh axis.

The reference has no parallelism engine (SURVEY.md §2.4); for the TPU-native
framework, pipeline parallelism is a first-class schedule: transformer
layers are stacked along a leading *stage* axis sharded over the ``pipe``
mesh axis, and microbatches flow stage-to-stage over ICI via
``jax.lax.ppermute`` (the scaling-book inner-pipeline pattern).  Quantized
layer weights shard along the stage axis exactly like any pytree — each
stage holds its layers' packed payloads + absmax.

Gradients flow through ``ppermute`` natively, so the same schedule serves
training (GPipe with re-execution left to ``jax.checkpoint`` if desired).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

__all__ = ["gpipe", "stack_stage_params"]


def stack_stage_params(layer_params_list, n_stages: int):
    """Stack per-layer param pytrees [L entries] into a pytree whose leaves
    have leading dims [n_stages, L // n_stages, ...] for pipe-sharding."""
    L = len(layer_params_list)
    if L % n_stages:
        raise ValueError(f"{L} layers do not split over {n_stages} stages")
    per = L // n_stages
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_params_list)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(n_stages, per, *x.shape[1:]), stacked
    )


def gpipe(
    layer_fn: Callable,
    stage_params,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "pipe",
    n_microbatches: int = None,
):
    """Run ``x`` through ``n_stages * layers_per_stage`` layers pipelined
    over the ``axis`` mesh dimension.

    Args:
      layer_fn: ``(one_layer_params, activations) -> activations`` — applied
        sequentially to each layer a stage owns.
      stage_params: pytree with leaves ``[n_stages, layers_per_stage, ...]``
        (see :func:`stack_stage_params`); sharded/shardable on dim 0.
      x: ``[batch, ...]`` activations; batch must divide into microbatches.
      n_microbatches: defaults to the number of stages (classic GPipe).

    Returns activations after all layers, same shape as ``x``.
    """
    n_stages = mesh.shape[axis]
    if n_microbatches is None:
        n_microbatches = n_stages
    B = x.shape[0]
    if B % n_microbatches:
        raise ValueError(f"batch {B} does not divide into {n_microbatches} microbatches")
    mb = B // n_microbatches
    x_mb = x.reshape(n_microbatches, mb, *x.shape[1:])

    def body(stage_p, xs):
        # stage_p leaves: [1, layers_per_stage, ...] (this stage's slice)
        stage_p = jax.tree_util.tree_map(lambda t: t[0], stage_p)
        idx = jax.lax.axis_index(axis)
        T = n_microbatches + n_stages - 1

        def apply_stage(p, a):
            per = jax.tree_util.tree_leaves(p)[0].shape[0]
            for i in range(per):
                a = layer_fn(jax.tree_util.tree_map(lambda t: t[i], p), a)
            return a

        def step(t, carry):
            state, outbuf = carry
            # stage 0 ingests microbatch t (while available); other stages
            # consume what arrived from the left neighbor
            mb_idx = jnp.clip(t, 0, n_microbatches - 1)
            feed = jax.lax.dynamic_index_in_dim(xs, mb_idx, axis=0, keepdims=False)
            inp = jnp.where(idx == 0, feed, state)
            out = apply_stage(stage_p, inp)
            # last stage writes its finished microbatch (valid when
            # t >= n_stages - 1)
            done_idx = jnp.clip(t - (n_stages - 1), 0, n_microbatches - 1)
            is_valid = jnp.logical_and(idx == n_stages - 1, t >= n_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outbuf, done_idx, axis=0, keepdims=False)
            upd = jnp.where(is_valid, out, cur)
            outbuf = jax.lax.dynamic_update_index_in_dim(outbuf, upd, done_idx, axis=0)
            # shift activations to the next stage
            state = jax.lax.ppermute(
                out, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
            )
            return state, outbuf

        state = jnp.zeros_like(xs[0])
        outbuf = jnp.zeros_like(xs)
        state, outbuf = jax.lax.fori_loop(0, T, step, (state, outbuf))
        # broadcast results from the last stage to everyone
        outbuf = jax.lax.ppermute(
            outbuf, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)]
        )  # last stage -> stage 0
        outbuf = jax.lax.all_gather(outbuf, axis)[0]  # stage 0's copy...
        return outbuf

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_rep=False,
    )(stage_params, x_mb)
    return out.reshape(B, *x.shape[1:])
