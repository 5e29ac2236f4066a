"""Sharding rules for quantized pytrees (GSPMD/pjit).

Key invariant (SURVEY.md §2.4): a shard must own whole quantization blocks.
Packed 4-bit weights are canonically ``[(N*K)//2, 1]`` uint8 with row-major
byte order, so sharding the *output* dimension N splits the flat payload
contiguously into whole rows — each shard gets its rows' packed bytes and
their per-block absmax.  Sharding K requires ``(K/shards) % blocksize == 0``
and a 2-D ``[N, K//2]`` payload view.

The reference has no equivalent (it delegates to FSDP's flat-param engine
via the `quant_storage` dtype masquerade, nn/modules.py:545); here the
rules are explicit and checked.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..functional.quant_state import QuantState
from ..nn.modules import Int8TensorState, QuantizedTensor

__all__ = [
    "make_mesh",
    "leaf_sharding",
    "shard_quantized_tree",
    "llama_param_specs",
    "llama_tp_rules",
]


def make_mesh(axes: dict[str, int], devices=None) -> Mesh:
    """Build a mesh from ``{'data': d, 'model': m, ...}`` axis sizes."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(list(axes.values())))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(tuple(axes.values()))
    return Mesh(dev, tuple(axes.keys()))


def _axis_size(mesh: Optional[Mesh], axis) -> int:
    if mesh is None or axis is None:
        return 1
    if isinstance(axis, (tuple, list)):
        return int(np.prod([mesh.shape[a] for a in axis]))
    return mesh.shape[axis]


def _quantized_tensor_specs(qt: QuantizedTensor, spec: P, mesh: Optional[Mesh] = None) -> QuantizedTensor:
    """Derive per-leaf PartitionSpecs for a QuantizedTensor from the spec of
    its *logical* [N, K] weight.  Returns a QuantizedTensor-shaped pytree of
    PartitionSpecs.

    Sharding rules per payload layout (invariant: a shard owns whole
    quantization blocks and whole packed bytes):

    * ``"flat"`` ``[(NK)/2, 1]``: N-sharding only (contiguous rows of the
      flat byte stream); K-sharding raises (relayout to ``"paired"``).
    * ``"2d"`` ``[N, K/2]``: N-sharding (whole rows); K-sharding raises
      (the flat absmax cannot be split along K contiguously — relayout to
      ``"paired"``, whose absmax is stored ``[K/bs, N]``).
    * ``"paired"`` ``[N/2, K]``: N-sharding in whole byte rows (the shard
      size must keep row *pairs* together: (N/shards) % 2 == 0) and
      K-sharding in whole quant-block multiples ((K/shards) % bs == 0) —
      the FSDP-style layout the reference gets from its `quant_storage`
      masquerade (nn/modules.py:545, docs/source/fsdp_qlora.md:11-15),
      here with explicit block-aligned guarantees.  Axes that don't divide
      cleanly fall back to replication on that axis.
    """
    state = qt.state
    N, K = state.shape
    n_axis = spec[0] if len(spec) > 0 else None
    k_axis = spec[1] if len(spec) > 1 else None
    layout = state.layout
    bs = state.blocksize

    if k_axis is not None and layout != "paired":
        raise NotImplementedError(
            "K-sharding of 4-bit weights requires layout='paired' "
            "([N/2, K] payload with [K/bs, N] absmax); relayout with "
            "quantize_4bit(..., layout='paired')"
        )

    n_sh = _axis_size(mesh, n_axis)
    k_sh = _axis_size(mesh, k_axis)
    if N % max(n_sh, 1):
        n_axis = None
        n_sh = 1

    if layout == "paired":
        # dim0 = row pairs: each shard must own whole byte rows AND whole
        # row pairs; dim1 = K: each shard must own whole quant blocks.
        if n_axis is not None and (N // n_sh) % 2:
            n_axis = None
        if k_axis is not None and (K // max(k_sh, 1)) % bs:
            k_axis = None
        data_spec = P(n_axis, k_axis)
        absmax_spec = P() if state.nested else P(k_axis, n_axis)  # [K/bs, N]
    else:
        # flat payload: N-shard = contiguous rows of the flat byte stream;
        # 2d payload: N-shard = whole rows
        data_spec = P(n_axis, None)
        # absmax: flat [N*K/bs] float32, aligned to row boundaries (K % bs
        # cases pad within the flat stream; only shard when blocks divide).
        nblocks = -(-N * K // bs)
        absmax_axis = (
            n_axis if (N * K) % bs == 0 and nblocks % max(n_sh, 1) == 0 else None
        )
        absmax_spec = P() if state.nested else P(absmax_axis)

    state_specs = QuantState(
        absmax=absmax_spec,
        code=P(),  # 16-entry codebook: replicate
        blocksize=state.blocksize,
        quant_type=state.quant_type,
        dtype=state.dtype,
        shape=state.shape,
        offset=None if state.offset is None else P(),
        state2=None
        if state.state2 is None
        # Nested stats: uint8 codes + their own tiny scales.  Their 256-wide
        # blocks don't align to N-row boundaries, and the whole chain is
        # ~1/32 the payload size — replicate it.
        else QuantState(
            absmax=P(),
            code=P(),
            blocksize=state.state2.blocksize,
            quant_type=state.state2.quant_type,
            dtype=state.state2.dtype,
            shape=state.state2.shape,
        ),
        layout=layout,
    )
    return QuantizedTensor(data=data_spec, state=state_specs)


def _int8_specs(w: Int8TensorState, spec: P) -> Int8TensorState:
    n_axis = spec[0] if len(spec) > 0 else None
    k_axis = spec[1] if len(spec) > 1 else None
    return Int8TensorState(CB=P(n_axis, k_axis), SCB=P(n_axis))


def leaf_sharding(leaf, spec: P, mesh: Optional[Mesh] = None):
    """PartitionSpec pytree for a param leaf given its logical weight spec."""
    if isinstance(leaf, QuantizedTensor):
        return _quantized_tensor_specs(leaf, spec, mesh)
    if isinstance(leaf, Int8TensorState):
        return _int8_specs(leaf, spec)
    return spec


def _is_q(x):
    return isinstance(x, (QuantizedTensor, Int8TensorState))


def shard_quantized_tree(params, mesh: Mesh, spec_fn: Callable):
    """device_put a quantized param tree onto ``mesh``.

    ``spec_fn(path, leaf) -> PartitionSpec`` gives the spec of each leaf's
    *logical* weight; quantized leaves get congruent payload/absmax specs
    derived automatically.
    """
    def put(path, leaf):
        spec = spec_fn(path, leaf)
        spec_tree = leaf_sharding(leaf, spec, mesh)
        shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            spec_tree,
            is_leaf=lambda s: isinstance(s, P),
        )
        return jax.device_put(leaf, shardings)

    return jax.tree_util.tree_map_with_path(put, params, is_leaf=_is_q)


# ---------------------------------------------------------------------------
# Llama rules
# ---------------------------------------------------------------------------

# Megatron-style TP over the 'model' axis, all column-parallel (output dim):
# qkv/gate/up naturally shard N; wo/down also shard N (their K-contraction is
# then partial per-shard and XLA inserts the all-reduce under GSPMD).
_LLAMA_TP_N_SHARDED = ("wq", "wk", "wv", "wo", "gate", "up", "down")


def llama_tp_rules(model_axis: str = "model"):
    """spec_fn for :func:`shard_quantized_tree` implementing tensor
    parallelism on a Llama param tree."""

    def spec_fn(path, leaf):
        names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        last = names[-1] if names else None
        if last in _LLAMA_TP_N_SHARDED:
            return P(model_axis, None)
        if last in ("embed", "lm_head"):
            return P(model_axis, None)
        return P()  # norms etc: replicate

    return spec_fn


def llama_param_specs(mesh: Mesh, params, model_axis: str = "model"):
    """Shard a Llama param tree (fp or quantized) for tensor parallelism."""
    return shard_quantized_tree(params, mesh, llama_tp_rules(model_axis))


def kv_cache_specs(
    cache, data_axis: str = "data", model_axis: str = "model", mesh: Optional[Mesh] = None
):
    """PartitionSpec pytree for a KV cache [L, B, KVH, S, hd]: batch over
    ``data_axis``, KV heads over ``model_axis`` (matching Megatron-style
    attention-head sharding).  Works for bf16 KVCache and Int8KVCache
    (scale arrays [L, B, KVH, S] shard congruently).  Axes that don't
    divide evenly on ``mesh`` fall back to replication.

    PagedKVCache shards the KV-HEAD axis (dim 2) of its physical block
    pool over ``model_axis``: every device holds ALL pool blocks for its
    heads, so the block-table indirection stays device-local (the tables
    replicate — any slot may reference any pool block).  Its dim 1 is the
    physical block-pool index, not batch, so ``data_axis`` never applies
    to the pool; batch parallelism enters through q/tables/lengths at the
    attention call (ops/pallas/flash_cached.flash_attention_paged_tp)."""
    from ..models.llama import PagedKVCache

    def fit(axis, dim):
        if mesh is not None and dim % _axis_size(mesh, axis):
            return None
        return axis

    if isinstance(cache, PagedKVCache):

        def pspec(x):
            if x.ndim == 5:  # pool payload [L, NB, KVH, BS, hd]
                return P(None, None, fit(model_axis, x.shape[2]), None, None)
            if x.ndim == 4:  # int8 pool scales [L, NB, KVH, BS]
                return P(None, None, fit(model_axis, x.shape[2]), None)
            return P()  # tables: replicated

        return jax.tree_util.tree_map(pspec, cache)

    def spec(x):
        if x.ndim == 5:  # k/v payload
            return P(None, fit(data_axis, x.shape[1]), fit(model_axis, x.shape[2]), None, None)
        if x.ndim == 4:  # int8 scales
            return P(None, fit(data_axis, x.shape[1]), fit(model_axis, x.shape[2]), None)
        return P()

    return jax.tree_util.tree_map(spec, cache)


def shard_kv_cache(cache, mesh: Mesh, data_axis: str = "data", model_axis: str = "model"):
    """device_put a KV cache with batch/head sharding."""
    specs = kv_cache_specs(cache, data_axis, model_axis, mesh=mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )
