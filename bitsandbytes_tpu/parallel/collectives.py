"""Manual collectives over packed quantized payloads (shard_map tier).

North-star rule (SURVEY.md §2.4 / BASELINE.json): when a collective must
move a quantized weight, transfer the *packed* int4 payload + absmax and
dequantize on-chip **after** the all-gather — 4-8x less ICI traffic than
gathering dequantized bf16.  GSPMD can't express this (it would dequantize
first, because the matmul consumes the dequantized value), so this tier uses
`shard_map` + `jax.lax.all_gather` explicitly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..functional.fourbit import dequantize_4bit
from ..functional.gemm import gemm_4bit
from ..functional.quant_state import QuantState

__all__ = ["all_gather_packed", "tp_gemm_4bit_allgather"]


def all_gather_packed(packed_shard, absmax_shard, axis_name: str):
    """Inside shard_map: all-gather a packed 4-bit payload shard and its
    absmax along ``axis_name``, keeping the payload packed on the wire.

    Returns (packed_full, absmax_full), both tiled (concatenated along the
    leading dim).
    """
    packed_full = jax.lax.all_gather(packed_shard, axis_name, tiled=True)
    absmax_full = jax.lax.all_gather(absmax_shard, axis_name, tiled=True)
    return packed_full, absmax_full


def tp_gemm_4bit_allgather(
    A: jax.Array,
    packed: jax.Array,
    state: QuantState,
    mesh: Mesh,
    axis_name: str = "model",
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """ZeRO-3-style 4-bit matmul: the packed weight lives sharded over
    ``axis_name`` (each device owns N/s output rows); activations are
    replicated along it.  Each shard all-gathers the *packed* payload, then
    runs the fused dequant+GEMM on the full weight — wire traffic is the
    4-bit payload, not bf16 (the reference's FSDP equivalent gathers the
    `quant_storage`-dtype flat param, docs/fsdp_qlora.md:11-15; here it is a
    real XLA all-gather on ICI).

    For output-stationary TP (each shard computing only its rows) use GSPMD
    via :func:`bitsandbytes_tpu.parallel.shard_quantized_tree` instead; this
    path is for weight-sharded (FSDP) layouts where the full output is
    needed per device.
    """
    N, K = state.shape
    absmax = state.dequant_absmax()  # de-nest outside the collective

    def body(a, p_shard, am_shard):
        p_full, am_full = all_gather_packed(p_shard, am_shard, axis_name)
        full_state = QuantState.make(
            absmax=am_full.reshape(-1),
            shape=(N, K),
            quant_type=state.quant_type,
            blocksize=state.blocksize,
            dtype=state.dtype,
        )
        return gemm_4bit(a, p_full.reshape(-1, 1), full_state)

    n_shards = mesh.shape[axis_name]
    if N % n_shards or (N // n_shards) * K % 2:
        raise ValueError(f"N={N} must split into whole packed rows over {n_shards} shards")

    a_spec = P()  # replicated activations
    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(a_spec, P(axis_name, None), P(axis_name)),
        out_specs=P(),
        check_rep=False,
    )(A, packed.reshape(N, K // 2), absmax.reshape(N, K // state.blocksize))
    if bias is not None:
        out = out + bias
    return out
