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

__all__ = ["all_gather_packed", "tp_gemm_4bit_allgather", "tp_gemm_4bit_ring"]


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
    n_shards = mesh.shape[axis_name]
    a_spec = P()  # replicated activations

    if state.layout == "paired":
        # payload [N/2, K] gathered on dim 0 (row pairs); absmax [K/bs, N]
        # gathered on dim 1 — both stay in the kernel-native orientation.
        if N % n_shards or (N // n_shards) % 2:
            raise ValueError(
                f"N={N} must split into whole row pairs over {n_shards} shards"
            )
        absmax_t = state.dequant_absmax_t()  # de-nest outside the collective

        def body_paired(a, p_shard, am_shard):
            p_full = jax.lax.all_gather(p_shard, axis_name, tiled=True)
            am_full = jax.lax.all_gather(am_shard, axis_name, tiled=True, axis=1)
            full_state = QuantState.make(
                absmax=am_full,
                shape=(N, K),
                quant_type=state.quant_type,
                blocksize=state.blocksize,
                dtype=state.dtype,
                layout="paired",
            )
            return gemm_4bit(a, p_full, full_state)

        out = shard_map(
            body_paired,
            mesh=mesh,
            in_specs=(a_spec, P(axis_name, None), P(None, axis_name)),
            out_specs=P(),
            check_rep=False,
        )(A, packed.reshape(N // 2, K), absmax_t)
        if bias is not None:
            out = out + bias
        return out

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

    if N % n_shards or (N // n_shards) * K % 2:
        raise ValueError(f"N={N} must split into whole packed rows over {n_shards} shards")

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


def tp_gemm_4bit_ring(
    A: jax.Array,
    packed: jax.Array,
    state: QuantState,
    mesh: Mesh,
    axis_name: str = "model",
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """FSDP-style 4-bit matmul with the packed-weight gather *overlapped*
    with compute (SURVEY.md §2.4 north star; BASELINE >=90% scaling rule).

    The weight lives N-sharded over ``axis_name`` in the ``paired`` layout;
    activations are replicated.  Instead of one blocking all-gather, the
    shards circulate a ring: at every step each device runs the fused
    dequant+GEMM on the packed chunk it currently holds while
    ``lax.ppermute`` forwards that chunk to its neighbor — the ICI transfer
    of chunk s+1 rides under the MXU/VPU work on chunk s, so the exposed
    communication is ~one chunk instead of the whole weight.  Wire traffic
    stays the 4-bit payload + absmax (never dequantized bf16).

    The reference's closest analog is FSDP pre-fetching the next layer's
    flat param during compute (docs/source/fsdp_qlora.md); here the overlap
    is intra-matmul and explicit.
    """
    if state.layout != "paired":
        raise ValueError("tp_gemm_4bit_ring requires the 'paired' payload layout")
    N, K = state.shape
    n_shards = mesh.shape[axis_name]
    if N % n_shards or (N // n_shards) % 2:
        raise ValueError(f"N={N} must split into whole row pairs over {n_shards} shards")
    Ns = N // n_shards
    absmax_t = state.dequant_absmax_t()  # de-nest outside the collective
    lead = A.shape[:-1]
    A2 = A.reshape(-1, K)
    M = A2.shape[0]
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    def body(a, p_shard, am_shard):
        my = jax.lax.axis_index(axis_name)
        out = jnp.zeros((M, N), jnp.float32)
        c_p, c_am = p_shard, am_shard
        for s in range(n_shards):
            if s < n_shards - 1:
                # start forwarding the current chunk before computing with it
                # so the ICI transfer overlaps the fused matmul
                nxt_p = jax.lax.ppermute(c_p, axis_name, perm)
                nxt_am = jax.lax.ppermute(c_am, axis_name, perm)
            chunk_state = QuantState.make(
                absmax=c_am,
                shape=(Ns, K),
                quant_type=state.quant_type,
                blocksize=state.blocksize,
                dtype=state.dtype,
                layout="paired",
            )
            part = gemm_4bit(a, c_p, chunk_state).astype(jnp.float32)
            src = (my + s) % n_shards  # logical chunk currently held
            out = jax.lax.dynamic_update_slice(out, part, (0, src * Ns))
            if s < n_shards - 1:
                c_p, c_am = nxt_p, nxt_am
        return out

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis_name, None), P(None, axis_name)),
        out_specs=P(),
        check_rep=False,
    )(A2, packed.reshape(N // 2, K), absmax_t)
    out = out.reshape(*lead, N).astype(A.dtype)
    if bias is not None:
        out = out + bias
    return out
