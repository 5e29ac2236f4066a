"""4-bit blockwise quantization: NF4 / FP4 / int4 / af4 (pure-jnp tier).

TPU-native re-implementation of the reference 4-bit ops
(bitsandbytes/functional.py:884-1077; oracle semantics from
backends/default/ops.py:225-300).

Packing convention (must match the reference for checkpoint interop,
SURVEY.md §8.3): the row-major flattened tensor is quantized to 4-bit codes,
then adjacent pairs are packed high-nibble-first:

    packed[j] = (q[2j] << 4) | q[2j+1]

Canonical packed shape is ``[(n+1)//2, 1]`` uint8 (kernels view it as
``[N, K//2]`` when the last dim is even — a free row-major reshape).

For FP4/int4/af4 the codebook is in *bit-pattern* order, so quantization
bucketizes against the sorted code's midpoints and then maps rank -> bit
pattern via argsort (reference default/ops.py:225-254).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .blockwise import _ABSMAX_EPS, quantize_blockwise, dequantize_blockwise_with_code
from .codebooks import get_4bit_code
from .quant_state import QuantState

__all__ = [
    "quantize_4bit",
    "dequantize_4bit",
    "pack_4bit",
    "unpack_4bit",
    "QUANT_STORAGE_BITS",
]

VALID_4BIT_BLOCKSIZES = (32, 64, 128, 256, 512, 1024, 2048, 4096)

QUANT_STORAGE_BITS = {
    jnp.dtype(jnp.uint8): 8,
    jnp.dtype(jnp.int8): 8,
    jnp.dtype(jnp.uint16): 16,
    jnp.dtype(jnp.uint32): 32,
}

# Float storage dtypes (the reference uses them so FSDP can flat-shard packed
# weights, nn/modules.py:545) map to same-width unsigned ints here: XLA may
# canonicalize NaN bit patterns in float arrays, which would corrupt packed
# payloads, and JAX sharding works on integer dtypes directly.
_STORAGE_ALIAS = {
    jnp.dtype(jnp.float16): jnp.dtype(jnp.uint16),
    jnp.dtype(jnp.bfloat16): jnp.dtype(jnp.uint16),
    jnp.dtype(jnp.float32): jnp.dtype(jnp.uint32),
}


def _storage_dtype(quant_storage) -> jnp.dtype:
    d = jnp.dtype(quant_storage)
    d = _STORAGE_ALIAS.get(d, d)
    if d not in QUANT_STORAGE_BITS:
        raise ValueError(f"unsupported quant_storage {quant_storage}")
    return d


@functools.lru_cache(maxsize=None)
def _quantize_tables(quant_type: str, blocksize: int):
    """(midpoints of sorted code, rank->bit-pattern order map)."""
    code = get_4bit_code(quant_type, blocksize)
    order = np.argsort(code, kind="stable")
    sorted_code = code[order]
    midpoints = (sorted_code[:-1] + sorted_code[1:]) * 0.5
    return jnp.asarray(midpoints), jnp.asarray(order.astype(np.int32))


def pack_4bit(q: jax.Array) -> jax.Array:
    """Pack flat uint8 4-bit codes (even length) pairwise, high nibble first.

    Uses strided 1-D slices, NOT a ``[n/2, 2]`` reshape: XLA materializes the
    reshape with (8, 128) tile padding — a 64x inflated intermediate that
    OOMs on 100M+-element weights (observed 30 GB for a 117M-param layer).
    """
    q = q.reshape(-1).astype(jnp.uint8)
    return ((q[0::2] << 4) | q[1::2]).astype(jnp.uint8)


def unpack_4bit(packed: jax.Array) -> jax.Array:
    """Unpack uint8 bytes into flat 4-bit codes: out[2j]=hi, out[2j+1]=lo."""
    flat = packed.reshape(-1)
    hi = (flat >> 4).astype(jnp.uint8)
    lo = (flat & 0xF).astype(jnp.uint8)
    return jnp.stack([hi, lo], axis=-1).reshape(-1)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _quantize_4bit_impl(
    A, midpoints, order, blocksize, quant_type, pack_mode="flat", stochastic_key=None
):
    flat = A.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    rem = n % blocksize
    if rem:
        flat = jnp.pad(flat, (0, blocksize - rem))
    blocks = flat.reshape(-1, blocksize)
    absmax = jnp.max(jnp.abs(blocks), axis=-1)
    scale = 1.0 / jnp.clip(absmax, _ABSMAX_EPS, None)
    scaled = jnp.clip(blocks * scale[:, None], -1.0, 1.0).reshape(-1)
    # Keep only the real elements, then pad to even length for pairing
    scaled = scaled[:n]
    if n % 2:
        scaled = jnp.pad(scaled, (0, 1))
    # rank = #{midpoints < x} == searchsorted(midpoints, x, 'left'), computed
    # as 15 fused compare-accumulates: O(n) memory (searchsorted's lowering
    # materialized multi-GB intermediates on 100M+-element weights).
    rank = jnp.zeros(scaled.shape, jnp.uint8)
    for i in range(midpoints.shape[0]):
        rank = rank + (scaled > midpoints[i]).astype(jnp.uint8)
    if stochastic_key is not None:
        # distance-proportional move to the VALUE-adjacent entry, in rank
        # (value-sorted) space — before the bit-pattern order map.  Oracle
        # for the Pallas kernel's stochastic mode (quant4bit.py).
        sorted_code = jnp.sort(
            jnp.asarray(get_4bit_code(quant_type, blocksize), jnp.float32)
        )
        r32 = rank.astype(jnp.int32)
        lower = jnp.take(sorted_code, r32)
        nbr = jnp.clip(r32 + jnp.where(scaled > lower, 1, -1), 0, 15)
        nval = jnp.take(sorted_code, nbr)
        gap = jnp.abs(nval - lower)
        p_move = jnp.where(
            gap > 0, jnp.abs(scaled - lower) / jnp.maximum(gap, 1e-20), 0.0
        )
        u = jax.random.uniform(stochastic_key, scaled.shape)
        rank = jnp.where(u < p_move, nbr, r32).astype(jnp.uint8)
    if quant_type != "nf4":  # nf4 code is sorted: rank == bit pattern
        rank = jnp.take(order, rank.astype(jnp.int32))
    if pack_mode == "paired":
        # N-paired decode layout: byte[n2, k] = (q[2n2, k] << 4) | q[2n2+1, k]
        from ..ops.pallas.gemm4bit_paired import pack_npaired

        N_, K_ = A.shape
        packed = pack_npaired(rank.astype(jnp.uint8).reshape(N_, K_))
        return packed, absmax  # absmax stays in flat block order here
    packed = pack_4bit(rank.astype(jnp.uint8))
    return packed.reshape(-1, 1), absmax


def quantize_4bit(
    A: jax.Array,
    blocksize: int = 64,
    quant_type: str = "nf4",
    compress_statistics: bool = False,
    quant_storage=jnp.uint8,
    layout: str = "flat",
    stochastic_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, QuantState]:
    """Quantize to a packed 4-bit representation.

    Returns ``(packed, QuantState)``.  ``layout="flat"`` gives the
    reference-canonical ``[(n+1)//2, 1]`` shape (checkpoint interop);
    ``layout="2d"`` gives ``packed [N, K//2]`` / ``absmax [N, K//bs]`` — the
    TPU-native sharding layout (row-major identical bytes, so the two are
    free reshapes of each other; requires 2-D input with K % blocksize == 0).
    ``layout="paired"`` gives the decode-kernel layout: ``packed [N/2, K]``
    pairing weight rows (2i, 2i+1) per byte with absmax stored transposed
    ``[K/bs, N]`` (ops/pallas/gemm4bit_paired.py; requires N % 2 == 0).

    With ``compress_statistics`` the float32 absmax is itself blockwise-
    quantized (dynamic 8-bit code, blocksize 256) around its mean offset —
    reference functional.py:938-951.  In the ``"paired"`` layout the uint8
    absmax codes are stored transposed ``[K/bs, N]`` like the f32 absmax
    (the fused kernel decodes them in-kernel); the second-level 256-block
    grouping stays defined on the flat canonical order, and serialization
    canonicalizes the codes back to it.

    ``stochastic_key`` enables stochastic rounding (distance-proportional
    move to the value-adjacent code entry; the reference wires stochastic
    only into its 8-bit quantize template, kernels.cu:269-375 — this is the
    TPU-native 4-bit extension, e.g. for low-precision gradient
    accumulation).  On the Pallas tier the uniforms come from the on-core
    PRNG inside the quantize kernel's single VMEM pass.
    """
    if blocksize not in VALID_4BIT_BLOCKSIZES:
        raise ValueError(f"blocksize {blocksize} not in {VALID_4BIT_BLOCKSIZES}")
    if layout not in ("flat", "2d", "paired"):
        raise ValueError(f"layout must be 'flat', '2d' or 'paired', got {layout!r}")
    if layout == "2d" and (A.ndim != 2 or A.shape[-1] % blocksize or A.shape[-1] % 2):
        raise ValueError("layout='2d' requires a 2-D input with K % blocksize == 0")
    if layout == "paired":
        if A.ndim != 2 or A.shape[-1] % blocksize or A.shape[0] % 2:
            raise ValueError(
                "layout='paired' requires a 2-D input with K % blocksize == 0 and even N"
            )
        if jnp.dtype(quant_storage) != jnp.dtype(jnp.uint8):
            raise ValueError("layout='paired' supports only uint8 quant_storage")
    midpoints, order = _quantize_tables(quant_type, blocksize)
    pack_mode = "paired" if layout == "paired" else "flat"

    # Pallas quantize kernel (reference kQuantizeBlockwise, kernels.cu:
    # 269-463): absmax + compare-rank in one VMEM pass — XLA leaves the 15
    # compare-accumulates unfused (~15 HBM passes, measured 10 ms vs the
    # 0.7 ms floor on a 117M-param weight).  Packing + absmax layout happen
    # in XLA after (cheap single passes).  Bit-identical to the jnp path.
    from ..ops import dispatch

    if (
        A.ndim == 2
        and A.shape[1] % blocksize == 0
        and A.shape[1] % 2 == 0
        and dispatch.use_pallas()
    ):
        from ..ops.pallas.quant4bit import (
            pallas_quant4bit_supported,
            quantize_4bit_codes_pallas,
        )

        if pallas_quant4bit_supported(A.shape[0], A.shape[1], blocksize):
            code_t = tuple(float(x) for x in get_4bit_code(quant_type, blocksize))
            skw = {}
            if stochastic_key is not None:
                if jax.default_backend() not in ("cpu", "gpu"):
                    kd = (
                        jax.random.key_data(stochastic_key)
                        if jnp.issubdtype(stochastic_key.dtype, jax.dtypes.prng_key)
                        else stochastic_key
                    )
                    skw["stochastic_seed"] = (
                        jnp.asarray(kd, jnp.uint32).reshape(-1)[:2].astype(jnp.int32)
                    )
                else:
                    # interpret tier: oracle-identical jax.random uniforms
                    skw["stochastic_u"] = jax.random.uniform(
                        stochastic_key, (A.shape[0] * A.shape[1],)
                    )
            codes, am2d = quantize_4bit_codes_pallas(
                A, code_t=code_t, blocksize=blocksize, **skw
            )
            absmax = am2d.reshape(-1)
            if pack_mode == "paired":
                from ..ops.pallas.gemm4bit_paired import pack_npaired

                packed = pack_npaired(codes)
            else:
                packed = pack_4bit(codes.reshape(-1)).reshape(-1, 1)
            return _finish_quantize_4bit(
                A, packed, absmax, layout, quant_type, blocksize,
                compress_statistics, quant_storage,
            )

    # Large 2-D weights quantize in row slabs (rows own whole quant blocks
    # when K % blocksize == 0, so slabbing is bit-identical): one huge
    # elementwise graph per 100M+-element weight is too big for some TPU
    # compile services and wastes transient HBM.
    _SLAB_ELEMS = 1 << 25
    if (
        A.ndim == 2
        and A.shape[1] % blocksize == 0
        and A.shape[1] % 2 == 0
        and A.size > _SLAB_ELEMS
    ):
        N_, K_ = A.shape
        slab = max(2, (_SLAB_ELEMS // K_) & ~1)  # even rows: whole byte pairs
        packed_parts, absmax_parts = [], []
        for i in range(0, N_, slab):
            p_i, am_i = _quantize_4bit_impl(
                A[i : i + slab], midpoints, order, blocksize, quant_type, pack_mode,
                stochastic_key=None if stochastic_key is None
                else jax.random.fold_in(stochastic_key, i),
            )
            packed_parts.append(p_i)
            absmax_parts.append(am_i)
        packed = jnp.concatenate(packed_parts, axis=0)
        absmax = jnp.concatenate(absmax_parts, axis=0)
    else:
        packed, absmax = _quantize_4bit_impl(
            A, midpoints, order, blocksize, quant_type, pack_mode,
            stochastic_key=stochastic_key,
        )
    return _finish_quantize_4bit(
        A, packed, absmax, layout, quant_type, blocksize,
        compress_statistics, quant_storage,
    )


def _finish_quantize_4bit(
    A, packed, absmax, layout, quant_type, blocksize, compress_statistics, quant_storage
):
    """Shared tail: build the QuantState (incl. nested stats) and apply the
    layout-specific absmax orientation / storage dtype / payload shape."""
    code = jnp.asarray(get_4bit_code(quant_type, blocksize))

    if compress_statistics:
        offset = jnp.mean(absmax)
        q_absmax, state2 = quantize_blockwise(absmax - offset, blocksize=256)
        if layout == "paired":
            # kernel-native transposed orientation for the uint8 codes too
            # (the in-kernel nested decode streams [K/bs, N] tiles); the
            # second-level grouping stays defined on the FLAT canonical
            # order, exactly as the reference (functional.py:938-951)
            q_absmax = q_absmax.reshape(A.shape[0], A.shape[1] // blocksize).T
        state2 = QuantState(
            absmax=state2.absmax,
            code=state2.code,
            blocksize=256,
            quant_type="8bit",
            dtype=jnp.float32,
            shape=absmax.shape,
        )
        state = QuantState(
            absmax=q_absmax,
            code=code,
            blocksize=blocksize,
            quant_type=quant_type,
            dtype=A.dtype,
            shape=A.shape,
            offset=offset,
            state2=state2,
            layout=layout,
        )
    else:
        if layout == "paired":
            # kernel-native transposed orientation, paid once at load
            absmax = absmax.reshape(A.shape[0], A.shape[1] // blocksize).T
        state = QuantState(
            absmax=absmax,
            code=code,
            blocksize=blocksize,
            quant_type=quant_type,
            dtype=A.dtype,
            shape=A.shape,
            layout=layout,
        )

    if layout == "paired":
        return packed, state  # already [N/2, K] uint8

    storage = _storage_dtype(quant_storage)
    elems = QUANT_STORAGE_BITS[storage] // 8
    if storage != jnp.dtype(jnp.uint8):
        packed = jax.lax.bitcast_convert_type(
            packed.reshape(-1, elems), storage
        ).reshape(-1, 1)
    if layout == "2d":
        # [N, K/2/elems]: the TPU-native layout.  The flat [(n)//2, 1] shape
        # has a degenerate tiled device layout, and reshaping it to 2-D costs
        # a full relayout copy on EVERY kernel call (measured 2x on decode
        # matmuls); storing 2-D makes the kernel's view a no-op.
        N_ = A.shape[0]
        packed = packed.reshape(N_, -1)
    return packed, state


@partial(jax.jit, static_argnums=(3, 4, 5))
def _dequantize_4bit_impl(packed_u8, absmax, code, blocksize, shape, dtype):
    n = int(np.prod(shape))
    codes = unpack_4bit(packed_u8)[:n]
    vals = jnp.take(code, codes.astype(jnp.int32))
    rem = n % blocksize
    if rem:
        vals = jnp.pad(vals, (0, blocksize - rem))
    out = (vals.reshape(-1, blocksize) * absmax.astype(jnp.float32)[:, None]).reshape(-1)
    return out[:n].reshape(shape).astype(dtype)


def dequantize_4bit(
    A: jax.Array,
    quant_state: Optional[QuantState] = None,
    absmax: Optional[jax.Array] = None,
    blocksize: int = 64,
    quant_type: str = "nf4",
    shape: Optional[tuple] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Dequantize a packed 4-bit tensor (reference functional.py:990-1077).

    On TPU this routes to the Pallas select-tree kernel: XLA's gather
    lowering for the 16-entry codebook runs ~200x slower than the kernel
    (measured), so the jnp gather path is only the CPU/oracle tier.
    """
    if quant_state is not None:
        absmax = quant_state.dequant_absmax()
        blocksize = quant_state.blocksize
        quant_type = quant_state.quant_type
        shape = quant_state.shape
        dtype = quant_state.dtype
        if quant_state.layout == "paired":
            # relayout to the K-adjacent-pair byte order, then share the path
            from ..ops.pallas.gemm4bit_paired import repack_npaired_to_2d

            N_, K_ = int(shape[-2]), int(shape[-1])
            A = repack_npaired_to_2d(A.reshape(N_ // 2, K_))
    if shape is None or absmax is None:
        raise ValueError("either quant_state or (absmax, shape) must be provided")
    if A.dtype != jnp.uint8:
        A = jax.lax.bitcast_convert_type(A.reshape(-1), jnp.uint8)
    shape = tuple(int(s) for s in shape)

    from ..ops import dispatch

    if dispatch.use_pallas() and len(shape) == 2:
        from ..ops.pallas.gemm4bit import dequantize_4bit_pallas, pallas_dequant_supported

        N, K = shape
        if pallas_dequant_supported(N, K, blocksize):
            return dequantize_4bit_pallas(
                A.reshape(-1),
                absmax,
                code=tuple(float(x) for x in get_4bit_code(quant_type, blocksize)),
                blocksize=blocksize,
                shape=shape,
                dtype=jnp.dtype(dtype).name,
            )
    code = jnp.asarray(get_4bit_code(quant_type, blocksize))
    return _dequantize_4bit_impl(A.reshape(-1), absmax, code, blocksize, shape, dtype)


# -- reference-named conveniences (functional.py:714-766: quantize_fp4 /
# quantize_nf4 / dequantize_fp4 / dequantize_nf4 are thin partials of the
# 4-bit core) so reference users find the exact names they already call --


def quantize_nf4(A, blocksize: int = 64, **kwargs):
    """``quantize_4bit(..., quant_type='nf4')`` under the reference's name."""
    return quantize_4bit(A, blocksize=blocksize, quant_type="nf4", **kwargs)


def quantize_fp4(A, blocksize: int = 64, **kwargs):
    """``quantize_4bit(..., quant_type='fp4')`` under the reference's name."""
    return quantize_4bit(A, blocksize=blocksize, quant_type="fp4", **kwargs)


def dequantize_nf4(A, quant_state=None, **kwargs):
    """``dequantize_4bit(..., quant_type='nf4')`` under the reference's name."""
    kwargs.setdefault("quant_type", "nf4")
    return dequantize_4bit(A, quant_state, **kwargs)


def dequantize_fp4(A, quant_state=None, **kwargs):
    """``dequantize_4bit(..., quant_type='fp4')`` under the reference's name."""
    kwargs.setdefault("quant_type", "fp4")
    return dequantize_4bit(A, quant_state, **kwargs)
