"""Blockwise 8-bit quantization (pure-jnp reference tier).

TPU-native re-implementation of the reference blockwise quant ops
(bitsandbytes/functional.py:613-769; oracle semantics from
backends/default/ops.py:177-222).  These functions are:

  * the always-available fallback implementation, and
  * the numerical oracle the Pallas kernels are tested against.

Semantics (SURVEY.md §8.4-8.6):
  scaled  = clamp(x / clamp(absmax_block, 1e-38), -1, 1)
  q       = searchsorted(midpoints(code), scaled)     # ties -> lower code
  dequant = code[q] * absmax_block, cast to dtype
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .codebooks import create_dynamic_map
from .quant_state import QuantState

__all__ = [
    "quantize_blockwise",
    "dequantize_blockwise",
    "quantize_blockwise_with_code",
    "dequantize_blockwise_with_code",
    "blockwise_absmax",
]

_ABSMAX_EPS = 1e-38  # reference backends/default/ops.py:189
VALID_BLOCKSIZES = (32, 64, 128, 256, 512, 1024, 2048, 4096)  # ops.cu:36-75


def _pad_to_blocks(flat: jax.Array, blocksize: int) -> jax.Array:
    n = flat.shape[0]
    rem = n % blocksize
    if rem:
        flat = jnp.pad(flat, (0, blocksize - rem))
    return flat


def blockwise_absmax(A: jax.Array, blocksize: int) -> jax.Array:
    """Per-block max |x| over the row-major flattened input, float32
    ``[ceil(n/blocksize)]``."""
    flat = _pad_to_blocks(A.reshape(-1), blocksize).astype(jnp.float32)
    return jnp.max(jnp.abs(flat.reshape(-1, blocksize)), axis=-1)


@partial(jax.jit, static_argnums=(2,))
def quantize_blockwise_with_code(
    A: jax.Array, code: jax.Array, blocksize: int
) -> Tuple[jax.Array, jax.Array]:
    """Quantize to uint8 codebook indices.  Returns (q[A.shape], absmax)."""
    flat = A.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    padded = _pad_to_blocks(flat, blocksize)
    blocks = padded.reshape(-1, blocksize)
    absmax = jnp.max(jnp.abs(blocks), axis=-1)
    scale = 1.0 / jnp.clip(absmax, _ABSMAX_EPS, None)
    scaled = jnp.clip(blocks * scale[:, None], -1.0, 1.0)
    # Midpoint bucketize: index = count of midpoints strictly below x, so a
    # value exactly on a midpoint rounds down (reference kernels.cu:160-219,
    # backends/default/ops.py:194-195).
    bounds = (code[:-1] + code[1:]) * 0.5
    q = jnp.searchsorted(bounds, scaled.reshape(-1), side="left").astype(jnp.uint8)
    return q[:n].reshape(A.shape), absmax


@partial(jax.jit, static_argnums=(3, 4))
def dequantize_blockwise_with_code(
    A: jax.Array, absmax: jax.Array, code: jax.Array, blocksize: int, dtype
) -> jax.Array:
    """Dequantize uint8 codebook indices.  Dequant math stays in float32 and
    is cast to ``dtype`` at the end (reference default/ops.py:197-216)."""
    flat = A.reshape(-1)
    n = flat.shape[0]
    vals = jnp.take(code, flat.astype(jnp.int32))
    padded = _pad_to_blocks(vals, blocksize).reshape(-1, blocksize)
    out = padded * absmax.astype(jnp.float32)[:, None]
    return out.reshape(-1)[:n].reshape(A.shape).astype(dtype)


def _concrete_code(code):
    """The codebook as a host numpy array, or None if traced.  NB: testing
    ``isinstance(jnp.asarray(code), Tracer)`` is WRONG under jit — at trace
    time jnp.asarray lifts even numpy constants to tracers, which silently
    sent every jitted call down the gather path (the NF4+DQ 27x decode
    bug).  np.asarray raises on true tracers and passes constants."""
    import jax.core

    if isinstance(code, jax.core.Tracer):
        return None
    try:
        return np.asarray(code)
    except Exception:
        return None


def _pallas_ok(code, n, blocksize) -> bool:
    """Route to the select-tree Pallas kernels on TPU: XLA's 256-entry LUT
    gather lowering is ~1000x too slow (measured 655 ms per 64M-element
    dequant on v5e).  Requires a concrete (non-traced) codebook."""
    from ..ops import dispatch
    from ..ops.pallas.blockwise8 import pallas_blockwise8_supported

    return (
        dispatch.use_pallas()
        and _concrete_code(code) is not None
        and n % blocksize == 0
        and pallas_blockwise8_supported(n, blocksize)
    )


def _quantize_dispatch(A, code, blocksize, stochastic_key=None):
    if _pallas_ok(code, A.size, blocksize):
        from ..ops.pallas.blockwise8 import quantize_blockwise_pallas

        code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:256])
        if stochastic_key is None:
            return quantize_blockwise_pallas(A, code_t=code_t, blocksize=blocksize), False
        if jax.default_backend() not in ("cpu", "gpu"):
            # on-core PRNG: the stochastic move happens in the SAME VMEM
            # pass as absmax+rank (reference STOCHASTIC kernel template,
            # kernels.cu:269-375); no HBM traffic for the random stream
            kd = (
                jax.random.key_data(stochastic_key)
                if jnp.issubdtype(stochastic_key.dtype, jax.dtypes.prng_key)
                else stochastic_key
            )
            seed = jnp.asarray(kd, jnp.uint32).reshape(-1)[:2].astype(jnp.int32)
            return (
                quantize_blockwise_pallas(
                    A, code_t=code_t, blocksize=blocksize, stochastic_seed=seed
                ),
                True,
            )
        # interpret tier: uniforms from the SAME jax.random stream as the
        # jnp oracle, applied in-kernel — bit-identical to
        # _stochastic_requant (tested)
        u = jax.random.uniform(stochastic_key, (A.size,))
        return (
            quantize_blockwise_pallas(
                A, code_t=code_t, blocksize=blocksize, stochastic_u=u
            ),
            True,
        )
    return quantize_blockwise_with_code(A, code, blocksize), False


_warned_traced_code = False


def _dequantize_dispatch(A, absmax, code, blocksize, dtype):
    if _pallas_ok(code, A.size, blocksize):
        from ..ops.pallas.blockwise8 import dequantize_blockwise_pallas

        code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:256])
        return dequantize_blockwise_pallas(
            A, absmax, code_t=code_t, blocksize=blocksize, dtype=jnp.dtype(dtype).name
        )
    global _warned_traced_code
    from ..ops import dispatch as _dispatch

    if _dispatch.use_pallas() and _concrete_code(code) is None and not _warned_traced_code:
        _warned_traced_code = True
        logging.getLogger(__name__).warning(
            "dequantize_blockwise: codebook is a traced value (QuantState "
            "passed through jit), forcing XLA's 256-entry gather lowering "
            "(~1000x slower than the select-tree kernel on TPU).  Dequantize "
            "outside jit, or pass the concrete code array."
        )
    return dequantize_blockwise_with_code(A, absmax, code, blocksize, dtype)


@partial(jax.jit, static_argnums=(3,))
def _stochastic_requant(A, code, q_det, blocksize, key):
    """Stochastic rounding: move to the adjacent code entry with probability
    proportional to the relative distance (reference STOCHASTIC template,
    kernels.cu:160-219,269-375)."""
    flat = A.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    padded = _pad_to_blocks(flat, blocksize).reshape(-1, blocksize)
    absmax = jnp.max(jnp.abs(padded), axis=-1)
    scale = 1.0 / jnp.clip(absmax, _ABSMAX_EPS, None)
    scaled = jnp.clip(padded * scale[:, None], -1.0, 1.0).reshape(-1)[:n]
    qd = q_det.reshape(-1).astype(jnp.int32)
    lower = jnp.take(code, qd)
    # the neighbor on the other side of x
    above = scaled > lower
    neighbor_idx = jnp.clip(qd + jnp.where(above, 1, -1), 0, code.shape[0] - 1)
    neighbor = jnp.take(code, neighbor_idx)
    gap = jnp.abs(neighbor - lower)
    p_move = jnp.where(gap > 0, jnp.abs(scaled - lower) / jnp.maximum(gap, 1e-20), 0.0)
    u = jax.random.uniform(key, scaled.shape)
    q = jnp.where(u < p_move, neighbor_idx, qd).astype(jnp.uint8)
    return q.reshape(A.shape)


def quantize_blockwise(
    A: jax.Array,
    code: Optional[jax.Array] = None,
    blocksize: int = 4096,
    nested: bool = False,
    stochastic_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, QuantState]:
    """Blockwise 8-bit quantization with the dynamic codebook by default.

    Mirrors reference `quantize_blockwise` (functional.py:613-695) including
    nested (double) quantization of the absmax at blocksize 256 with mean
    offset.  Passing ``stochastic_key`` enables stochastic rounding
    (distance-proportional move to the adjacent code entry — the reference's
    STOCHASTIC kernel template, kernels.cu:269-375; in JAX the randomness
    source is an explicit PRNG key).  On the Pallas tier the stochastic move
    happens inside the quantize kernel's single VMEM pass (on-core PRNG on
    TPU; oracle-identical uniforms on interpret backends); the jnp tier
    applies :func:`_stochastic_requant` after the deterministic pass.
    """
    if blocksize not in VALID_BLOCKSIZES:
        raise ValueError(f"blocksize {blocksize} not in {VALID_BLOCKSIZES}")
    if code is None:
        # numpy, NOT jnp.asarray: under jit the lifted constant would look
        # like a tracer to the dispatcher and lose the Pallas route
        code = create_dynamic_map()
    (q, absmax), stoch_done = _quantize_dispatch(A, code, blocksize, stochastic_key)
    if stochastic_key is not None and not stoch_done:
        q = _stochastic_requant(A, code, q, blocksize, stochastic_key)
    if nested:
        offset = jnp.mean(absmax)
        code2 = jnp.asarray(create_dynamic_map())
        q_absmax, absmax2 = quantize_blockwise_with_code(absmax - offset, code2, 256)
        state2 = QuantState(
            absmax=absmax2,
            code=code2,
            blocksize=256,
            quant_type="8bit",
            dtype=jnp.float32,
            shape=absmax.shape,
        )
        state = QuantState(
            absmax=q_absmax,
            code=jnp.asarray(code),
            blocksize=blocksize,
            quant_type="8bit",
            dtype=A.dtype,
            shape=A.shape,
            offset=offset,
            state2=state2,
        )
    else:
        state = QuantState(
            absmax=absmax,
            code=jnp.asarray(code),
            blocksize=blocksize,
            quant_type="8bit",
            dtype=A.dtype,
            shape=A.shape,
        )
    return q, state


def dequantize_blockwise(
    A: jax.Array,
    quant_state: Optional[QuantState] = None,
    absmax: Optional[jax.Array] = None,
    code: Optional[jax.Array] = None,
    blocksize: int = 4096,
    dtype=jnp.float32,
) -> jax.Array:
    """Inverse of :func:`quantize_blockwise` (reference functional.py:698-769)."""
    if quant_state is not None:
        absmax = quant_state.dequant_absmax()
        code = quant_state.code
        blocksize = quant_state.blocksize
        dtype = quant_state.dtype
    if code is None:
        code = create_dynamic_map()  # numpy: see quantize_blockwise
    if absmax is None:
        raise ValueError("either quant_state or absmax must be provided")
    out = _dequantize_dispatch(A, absmax, code, blocksize, dtype)
    if quant_state is not None:
        out = out.reshape(quant_state.shape)
    return out
