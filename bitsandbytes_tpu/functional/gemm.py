"""4-bit matmul entry points: gemm_4bit / gemv_4bit.

Dispatch layer replacing the reference's gemm_4bit CUDA dispatch
(backends/cuda/ops.py:583-969): on TPU, routes to the fused Pallas
dequant+matmul kernel when shapes allow, otherwise falls back to
XLA dequantize + `jnp.dot` (the reference's `_dequant_linear_fallback`,
backends/cuda/ops.py:891-903).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dispatch
from .fourbit import dequantize_4bit
from .quant_state import QuantState

__all__ = ["gemm_4bit", "gemv_4bit"]

logger = logging.getLogger(__name__)
_warned: set = set()

# Crossover where materialize-bf16 + full-depth MXU dot beats the fused
# kernel (measured on v5e: fused caps at ~78 TFLOPs from decode/scale work;
# dequant+dot reaches 92-173 TFLOPs for M in 512..4096).
LARGE_M_THRESHOLD = 512

# Per-weight-shape crossovers from the on-device mid-M sweep
# (experiments/sweep_midm.py; VERDICT r2 item 9): below the value the fused
# kernel wins, at/above the dequant+MXU route does.  Unlisted shapes use
# LARGE_M_THRESHOLD.  BNB_LARGE_M overrides everything (sweep/debug knob).
#
# v5e measurements (Llama-3-8B decode shapes, NF4 bs=64; medians over
# repeated runs — single runs swing ~15% with pool load, so crossovers sit
# at the first M where the dequant route wins DECISIVELY, keeping ties in
# the 32..128 band on the fused kernel):
#   [ 4096, 4096] (wo)        fused<=128 tie-ish, dequant 2.8x at 256 -> 256
#   [ 6144, 4096] (wqkv)      fused<=64, dequant wins 128 (132 vs 162) -> 128
#   [28672, 4096] (wgate|up)  fused<=128, dequant wins >=256           -> 256
#   [ 4096,14336] (wdown)     fused<=256, dequant 2x at 384            -> 384
_MIDM_CROSSOVER: dict = {
    (4096, 4096): 256,
    (6144, 4096): 128,
    (28672, 4096): 256,
    (4096, 14336): 384,
}


def _large_m_crossover(N: int, K: int) -> int:
    env = os.environ.get("BNB_LARGE_M")
    if env:
        return int(env)
    return _MIDM_CROSSOVER.get((N, K), LARGE_M_THRESHOLD)


def _warn_fallback(tag: str, M: int, N: int, K: int, blocksize: int) -> None:
    """One-time perf-footgun warning (reference analog: the blocksize-
    misalignment and fp16/fp32-compute warnings, backends/cuda/ops.py:
    944-948, nn/modules.py:582-591): on TPU the dequantize-then-matmul
    fallback materializes the bf16 weight in HBM — measured ~4x slower
    than the fused kernel on decode shapes."""
    # keyed without M: dynamic batch/seq workloads vary M per call — keying
    # on M would log per new shape and grow the set without bound
    key = (tag, N, K, blocksize)
    if key in _warned or not dispatch.use_pallas():
        return
    _warned.add(key)
    logger.warning(
        "%s: shape M=%d N=%d K=%d (blocksize %d) is unsupported by the fused "
        "Pallas kernel; falling back to dequantize+matmul (~4x slower on "
        "TPU). Prefer N %% 16 == 0, K %% max(256, blocksize) == 0.",
        tag, M, N, K, blocksize,
    )


def _inline_dq_ok(state: QuantState) -> bool:
    """True when the nested (double-quantized) absmax can be decoded INSIDE
    the fused paired kernel (no pre-pass, no f32 materialization — the
    reference's in-register nested dequant, gemm_4bit_simt.cu:104-117):
    paired layout, nested blocksize 256, canonical dynamic map.  A traced
    code leaf is assumed canonical — every state this library or the
    reference produces uses it (see QuantState.dequant_absmax)."""
    if not (state.nested and state.layout == "paired"):
        return False
    if state.state2.blocksize != 256 or state.offset is None:
        return False
    code = state.state2.code
    if isinstance(code, jax.core.Tracer):
        return True
    from .codebooks import create_dynamic_map

    return np.array_equal(
        np.asarray(code, np.float32), np.asarray(create_dynamic_map(), np.float32)
    )


def _dequant_matmul_fallback(A, B_packed, state: QuantState, bias):
    W = dequantize_4bit(B_packed, quant_state=state).astype(A.dtype)
    # XLA truncates f32 dots to bf16 under --xla_allow_excess_precision;
    # pin full precision for f32 activations (reference gemv is true f32)
    prec = jax.lax.Precision.HIGHEST if A.dtype == jnp.float32 else None
    out = jnp.dot(A, W.T, preferred_element_type=jnp.float32, precision=prec).astype(A.dtype)
    if bias is not None:
        out = out + bias
    return out


def gemm_4bit(
    A: jax.Array,
    B_packed: jax.Array,
    quant_state: QuantState,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """``out = A @ dequant(B)^T (+ bias)`` with B 4-bit blockwise quantized.

    Equivalent of torch.ops.bitsandbytes.gemm_4bit (reference _ops.py:
    239-295).  Nested (double-quantized) absmax is resolved before the
    kernel; the packed payload is streamed and dequantized on-chip.
    """
    N, K = quant_state.shape[-2], quant_state.shape[-1]
    lead = A.shape[:-1]
    M = int(np.prod(lead)) if lead else 1

    if B_packed.dtype != jnp.uint8:
        # wider quant_storage dtypes (FSDP-sharding masquerade) are a bitcast
        B_packed = jax.lax.bitcast_convert_type(B_packed.reshape(-1), jnp.uint8)

    if dispatch.use_pallas() and quant_state.layout == "paired":
        from ..ops.pallas.gemm4bit_paired import (
            dequantize_paired_fast,
            dequantize_paired_fast_dq,
            gemm_4bit_paired,
            gemm_4bit_paired_dq,
            paired_dequant_dq_supported,
            paired_dequant_supported,
            paired_gemm_dq_supported,
            paired_gemm_supported,
        )
        from .codebooks import get_4bit_code

        bs = quant_state.blocksize
        code = get_4bit_code(quant_state.quant_type, bs)
        inline_dq = _inline_dq_ok(quant_state)

        # Large-M (prefill/training) route: the fused kernel's decode/scale
        # work caps MXU utilization (~78 TFLOPs measured); materialize the
        # bf16 weight with the one-pass dequant kernel and run a full-depth
        # MXU dot instead.  Crossover measured at M ~ 512 on v5e.
        if (
            M >= _large_m_crossover(N, K)
            and A.dtype == jnp.bfloat16
            and paired_dequant_supported(N, K, bs)
        ):
            code_t = tuple(float(x) for x in code)
            if inline_dq and paired_dequant_dq_supported(N, K, bs):
                W = dequantize_paired_fast_dq(
                    B_packed.reshape(N // 2, K),
                    quant_state.absmax,
                    quant_state.state2.absmax,
                    quant_state.offset,
                    code=code_t,
                    blocksize=bs,
                    dtype=jnp.bfloat16,
                )
            else:
                W = dequantize_paired_fast(
                    B_packed.reshape(N // 2, K),
                    quant_state.dequant_absmax_t(),
                    code=code_t,
                    blocksize=bs,
                    dtype=jnp.bfloat16,
                )
            out = jax.lax.dot_general(
                A, W, (((A.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(A.dtype)
            if bias is not None:
                out = out + bias
            return out

        if paired_gemm_supported(M, N, K, bs):
            # post-dot sub-dot scaling won or tied per-element expander
            # scaling on every Llama decode shape in the on-device sweep
            # (experiments/sweep_paired.py, v5e)
            if inline_dq and paired_gemm_dq_supported(M, N, K, bs):
                out = gemm_4bit_paired_dq(
                    A,
                    B_packed.reshape(N // 2, K),
                    quant_state.absmax,
                    quant_state.state2.absmax,
                    quant_state.offset,
                    code=code,
                    blocksize=bs,
                    shapeB=(N, K),
                )
            else:
                out = gemm_4bit_paired(
                    A,
                    B_packed.reshape(N // 2, K),
                    quant_state.dequant_absmax_t(),
                    code=code,
                    blocksize=bs,
                    shapeB=(N, K),
                    scale_mode="subdot",
                )
            if bias is not None:
                out = out + bias
            return out

    if dispatch.use_pallas() and quant_state.layout != "paired":
        from ..ops.pallas.gemm4bit import fused_gemm_supported, gemm_4bit_fused

        if fused_gemm_supported(M, N, K, quant_state.blocksize):
            absmax = quant_state.dequant_absmax()
            # Codebook from the *static* quant_type, not the traced code leaf:
            # it must be a compile-time constant for the select-tree decode.
            from .codebooks import get_4bit_code

            out = gemm_4bit_fused(
                A,
                B_packed,
                absmax,
                code=get_4bit_code(quant_state.quant_type, quant_state.blocksize),
                blocksize=quant_state.blocksize,
                shapeB=(N, K),
            )
            if bias is not None:
                out = out + bias
            return out
    _warn_fallback("gemm_4bit", M, N, K, quant_state.blocksize)
    return _dequant_matmul_fallback(A, B_packed, quant_state, bias)


def gemv_4bit(
    A: jax.Array,
    B_packed: jax.Array,
    quant_state: QuantState,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode-path (small M) alias of :func:`gemm_4bit` (reference
    functional.py:1300-1334).  On TPU the same fused kernel serves both; only
    the tile selection differs."""
    return gemm_4bit(A, B_packed, quant_state, bias)


def gemm_4bit_grad_A(
    g: jax.Array,
    B_packed: jax.Array,
    quant_state: QuantState,
) -> jax.Array:
    """``grad_A = g @ dequant(B)`` (contract over N) — the 4-bit matmul
    backward (reference autograd/_functions.py:381-384), fused on TPU so the
    dequantized weight is never materialized in HBM."""
    N, K = quant_state.shape[-2], quant_state.shape[-1]
    lead = g.shape[:-1]
    M = int(np.prod(lead)) if lead else 1

    if B_packed.dtype != jnp.uint8:
        B_packed = jax.lax.bitcast_convert_type(B_packed.reshape(-1), jnp.uint8)

    if dispatch.use_pallas() and quant_state.layout == "paired":
        from ..ops.pallas.gemm4bit_paired import (
            dequantize_paired_fast,
            dequantize_paired_fast_dq,
            gemm_4bit_paired_nt,
            gemm_4bit_paired_nt_dq,
            paired_dequant_dq_supported,
            paired_dequant_supported,
            paired_gemm_dq_supported,
            paired_gemm_nt_supported,
        )
        from .codebooks import get_4bit_code

        bs = quant_state.blocksize
        code = get_4bit_code(quant_state.quant_type, bs)
        inline_dq = _inline_dq_ok(quant_state)

        # large-M training backward: materialize bf16 W once, full-depth dot
        if (
            M >= _large_m_crossover(N, K)
            and g.dtype == jnp.bfloat16
            and paired_dequant_supported(N, K, bs)
        ):
            code_t = tuple(float(x) for x in code)
            if inline_dq and paired_dequant_dq_supported(N, K, bs):
                W = dequantize_paired_fast_dq(
                    B_packed.reshape(N // 2, K),
                    quant_state.absmax,
                    quant_state.state2.absmax,
                    quant_state.offset,
                    code=code_t,
                    blocksize=bs,
                    dtype=jnp.bfloat16,
                )
            else:
                W = dequantize_paired_fast(
                    B_packed.reshape(N // 2, K),
                    quant_state.dequant_absmax_t(),
                    code=code_t,
                    blocksize=bs,
                    dtype=jnp.bfloat16,
                )
            return jax.lax.dot_general(
                g, W, (((g.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(g.dtype)

        if paired_gemm_nt_supported(M, N, K, bs):
            if inline_dq and paired_gemm_dq_supported(M, N, K, bs):
                return gemm_4bit_paired_nt_dq(
                    g,
                    B_packed.reshape(N // 2, K),
                    quant_state.absmax,
                    quant_state.state2.absmax,
                    quant_state.offset,
                    code=code,
                    blocksize=bs,
                    shapeB=(N, K),
                )
            return gemm_4bit_paired_nt(
                g,
                B_packed.reshape(N // 2, K),
                quant_state.dequant_absmax_t(),
                code=code,
                blocksize=bs,
                shapeB=(N, K),
            )

    if dispatch.use_pallas() and quant_state.layout != "paired":
        from ..ops.pallas.gemm4bit import fused_gemm_nt_supported, gemm_4bit_nt_fused

        if fused_gemm_nt_supported(M, N, K, quant_state.blocksize) and N % 256 == 0:
            from .codebooks import get_4bit_code

            absmax = quant_state.dequant_absmax()
            return gemm_4bit_nt_fused(
                g,
                B_packed,
                absmax,
                code=get_4bit_code(quant_state.quant_type, quant_state.blocksize),
                blocksize=quant_state.blocksize,
                shapeB=(N, K),
            )
    _warn_fallback("gemm_4bit_grad_A", M, N, K, quant_state.blocksize)
    W = dequantize_4bit(B_packed, quant_state=quant_state).astype(g.dtype)
    prec = jax.lax.Precision.HIGHEST if g.dtype == jnp.float32 else None
    return jnp.matmul(g, W, preferred_element_type=jnp.float32, precision=prec).astype(g.dtype)
