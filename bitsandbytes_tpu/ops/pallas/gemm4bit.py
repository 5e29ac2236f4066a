"""Fused 4-bit dequantize + matmul Pallas kernel (the hot path).

TPU-native replacement for the reference's CUDA gemm_4bit/gemv_4bit kernels
(csrc/gemm_4bit.cu, gemm_4bit_simt.cu, gemm_4bit_sm80.cu, and the naive GEMV
csrc/kernels.cu:1452-1567).  One kernel covers both decode (M small) and
prefill (M large) via tile-size selection — the reference's 300-line per-arch
shape heuristic (backends/cuda/ops.py:583-801) collapses to a tile table.

Computes ``out[M, N] = A[M, K] @ dequant(B_packed)[N, K]^T`` where B is
blockwise 4-bit quantized along K (packed adjacent-pair, high nibble first,
reference kernels.cu:354-367).

Key design decisions (TPU-first):

* **Even/odd K split instead of nibble interleave.**  Byte j of row n packs
  elements k=2j (hi nibble) and k=2j+1 (lo).  Interleaving decoded nibbles
  back into K-order would be a lane-shuffle; instead we split A into its
  even-k and odd-k columns once (cheap XLA strided slice) and compute
  ``A_even @ decode(hi)^T + A_odd @ decode(lo)^T``.  The contraction is
  order-invariant, so no shuffle is ever needed.

* **Select-tree LUT decode.**  TPU has no fast per-lane gather (Mosaic's
  dynamic_gather falls back to a scalar path, measured ~1000x too slow), so
  the 16-entry codebook is decoded with a 4-level binary select tree (15
  vselects) on the VPU, with the codebook baked in as compile-time
  constants.

* **Per-block scales via lane-repeat broadcast.**  absmax[n, k//bs] scales
  whole quant blocks; with the even/odd split each absmax covers bs/2
  contiguous bytes, so a static `pltpu.repeat` along lanes broadcasts it.

* **f32 dequant math, bf16 MXU operands, f32 accumulation** — bit-identical
  to the reference numerics (dequant in fp32 then cast: default/ops.py:
  269-283; fp32 accumulate: kernels.cu:1550-1558).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gemm_4bit_fused", "fused_gemm_supported", "dequantize_4bit_pallas"]


def _interpret() -> bool:
    """Run Pallas in interpreter mode off-TPU (the CPU-testable tier)."""
    return jax.default_backend() in ("cpu", "gpu")


def _decode_tree(q, code: np.ndarray):
    """Map 4-bit indices ``q`` (uint8/int dtype array) to float32 codebook
    values with a binary select tree (15 vselects, log-depth)."""
    c = [np.float32(v) for v in code]

    def tree(lo, hi):
        if hi - lo == 1:
            return jnp.full(q.shape, c[lo], dtype=jnp.float32)
        mid = (lo + hi) // 2
        return jnp.where(q < mid, tree(lo, mid), tree(mid, hi))

    return tree(0, 16)


def _gemm4bit_kernel(a_even_ref, a_odd_ref, bp_ref, scale_ref, out_ref, *, code, blocksize, n_k):
    k = pl.program_id(2)

    p = bp_ref[:]  # [TN, TKh] uint8
    hi = (p >> 4).astype(jnp.uint8)
    lo = (p & 0xF).astype(jnp.uint8)

    # Per-block scale, broadcast to per-byte: each absmax covers bs/2 bytes.
    scale = pltpu.repeat(scale_ref[:], blocksize // 2, axis=1)  # [TN, TKh] f32

    b_hi = (_decode_tree(hi, code) * scale).astype(a_even_ref.dtype)
    b_lo = (_decode_tree(lo, code) * scale).astype(a_even_ref.dtype)

    dims = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(a_even_ref[:], b_hi, dims, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(a_odd_ref[:], b_lo, dims, preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(k > 0)
    def _accum():
        out_ref[:] += acc


def _pick_tiles(M: int, N: int, K: int, blocksize: int):
    """Tile selection: TKh (packed-K tile) must be a lane multiple and a
    multiple of bs/2 so absmax tiles align; TN a sublane-friendly row tile."""
    TKh_candidates = (1024, 512, 256, 128)
    TKh = next((t for t in TKh_candidates if (K // 2) % t == 0 and t % max(blocksize // 2, 1) == 0), None)
    TN = next((t for t in (256, 128, 64, 32) if N % t == 0), None)
    if M <= 16:
        TM = M
    else:
        TM = next((t for t in (256, 128, 64, 32, 16, 8) if M % t == 0), None)
    return TM, TN, TKh


def fused_gemm_supported(M: int, N: int, K: int, blocksize: int) -> bool:
    if K % blocksize != 0 or K % 256 != 0 or blocksize < 32:
        return False
    TM, TN, TKh = _pick_tiles(M, N, K, blocksize)
    return TN is not None and TKh is not None and TM is not None


@functools.partial(
    jax.jit, static_argnames=("code", "blocksize", "out_dtype")
)
def _gemm_4bit_fused_jit(A, B_packed, absmax, *, code, blocksize, out_dtype):
    M, K = A.shape
    N = B_packed.shape[0]
    Kh = K // 2

    TM, TN, TKh = _pick_tiles(M, N, K, blocksize)
    code_arr = np.asarray(code, dtype=np.float32)

    # Pad M up to a bf16-friendly sublane count for tiny decode batches.
    M_pad = max(TM, 16)
    if M < M_pad:
        A = jnp.pad(A, ((0, M_pad - M), (0, 0)))
        TM = M_pad

    a_even = A[:, 0::2]  # [M, Kh] — elements at even k (hi nibbles)
    a_odd = A[:, 1::2]

    n_m = A.shape[0] // TM
    n_n = N // TN
    n_k = Kh // TKh

    grid = (n_m, n_n, n_k)
    kernel = functools.partial(
        _gemm4bit_kernel, code=code_arr, blocksize=blocksize, n_k=n_k
    )

    sb = blocksize // 2  # bytes per quant block
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TKh), lambda m, i, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TKh), lambda m, i, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TKh), lambda m, i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TKh // sb), lambda m, i, k: (i, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda m, i, k: (m, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A.shape[0], N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * A.shape[0] * N * K,
            bytes_accessed=A.shape[0] * K * 2 + N * Kh + N * (K // blocksize) * 4 + A.shape[0] * N * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(a_even, a_odd, B_packed, absmax.reshape(N, K // blocksize))

    return out[:M].astype(out_dtype)


def gemm_4bit_fused(
    A: jax.Array,
    B_packed: jax.Array,
    absmax: jax.Array,
    code,
    blocksize: int,
    shapeB: tuple,
    out_dtype=None,
) -> jax.Array:
    """Fused ``A @ dequant(B)^T``.

    Args:
      A: ``[..., K]`` activations (bf16/f16/f32).
      B_packed: packed 4-bit weight, any shape with ``N*K/2`` bytes.
      absmax: float32 ``[N*K/blocksize]`` per-block scales (already
        de-nested if double-quantized).
      code: 16-entry codebook (numpy array or tuple; compile-time constant).
      blocksize: quantization block size along K.
      shapeB: the logical ``(N, K)`` weight shape.
    """
    N, K = shapeB
    lead = A.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    out_dtype = out_dtype or A.dtype
    code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:16])
    out = _gemm_4bit_fused_jit(
        A.reshape(M, K),
        B_packed.reshape(N, K // 2),
        absmax,
        code=code_t,
        blocksize=blocksize,
        out_dtype=out_dtype,
    )
    return out.reshape(*lead, N)


# ---------------------------------------------------------------------------
# Standalone blockwise 4-bit dequantize kernel (for the grad path and the
# large-M fallback; reference csrc/kernels.cu:465-529).
# ---------------------------------------------------------------------------


def _dequant4_kernel(bp_ref, scale_ref, hi_ref, lo_ref, *, code, blocksize):
    p = bp_ref[:]
    scale = pltpu.repeat(scale_ref[:], blocksize // 2, axis=1)
    hi_ref[:] = (_decode_tree((p >> 4).astype(jnp.uint8), code) * scale).astype(hi_ref.dtype)
    lo_ref[:] = (_decode_tree((p & 0xF).astype(jnp.uint8), code) * scale).astype(lo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("code", "blocksize", "shape", "dtype"))
def dequantize_4bit_pallas(B_packed, absmax, *, code, blocksize, shape, dtype):
    """Dequantize a packed 4-bit weight to ``dtype`` with a Pallas kernel.

    Returns the full [N, K] weight.  The decoded halves (even/odd k) are
    produced separately and re-interleaved by XLA — used where a
    materialized weight is genuinely needed (e.g. backward's grad @ W).
    """
    N, K = shape
    Kh = K // 2
    code_arr = np.asarray(code, dtype=np.float32)
    TN = next(t for t in (256, 128, 64, 32, 16, 8, 4, 2, 1) if N % t == 0)
    TKh = next(t for t in (1024, 512, 256, 128) if Kh % t == 0 and t % (blocksize // 2) == 0)
    grid = (N // TN, Kh // TKh)
    sb = blocksize // 2
    hi, lo = pl.pallas_call(
        functools.partial(_dequant4_kernel, code=code_arr, blocksize=blocksize),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, TKh), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TKh // sb), lambda i, k: (i, k), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TN, TKh), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TKh), lambda i, k: (i, k), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Kh), dtype),
            jax.ShapeDtypeStruct((N, Kh), dtype),
        ],
        interpret=_interpret(),
    )(B_packed.reshape(N, Kh), absmax.reshape(N, K // blocksize))
    out = jnp.stack([hi, lo], axis=-1).reshape(N, K)
    return out
