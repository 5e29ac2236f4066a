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

* **Per-block scales via MXU expander broadcast.**  absmax is fed to the
  kernel *transposed* ``[K/bs, N]`` (so its tiles satisfy Mosaic's
  (8, 128) block constraints) and broadcast to per-byte granularity with a
  tiny one-hot expander matmul ``scale[n, j] = sum_b absmax_T[b, n] *
  E[b, j]`` — the MXU does the transpose+broadcast in one cheap op.

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
    """Map 4-bit indices ``q`` (int32 array) to float32 codebook values with
    a binary select tree (15 vselects, log-depth).  int32 compares — Mosaic
    cannot cast uint8 directly to float and mis-lays-out u8-compare masks."""
    c = [np.float32(v) for v in code]

    def tree(lo, hi):
        if hi - lo == 1:
            return jnp.full(q.shape, c[lo], dtype=jnp.float32)
        mid = (lo + hi) // 2
        return jnp.where(q < mid, tree(lo, mid), tree(mid, hi))

    return tree(0, 16)


def _block_expander(nb: int, TKh: int, sb: int):
    """One-hot f32 matrix E[nb, TKh] with E[b, j] = (j // sb == b): broadcasts
    per-block scales to per-byte columns via a single small matmul."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, TKh), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, TKh), 1) // sb
    return (rows == cols).astype(jnp.float32)


def _broadcast_scale(scale_t, TKh: int, sb: int):
    """[nb, TN] transposed per-block scales -> [TN, TKh] per-byte scales.

    The expander E is one-hot, so each output is a single product — no
    accumulation.  Splitting the f32 scale into bf16 hi + bf16 lo residual
    and summing two DEFAULT-precision one-hot matmuls reconstructs the f32
    value exactly (up to the final add's rounding), at ~1/3 the MXU passes
    of a HIGHEST-precision f32 matmul."""
    nb = scale_t.shape[0]
    E = _block_expander(nb, TKh, sb).astype(jnp.bfloat16)
    dims = (((0,), (0,)), ((), ()))
    hi = scale_t.astype(jnp.bfloat16)
    lo = (scale_t - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(hi, E, dims, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    out += jax.lax.dot_general(lo, E, dims, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
    return out


def _dot_acc(a, b, dims):
    """dot_general with f32 accumulation; f32 operands get a manual 3-pass
    bf16 split (Mosaic accepts but does not honor HIGHEST for f32 operands —
    measured bf16-level error), matching the reference's full-f32 gemv
    numerics to ~2^-22 relative."""
    if a.dtype == jnp.float32:
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jax.lax.dot_general(a_hi, b_hi, dims, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        out += jax.lax.dot_general(a_hi, b_lo, dims, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        out += jax.lax.dot_general(a_lo, b_hi, dims, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        return out
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)


def _gemm4bit_kernel(a_even_ref, a_odd_ref, bp_ref, scale_ref, out_ref, *, code, blocksize, n_k):
    k = pl.program_id(2)

    p = bp_ref[:].astype(jnp.int32)  # [TN, TKh] packed bytes
    hi = p >> 4
    lo = p & 0xF

    # Per-block scale: scale_ref is [TKh//sb, TN] (transposed); expand to
    # per-byte [TN, TKh] on the MXU.
    TKh = p.shape[1]
    scale = _broadcast_scale(scale_ref[:], TKh, blocksize // 2)

    b_hi = (_decode_tree(hi, code) * scale).astype(a_even_ref.dtype)
    b_lo = (_decode_tree(lo, code) * scale).astype(a_even_ref.dtype)

    dims = (((1,), (1,)), ((), ()))
    acc = _dot_acc(a_even_ref[:], b_hi, dims)
    acc += _dot_acc(a_odd_ref[:], b_lo, dims)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(k > 0)
    def _accum():
        out_ref[:] += acc


def _pick_tiles(M: int, N: int, K: int, blocksize: int):
    """Tile selection: TKh (packed-K tile) must be a lane multiple and a
    multiple of bs/2 so absmax tiles align; TN a sublane-friendly row tile.

    Candidate order comes from an on-device sweep over the Llama decode
    shapes (v5e): tall-N tiles with shallow K ((2048, 256)) won or tied on
    [28672,4096], [4096,14336] and [4096,4096]; [6144,4096] prefers
    (256, 1024) by ~9% but tolerates the tall tile."""
    sb = blocksize // 2

    def ok(tn, tkh):
        return (
            N % tn == 0
            and (K // 2) % tkh == 0
            and tkh % sb == 0
            and (tkh // sb) % 8 == 0
        )

    # Sweep-derived: tall-N, shallow-K tiles win across the decode shapes
    # ([28672,4096]: (3584,256); [6144,4096]: (3072,256); [4096,*]:
    # (4096,256)).  VMEM bound: TN*TKh <= 2^20 keeps the f32 decode
    # temporaries + bf16 operands + pipeline buffers inside 16 MB.
    if M <= 16:
        TM = M
    else:
        TM = next((t for t in (256, 128, 64, 32, 16, 8) if M % t == 0), None)
    if TM is None:
        return TM, None, None

    candidates = tuple(
        (tn, 256) for tn in (3584, 4096, 3072, 2048, 1536, 1024, 512, 256, 128)
    ) + (
        (1024, 512),
        (512, 512),
        (256, 1024),
        (256, 512),
        (128, 512),
        (256, 256),
        (128, 256),
        (128, 128),
    )

    def vmem_est(tn, tkh):
        # out f32 + double-buffered A bf16 pair + B u8 + ~3 f32 decode temps
        return (
            max(TM, 16) * tn * 4
            + 2 * 2 * max(TM, 16) * tkh * 2
            + tn * tkh
            + 3 * tn * tkh * 4
        )

    TN = TKh = None
    for tn, tkh in candidates:
        if ok(tn, tkh) and vmem_est(tn, tkh) <= 14 * 1024 * 1024:
            TN, TKh = tn, tkh
            break
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
            pl.BlockSpec((TKh // sb, TN), lambda m, i, k: (k, i), memory_space=pltpu.VMEM),
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
    )(a_even, a_odd, B_packed, absmax.reshape(N, K // blocksize).T)

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
    p = bp_ref[:].astype(jnp.int32)
    scale = _broadcast_scale(scale_ref[:], p.shape[1], blocksize // 2)
    hi_ref[:] = (_decode_tree(p >> 4, code) * scale).astype(hi_ref.dtype)
    lo_ref[:] = (_decode_tree(p & 0xF, code) * scale).astype(lo_ref.dtype)


def _dequant_tiles(N, K, blocksize):
    sb2 = blocksize // 2
    Kh = K // 2
    TN = next((t for t in (256, 128) if N % t == 0), None)
    TKh = next(
        (t for t in (512, 256, 128) if Kh % t == 0 and t % sb2 == 0 and (t // sb2) % 8 == 0),
        None,
    )
    return (TN, TKh) if (TN is not None and TKh is not None) else (None, None)


def pallas_dequant_supported(N: int, K: int, blocksize: int) -> bool:
    return K % 2 == 0 and K % blocksize == 0 and _dequant_tiles(N, K, blocksize)[0] is not None


@functools.partial(jax.jit, static_argnames=("code", "blocksize", "shape", "dtype"))
def dequantize_4bit_pallas(B_packed, absmax, *, code, blocksize, shape, dtype):
    """Dequantize a packed 4-bit weight to ``dtype`` with a Pallas kernel.

    Returns the full [N, K] weight.  The decoded halves (even/odd k) are
    produced separately and re-interleaved by XLA — used where a
    materialized weight is genuinely needed (e.g. backward's grad @ W).
    """
    dtype = jnp.dtype(dtype)
    N, K = shape
    Kh = K // 2
    code_arr = np.asarray(code, dtype=np.float32)
    TN, TKh = _dequant_tiles(N, K, blocksize)
    if TN is None:
        raise ValueError(f"pallas dequant unsupported for shape {(N, K)} bs={blocksize}")
    grid = (N // TN, Kh // TKh)
    sb = blocksize // 2
    hi, lo = pl.pallas_call(
        functools.partial(_dequant4_kernel, code=code_arr, blocksize=blocksize),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN, TKh), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TKh // sb, TN), lambda i, k: (k, i), memory_space=pltpu.VMEM),
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
    )(B_packed.reshape(N, Kh), absmax.reshape(N, K // blocksize).T)
    out = jnp.stack([hi, lo], axis=-1).reshape(N, K)
    return out


# ---------------------------------------------------------------------------
# Transposed-orientation fused kernel: out = A @ dequant(B)  (contract over N)
# — the backward of the 4-bit matmul (grad_A = g @ W, reference
# autograd/_functions.py:381-384) without materializing W in HBM.
# ---------------------------------------------------------------------------


def _gemm4bit_nt_kernel(a_ref, bp_ref, scale_ref, hi_ref, lo_ref, *, code, blocksize):
    nn = pl.program_id(2)
    p = bp_ref[:].astype(jnp.int32)
    TKh = p.shape[1]
    scale = _broadcast_scale(scale_ref[:], TKh, blocksize // 2)
    dh = (_decode_tree(p >> 4, code) * scale).astype(a_ref.dtype)
    dl = (_decode_tree(p & 0xF, code) * scale).astype(a_ref.dtype)
    dims = (((1,), (0,)), ((), ()))  # contract A's N with B-tile rows
    acc_h = _dot_acc(a_ref[:], dh, dims)
    acc_l = _dot_acc(a_ref[:], dl, dims)

    @pl.when(nn == 0)
    def _init():
        hi_ref[:] = acc_h
        lo_ref[:] = acc_l

    @pl.when(nn > 0)
    def _accum():
        hi_ref[:] += acc_h
        lo_ref[:] += acc_l


def fused_gemm_nt_supported(M: int, N: int, K: int, blocksize: int) -> bool:
    if K % blocksize or K % 2 or blocksize < 32:
        return False
    TM, TN, TKh = _pick_tiles(M, N, K, blocksize)
    # contraction tile over N must also divide N
    return TM is not None and TN is not None and TKh is not None


@functools.partial(jax.jit, static_argnames=("code", "blocksize", "out_dtype"))
def _gemm_4bit_nt_jit(A, B_packed, absmax, *, code, blocksize, out_dtype):
    M, N = A.shape
    Kh = B_packed.shape[1]
    K = 2 * Kh
    code_arr = np.asarray(code, dtype=np.float32)
    TM, TN, TKh = _pick_tiles(M, N, K, blocksize)

    M_pad = max(TM, 16)
    if M < M_pad:
        A = jnp.pad(A, ((0, M_pad - M), (0, 0)))
        TM = M_pad

    grid = (A.shape[0] // TM, Kh // TKh, N // TN)
    sb = blocksize // 2
    hi, lo = pl.pallas_call(
        functools.partial(_gemm4bit_nt_kernel, code=code_arr, blocksize=blocksize),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TN), lambda m, k, n: (m, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, TKh), lambda m, k, n: (n, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TKh // sb, TN), lambda m, k, n: (k, n), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, TKh), lambda m, k, n: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TKh), lambda m, k, n: (m, k), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((A.shape[0], Kh), jnp.float32),
            jax.ShapeDtypeStruct((A.shape[0], Kh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(A, B_packed, absmax.reshape(N, K // blocksize).T)
    out = jnp.stack([hi, lo], axis=-1).reshape(A.shape[0], K)
    return out[:M].astype(out_dtype)


def gemm_4bit_nt_fused(A, B_packed, absmax, code, blocksize: int, shapeB, out_dtype=None):
    """Fused ``A @ dequant(B)`` (no transpose): A is [..., N], B logical
    [N, K] packed along K.  Returns [..., K]."""
    N, K = shapeB
    lead = A.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    out_dtype = out_dtype or A.dtype
    code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:16])
    out = _gemm_4bit_nt_jit(
        A.reshape(M, N),
        B_packed.reshape(N, K // 2),
        absmax,
        code=code_t,
        blocksize=blocksize,
        out_dtype=out_dtype,
    )
    return out.reshape(*lead, K)
