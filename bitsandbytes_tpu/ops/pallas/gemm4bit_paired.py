"""Paired-layout fused 4-bit dequantize + matmul kernel (decode hot path v2).

Second-generation TPU kernel for ``out = A @ dequant(B)^T`` replacing the
even/odd-K-split kernel (`gemm4bit.py`) on the decode path.  Same math as
the reference's fused 4-bit GEMM (csrc/gemm_4bit_simt.cu, csrc/kernels.cu:
1452-1567) but built around three TPU-specific tricks that cut the VPU
decode cost from ~30 ops/element (compare+select tree on one nibble per
32-bit lane) to ~10 ops/element:

1. **N-paired byte packing.**  The packed byte at ``[n2, k]`` holds weight
   rows ``2*n2`` (high nibble) and ``2*n2+1`` (low nibble) at column ``k``
   — pairs along N, not K.  Quantization blocks still run along K per row,
   so absmax semantics are untouched; only the byte layout differs from the
   checkpoint-interop layout (relayout happens once at load, like the
   existing flat->2D relayout).

2. **Pair-packed select trees + sub-word extraction.**  Both nibbles of a
   byte decode in a single int32 lane: a 7-select tree over *pairs* of
   bf16 bit patterns picks a 32-bit word holding two candidate patterns,
   and a per-lane variable shift (hardware-supported, probed) extracts the
   right 16-bit half.  Two trees (one per nibble) + an OR builds
   ``w32 = bf16bits(code[lo]) << 16 | bf16bits(code[hi])`` in ~19 ops per
   byte — ~9.5 per element, vs ~30 for the 15-compare+15-select tree.

3. **Sublane bitcast + post-dot block scaling.**  ``pltpu.bitcast`` turns
   the int32 ``[N/2, K]`` tile into bf16 ``[N, K]`` rows (probed mapping:
   lane low half -> row 2i, high half -> row 2i+1) with weight rows in
   natural order — no shuffles, no even/odd A split.  The per-block scale
   is applied *after* the MXU dot, one fused multiply-add of the
   ``[TM, TN]`` accumulator per quantization block, instead of per weight
   element: sub-dots contract one quant block (64 columns) at a time.

The kernel decodes *unit* code values (bf16-rounded codebook entries) and
scales in f32 after accumulation — one bf16 rounding per weight, the same
error class as the reference's dequant-then-matmul (fp32 dequant, bf16
MXU operand: backends/default/ops.py:269-283).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import ml_dtypes

__all__ = [
    "pack_npaired",
    "unpack_npaired",
    "paired_gemm_supported",
    "gemm_4bit_paired",
    "paired_gemm_nt_supported",
    "gemm_4bit_paired_nt",
    "paired_dequant_supported",
    "dequantize_paired_fast",
]


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


# ---------------------------------------------------------------------------
# packing helpers (host/XLA side, load-time)
# ---------------------------------------------------------------------------


def pack_npaired(q: jax.Array) -> jax.Array:
    """Pack 4-bit codes ``q [N, K]`` (uint8 values 0..15) along N:
    ``byte[n2, k] = (q[2*n2, k] << 4) | q[2*n2+1, k]``."""
    q = q.astype(jnp.uint8)
    return (q[0::2, :] << 4) | q[1::2, :]


def unpack_npaired(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_npaired`: ``[N/2, K] -> [N, K]`` codes."""
    n2, K = packed.shape
    hi = (packed >> 4).astype(jnp.uint8)
    lo = (packed & 0xF).astype(jnp.uint8)
    return jnp.stack([hi, lo], axis=1).reshape(2 * n2, K)


def repack_2d_to_npaired(packed_2d: jax.Array, shape) -> jax.Array:
    """Relayout the K-adjacent-pair layout ``[N, K/2]`` (checkpoint interop
    byte order) into the N-paired layout ``[N/2, K]`` (one-time, at load)."""
    N, K = shape
    flat = packed_2d.reshape(N, K // 2)
    hi = (flat >> 4).astype(jnp.uint8)
    lo = (flat & 0xF).astype(jnp.uint8)
    q = jnp.stack([hi, lo], axis=-1).reshape(N, K)
    return pack_npaired(q)


def repack_npaired_to_2d(packed_p: jax.Array) -> jax.Array:
    """Inverse relayout: ``[N/2, K] -> [N, K/2]`` interop byte order."""
    q = unpack_npaired(packed_p)
    N, K = q.shape
    pairs = q.reshape(N, K // 2, 2)
    return (pairs[..., 0] << 4) | pairs[..., 1]


# ---------------------------------------------------------------------------
# codebook -> packed bf16-pattern pair words (compile-time constants)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pair_words(code_t: tuple):
    """For a 16-entry codebook, the two 8-word LUTs of packed bf16 patterns.

    ``P[v]`` = uint16 bits of ``bfloat16(code[v])`` (round-nearest-even,
    matching jnp's f32->bf16 cast so the oracle comparison is exact).
    ``wordsA[i] = P[2i+1] << 16 | P[2i]`` selected by nibble high bits;
    the extracted half goes to the *low* 16 bits for the high nibble
    (-> bf16 row 2*n2) and the *high* 16 bits for the low nibble
    (-> row 2*n2+1), per the probed pltpu.bitcast row mapping.
    """
    code = np.asarray(code_t, dtype=np.float32)
    patterns = code.astype(ml_dtypes.bfloat16).view(np.uint16).astype(np.uint32)
    words = (patterns[1::2] << 16) | patterns[0::2]  # [8] uint32
    # as python ints in int32 range (two's complement) for jnp.int32 literals
    return tuple(int(x) - (1 << 32) if x >= (1 << 31) else int(x) for x in words)


def _tree8(idx, words, step: int):
    """7-select binary tree: pick ``words[idx // step // 2]`` ... i.e. the
    pair word for pair index ``idx >> log2(2*step)`` — conditions are
    ``idx < t`` with thresholds ``t = 2*step, 4*step, ...`` so no shift of
    ``idx`` is ever needed."""
    w = [jnp.int32(x) for x in words]

    def tree(lo, hi):
        if hi - lo == 1:
            return w[lo]
        mid = (lo + hi) // 2
        return jnp.where(idx < mid * 2 * step, tree(lo, mid), tree(mid, hi))

    return tree(0, 8)


def _decode_pair_word(p, code_t: tuple):
    """Per-lane decode of one packed byte ``p`` (int32, 0..255) into
    ``w32 = bf16bits(code[p & 0xF]) << 16 | bf16bits(code[p >> 4])``.

    ~19 ops/byte: two 7-select trees + variable-shift extraction."""
    words = _pair_words(code_t)
    # high nibble -> low 16 bits: tree over p with thresholds 32*m
    wH = _tree8(p, words, step=16)
    h = jax.lax.shift_right_logical(wH, p & 16) & 0xFFFF
    # low nibble -> high 16 bits: tree over (p & 15) with thresholds 2*m
    ql = p & 15
    wL = _tree8(ql, words, step=1)
    # ql even: pattern is in low half -> shift left 16; odd: already high.
    amt = ((ql & 1) ^ 1) << 4
    l = jax.lax.shift_left(wL, amt) & jnp.int32(-65536)
    return h | l


def _to_bf16_rows(w32):
    """int32 [S, L] -> bf16 [2S, L]; low half -> row 2i, high -> 2i+1
    (probed hardware mapping; emulated identically in interpret mode)."""
    if _interpret():
        both = jax.lax.bitcast_convert_type(w32, jnp.bfloat16)  # [S, L, 2]
        return jnp.swapaxes(both, 1, 2).reshape(2 * w32.shape[0], w32.shape[1])
    return pltpu.bitcast(w32, jnp.bfloat16)


# ---------------------------------------------------------------------------
# 2x-packed int16 decode (v3 candidate, DEFAULT OFF): interleave both nibble
# indices into an int16 array [2S, L], then ONE 4-level bit-keyed 16:1
# multiplexer.  The op-count argument (~13.5 lane-ops/element if Mosaic
# packs int16 ALU 2x) did NOT materialize on the real chip: measured 1.96x
# SLOWER than the pair-word trees at [4096,4096] M=16 and equal at
# [28672,4096] (experiments/ab_decode16.py; isolation probe
# experiments/probe_decode16.py agrees: 20.4 vs 15.8 ps/byte — Mosaic does
# not pack int16 selects).  BNB_DECODE16=1 opts in for future re-probing.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _patterns16(code_t: tuple):
    """int16 (two's complement) bf16 bit patterns of the 16 entries."""
    pats = np.asarray(code_t, np.float32).astype(ml_dtypes.bfloat16).view(np.uint16)
    return tuple(int(x) - (1 << 16) if x >= (1 << 15) else int(x) for x in pats)


def _mux16(ni, code_t: tuple):
    """4-level bit-keyed mux over the 16 int16 patterns; ni int16 [2S, L]."""
    pat = _patterns16(code_t)
    c0 = (ni & jnp.int16(1)) != 0
    c1 = (ni & jnp.int16(2)) != 0
    c2 = (ni & jnp.int16(4)) != 0
    c3 = (ni & jnp.int16(8)) != 0
    lvl = [
        jnp.where(c0, jnp.int16(pat[2 * v + 1]), jnp.int16(pat[2 * v]))
        for v in range(8)
    ]
    lvl = [jnp.where(c1, lvl[2 * v + 1], lvl[2 * v]) for v in range(4)]
    lvl = [jnp.where(c2, lvl[2 * v + 1], lvl[2 * v]) for v in range(2)]
    return jnp.where(c3, lvl[1], lvl[0])


def _decode_units(p, code_t: tuple):
    """Packed bytes ``p`` int32 [S, L] -> bf16 unit rows [2S, L] (row 2i
    from the high nibble, 2i+1 from the low — the N-paired row order)."""
    if os.environ.get("BNB_DECODE16", "0") != "1":
        return _to_bf16_rows(_decode_pair_word(p, code_t))
    # ni[2i] = high nibble, ni[2i+1] = low nibble (low int32 half -> row 2i)
    ni32 = ((p & 15) << 16) | jax.lax.shift_right_logical(p, 4)
    if _interpret():
        both = jax.lax.bitcast_convert_type(ni32, jnp.int16)  # [S, L, 2]
        ni = jnp.swapaxes(both, 1, 2).reshape(2 * p.shape[0], p.shape[1])
        pat = _mux16(ni, code_t)
        return jax.lax.bitcast_convert_type(pat, jnp.bfloat16)
    ni = pltpu.bitcast(ni32, jnp.int16)  # [2S, L]
    return pltpu.bitcast(_mux16(ni, code_t), jnp.bfloat16)


# ---------------------------------------------------------------------------
# forward kernel: out[M, N] = A[M, K] @ dequant(B)[N, K]^T
# ---------------------------------------------------------------------------


def _dot_f32acc(a, b, dims):
    """f32-accumulating dot; f32 operands use the 3-pass bf16 split (Mosaic
    does not honor HIGHEST for f32 operands — see gemm4bit._dot_acc)."""
    if a.dtype == jnp.float32:
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jax.lax.dot_general(a_hi, b, dims, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        out += jax.lax.dot_general(a_lo, b, dims, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)
        return out
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32, precision=jax.lax.Precision.DEFAULT)


def _paired_kernel(a_ref, bp_ref, scale_ref, out_ref, *, code_t, blocksize, scale_mode):
    k = pl.program_id(2)
    p = bp_ref[:].astype(jnp.int32)  # [TN/2, TK] packed bytes
    units = _decode_units(p, code_t)  # [TN, TK] bf16 unit code values
    TK = p.shape[1]
    nb = TK // blocksize
    dims = (((1,), (1,)), ((), ()))

    if scale_mode == "subdot":
        # one MXU dot + one [TM, TN] scale-FMA per quantization block
        acc = None
        a = a_ref[:]
        for b in range(nb):
            sl = slice(b * blocksize, (b + 1) * blocksize)
            sub = _dot_f32acc(a[:, sl], units[:, sl], dims)
            term = sub * scale_ref[b : b + 1, :]
            acc = term if acc is None else acc + term
    else:  # per-element scale on the decoded units (fallback mode)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, TK), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (nb, TK), 1) // blocksize
        # one-hot expander: f32 x f32 at DEFAULT precision (bf16-mantissa
        # scale broadcast — element mode's accuracy class is bf16 anyway;
        # mixed f32 x bf16 operand dtypes are rejected by Mosaic)
        E = (rows == cols).astype(jnp.float32)
        sc = jax.lax.dot_general(
            scale_ref[:], E, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # [TN, TK]
        w = (units.astype(jnp.float32) * sc).astype(jnp.bfloat16)
        acc = _dot_f32acc(a_ref[:], w, dims)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(k > 0)
    def _accum():
        out_ref[:] += acc


def _pick_tiles_paired(M: int, N: int, K: int, blocksize: int):
    """TN must be even (row pairs) and divide N; TK a lane multiple and a
    multiple of blocksize dividing K.  Candidate order from an on-device
    sweep over the Llama-3-8B decode shapes (v5e)."""
    if M <= 16:
        TM = M
    else:
        TM = next((t for t in (256, 128, 64, 32, 16, 8) if M % t == 0), None)
    if TM is None:
        return None, None, None

    # Order from the on-device sweep over the Llama-3-8B decode shapes
    # (experiments/sweep_paired.py, v5e): deep-K tiles (TK=2048) with
    # TN=1024 win or tie on every shape; (2048, 2048) trips the remote
    # compile helper (VMEM) and is excluded.
    candidates = (
        (1024, 2048),
        (512, 2048),
        (1024, 1024),
        (512, 1024),
        (2048, 512),
        (1024, 512),
        (512, 512),
        (256, 512),
        (256, 1024),
        (128, 512),
        (256, 256),
        (128, 256),
        (64, 512),
        (64, 256),
        (128, 128),
        (64, 128),
    )

    def vmem_est(tn, tk):
        # p bytes (x2 buf) + w32 + units bf16 + A (x2 buf) + out; tree
        # temporaries are register-reused (measured: (1024, 2048) fits)
        return (
            2 * (tn // 2) * tk
            + (tn // 2) * tk * 4
            + tn * tk * 2
            + 2 * 2 * max(TM, 16) * tk * 2
            + max(TM, 16) * tn * 4
        )

    for tn, tk in candidates:
        if (
            N % tn == 0
            and K % tk == 0
            and tk % blocksize == 0
            and (tk // blocksize) % 8 == 0  # absmax tile sublane constraint
            and (tn // 2) % 8 == 0
            and tk % 128 == 0
            and vmem_est(tn, tk) <= 12 * 1024 * 1024
        ):
            return TM, tn, tk
    return TM, None, None


def paired_gemm_supported(M: int, N: int, K: int, blocksize: int) -> bool:
    if N % 2 or K % blocksize or blocksize < 32:
        return False
    TM, TN, TK = _pick_tiles_paired(M, N, K, blocksize)
    return TM is not None and TN is not None


@functools.partial(
    jax.jit, static_argnames=("code", "blocksize", "out_dtype", "scale_mode", "tiles")
)
def _gemm_4bit_paired_jit(
    A, P, absmax_t, *, code, blocksize, out_dtype, scale_mode="subdot", tiles=None
):
    M, K = A.shape
    N = 2 * P.shape[0]
    TM, TN, TK = tiles if tiles is not None else _pick_tiles_paired(M, N, K, blocksize)

    M_pad = max(TM, 16)
    if M < M_pad:
        A = jnp.pad(A, ((0, M_pad - M), (0, 0)))
        TM = M_pad

    grid = (A.shape[0] // TM, N // TN, K // TK)
    kernel = functools.partial(
        _paired_kernel, code_t=code, blocksize=blocksize, scale_mode=scale_mode
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda m, i, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN // 2, TK), lambda m, i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TK // blocksize, TN), lambda m, i, k: (k, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda m, i, k: (m, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A.shape[0], N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * A.shape[0] * N * K,
            bytes_accessed=A.shape[0] * K * 2 + N * K // 2 + (K // blocksize) * N * 4
            + A.shape[0] * N * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(A, P, absmax_t)
    return out[:M].astype(out_dtype)


def gemm_4bit_paired(
    A: jax.Array,
    P: jax.Array,
    absmax_t: jax.Array,
    code,
    blocksize: int,
    shapeB: tuple,
    out_dtype=None,
    scale_mode: str = "subdot",
    tiles=None,
) -> jax.Array:
    """Fused ``A @ dequant(B)^T`` over the N-paired layout.

    Args:
      A: ``[..., K]`` activations.
      P: ``[N/2, K]`` uint8 N-paired packed payload (:func:`pack_npaired`).
      absmax_t: ``[K/blocksize, N]`` float32 per-block scales, stored
        transposed (kernel-native; avoids a per-call transpose copy).
      code: 16-entry codebook (compile-time constant).
      shapeB: logical ``(N, K)``.
    """
    N, K = shapeB
    lead = A.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    out_dtype = out_dtype or A.dtype
    code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:16])
    out = _gemm_4bit_paired_jit(
        A.reshape(M, K),
        P,
        absmax_t,
        code=code_t,
        blocksize=blocksize,
        out_dtype=out_dtype,
        scale_mode=scale_mode,
        tiles=tiles,
    )
    return out.reshape(*lead, N)


# ---------------------------------------------------------------------------
# transposed orientation: out[M, K] = G[M, N] @ dequant(B)[N, K]
# (the 4-bit matmul backward, reference autograd/_functions.py:381-384) —
# same decode, contraction over the bf16 rows instead of the columns.
# ---------------------------------------------------------------------------


def _paired_nt_kernel(g_ref, bp_ref, scale_ref, out_ref, *, code_t, blocksize):
    n = pl.program_id(2)
    p = bp_ref[:].astype(jnp.int32)
    units = _decode_units(p, code_t)  # [TN, TK]
    TK = p.shape[1]
    nb = TK // blocksize
    g = g_ref[:]
    # scale[n, b] folds into G per k-block: out[:, b] = (g * scale_b) @ units
    parts = []
    for b in range(nb):
        gs = (g * scale_ref[b : b + 1, :]).astype(
            jnp.bfloat16 if g.dtype != jnp.float32 else jnp.float32
        )
        sub = _dot_f32acc(
            gs, units[:, b * blocksize : (b + 1) * blocksize], (((1,), (0,)), ((), ()))
        )
        parts.append(sub)
    acc = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    @pl.when(n == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(n > 0)
    def _accum():
        out_ref[:] += acc


def paired_gemm_nt_supported(M: int, N: int, K: int, blocksize: int) -> bool:
    return paired_gemm_supported(M, N, K, blocksize)


@functools.partial(jax.jit, static_argnames=("code", "blocksize", "out_dtype"))
def _gemm_4bit_paired_nt_jit(G, P, absmax_t, *, code, blocksize, out_dtype):
    M, N = G.shape
    K = P.shape[1]
    TM, TN, TK = _pick_tiles_paired(M, N, K, blocksize)

    M_pad = max(TM, 16)
    if M < M_pad:
        G = jnp.pad(G, ((0, M_pad - M), (0, 0)))
        TM = M_pad

    grid = (G.shape[0] // TM, K // TK, N // TN)
    kernel = functools.partial(_paired_nt_kernel, code_t=code, blocksize=blocksize)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TN), lambda m, k, n: (m, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN // 2, TK), lambda m, k, n: (n, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TK // blocksize, TN), lambda m, k, n: (k, n), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((TM, TK), lambda m, k, n: (m, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G.shape[0], K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(G, P, absmax_t)
    return out[:M].astype(out_dtype)


def gemm_4bit_paired_nt(
    G, P, absmax_t, code, blocksize: int, shapeB, out_dtype=None
) -> jax.Array:
    """Fused ``G @ dequant(B)`` (contract over N) on the N-paired layout."""
    N, K = shapeB
    lead = G.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    out_dtype = out_dtype or G.dtype
    code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:16])
    out = _gemm_4bit_paired_nt_jit(
        G.reshape(M, N), P, absmax_t, code=code_t, blocksize=blocksize, out_dtype=out_dtype
    )
    return out.reshape(*lead, K)


# ---------------------------------------------------------------------------
# Fast bf16 dequantize of the paired layout (prefill/training route): for
# M >~ 512 the MXU is the bottleneck, and a materialize-then-matmul beats the
# fused kernel whose sub-dots/scale work cap MXU utilization — decode once at
# HBM-bound speed, then run the full-K bf16 dot at full MXU depth.
# ---------------------------------------------------------------------------


def _paired_dequant_kernel(bp_ref, scale_ref, out_ref, *, code_t, blocksize):
    p = bp_ref[:].astype(jnp.int32)
    units = _decode_units(p, code_t)  # [TN, TK]
    TK = p.shape[1]
    nb = TK // blocksize
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, TK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, TK), 1) // blocksize
    E = (rows == cols).astype(jnp.float32)
    sc = jax.lax.dot_general(
        scale_ref[:], E, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # [TN, TK]
    out_ref[:] = (units.astype(jnp.float32) * sc).astype(out_ref.dtype)


def _dequant_tiles_paired(N: int, K: int, blocksize: int):
    TN = next((t for t in (512, 256, 128, 64, 32, 16) if N % t == 0), None)
    TK = next(
        (t for t in (2048, 1024, 512, 256)
         if K % t == 0 and t % blocksize == 0 and (t // blocksize) % 8 == 0),
        None,
    )
    return TN, TK


def paired_dequant_supported(N: int, K: int, blocksize: int) -> bool:
    if N % 2 or K % blocksize:
        return False
    TN, TK = _dequant_tiles_paired(N, K, blocksize)
    return TN is not None and TK is not None


@functools.partial(jax.jit, static_argnames=("code", "blocksize", "dtype"))
def dequantize_paired_fast(P, absmax_t, *, code, blocksize, dtype=jnp.bfloat16):
    """Paired payload [N/2, K] -> dequantized weight [N, K] in ``dtype``.

    One HBM pass; the per-element scale broadcast rides the MXU expander
    (bf16-mantissa scale — the same accuracy class as the fused kernel's
    weight rounding, NOT the bit-exact oracle path; use for matmul inputs,
    not for checkpoint round-trips)."""
    N2, K = P.shape
    N = 2 * N2
    code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:16])
    TN, TK = _dequant_tiles_paired(N, K, blocksize)
    return pl.pallas_call(
        functools.partial(_paired_dequant_kernel, code_t=code_t, blocksize=blocksize),
        grid=(N // TN, K // TK),
        in_specs=[
            pl.BlockSpec((TN // 2, TK), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TK // blocksize, TN), lambda i, k: (k, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, TK), lambda i, k: (i, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, K), jnp.dtype(dtype)),
        interpret=_interpret(),
    )(P, absmax_t)
