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
    "paired_gemm_dq_supported",
    "gemm_4bit_paired_dq",
    "gemm_4bit_paired_nt_dq",
    "paired_dequant_dq_supported",
    "dequantize_paired_fast_dq",
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
#
# Round 4 closed the rest of the candidate family on-chip
# (experiments/probe_mxu_decode.py): the one-hot MXU rider (stacked bf16
# 0/1 masks, one dot per quant block, code applied post-dot — exact) ran
# 5.79x slower at [4096,4096] M=16, the int8-domain variant 3.63x, and
# Mosaic REJECTS int8 vector ALU outright ("Only vector<i16> and
# vector<i32> are supported").  The pair-word select tree below is the
# measured lane-op floor for NF4 decode on this Mosaic generation.
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
# In-kernel nested (double-quantized) absmax decode — the TPU analog of the
# reference fused kernel's register-level nested dequant
# (csrc/gemm_4bit_simt.cu:104-117; op schema _ops.py:272-289).
#
# The absmax arrives as uint8 dynamic-map codes stored transposed [K/bs, N]
# (the paired-layout storage convention), plus the second-level f32 scales
# (one per 256 first-level blocks in *flat canonical* N-major order,
# reference functional.py:938-951) and the scalar mean offset:
#
#     scale[i, j] = seg_decode(u8[i, j]) * s2[((n0+j)*KB + kb0+i) >> 8] + off
#
# The second-level index depends only on the (static) position, and within
# one kernel tile each column spans AT MOST TWO second-level blocks
# (TK/bs <= 64 << 256), so s2 resolves with ZERO gathers: per (k-tile,
# column) the caller precomputes the low/high-block s2 values and the
# switch row — three [K/TK, N] f32 planes, 12 bytes per TK*blocksize
# weights — and the kernel picks per element with one iota compare.  The
# u8 -> f32 decode is piecewise-linear segment arithmetic on the dynamic
# map's half table (functional/dynamic_segments.py) — the SAME code the
# jnp tier's QuantState.dequant_absmax runs, so kernel and oracle stay
# bit-identical (the 8-bit-optimizer precedent; <= 2 ulp from the
# table-gather reconstruction, inside every reference-parity budget).
# Cost: ~25 lane-ops per scale element = ~0.4 per weight element on top of
# the ~9.5/element payload decode.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dyn_sym_table():
    from ...functional.codebooks import create_dynamic_map
    from ...functional.dynamic_segments import build_segments_sym

    t = build_segments_sym(create_dynamic_map())
    assert t is not None, "canonical dynamic map must be odd-symmetric"
    return t


def _decode_scale_tile(u8, s2a, s2b, sw, off):
    """u8 ``[S, L]`` int32 nested-absmax codes; s2a/s2b ``[1, L]`` f32, sw ``[1, L]``
    i32, off ``[1, L]`` f32 -> f32 scale tile ``[S, L] = seg_decode(u8) * s2 + off``."""
    from ...functional.dynamic_segments import segment_decode_sym

    v = segment_decode_sym(u8, _dyn_sym_table())
    r = jax.lax.broadcasted_iota(jnp.int32, u8.shape, 0)
    s2 = jnp.where(r >= sw, s2b, s2a)
    return v * s2 + off


def _nested_scale_planes(s2, offset, N: int, KB: int, k_tiles: int, TKb: int):
    """Second-level scales resolved per (k-tile, column): returns
    ``(s2a, s2b, sw, off)``, each ``[8 * k_tiles, N]`` f32 with every
    k-tile row replicated 8x (Mosaic block sublanes must be divisible by
    8, and a static ``[0:1, :]`` read beats a dynamic row index); ``off``
    is the broadcast offset row ``[1, N]``.  Column ``n`` of k-tile ``t``
    covers flat first-level blocks ``[n*KB + t*TKb, ... + TKb)`` — at most
    two 256-blocks; ``sw`` is the first in-tile row inside the high block
    (<= 0 when the tile sits in one block, where s2a == s2b anyway)."""
    s2 = s2.reshape(-1).astype(jnp.float32)
    n = np.arange(N, dtype=np.int64)
    # NO gathers, no O(N*KB) intermediates: XLA TPU gathers run ~1 element/
    # cycle — three jnp.take calls building these planes cost ~350 us/matmul
    # at the 8B decode shapes (5x the whole kernel; kernel-only measured
    # 83.5 us) — and a naive repeat(s2, 256) + stride-KB slices re-reads
    # multi-MB vectors per slice (~300 us/layer at the 8B geometry).
    # Number theory shrinks it to O(N * KB/gcd(KB, 256)) <= 7N elements:
    # with g = gcd(KB, 256), S = 256/g, KB' = KB/g and any offset c,
    #   (n*KB + c) >> 8 == (n*KB' + c//g) // S
    # (the fractional part (c mod g)/g can never push the floor over an
    # integer boundary), so s2 per plane row is a stride-KB' slice of the
    # small upsample repeat(s2, S):
    #   s2_plane[t, n] = s2[(n*KB + c_t) >> 8] = repeat(s2, S)[n*KB' + c_t//g]
    g = int(np.gcd(KB, 256))
    S = 256 // g
    KBp = KB // g
    s2_rep = jnp.repeat(s2, S)  # [nb2 * S] >= N * KB'
    span = (N - 1) * KBp + 1

    def row(c: int):
        q = c // g
        return jax.lax.slice_in_dim(s2_rep, q, q + span, stride=KBp)

    rows_a = [row(t * TKb) for t in range(k_tiles)]
    rows_b = [row(t * TKb + TKb - 1) for t in range(k_tiles)]
    sw_r = [((((n * KB + t * TKb + TKb - 1) >> 8) << 8) - (n * KB + t * TKb))
            for t in range(k_tiles)]
    rep8 = lambda rows: jnp.repeat(jnp.stack(rows), 8, axis=0)  # noqa: E731
    s2a = rep8(rows_a)
    s2b = rep8(rows_b)
    sw = jnp.asarray(np.repeat(np.stack(sw_r), 8, axis=0).astype(np.int32))
    off = jnp.broadcast_to(offset.reshape(1, 1).astype(jnp.float32), (1, N))
    return s2a, s2b, sw, off


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


def _subdot_accum(a, units, scale, blocksize: int):
    """One MXU dot + one [TM, TN] scale-FMA per quantization block."""
    dims = (((1,), (1,)), ((), ()))
    nb = units.shape[1] // blocksize
    acc = None
    for b in range(nb):
        sl = slice(b * blocksize, (b + 1) * blocksize)
        sub = _dot_f32acc(a[:, sl], units[:, sl], dims)
        term = sub * scale[b : b + 1, :]
        acc = term if acc is None else acc + term
    return acc


def _paired_kernel(a_ref, bp_ref, scale_ref, out_ref, *, code_t, blocksize, scale_mode):
    k = pl.program_id(2)
    p = bp_ref[:].astype(jnp.int32)  # [TN/2, TK] packed bytes
    units = _decode_units(p, code_t)  # [TN, TK] bf16 unit code values
    TK = p.shape[1]
    nb = TK // blocksize
    dims = (((1,), (1,)), ((), ()))

    if scale_mode == "subdot":
        acc = _subdot_accum(a_ref[:], units, scale_ref[:], blocksize)
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


# -- forward, nested absmax decoded in-kernel --------------------------------


def _paired_kernel_dq(
    a_ref, bp_ref, u8_ref, s2a_ref, s2b_ref, sw_ref, off_ref, out_ref, sc_ref,
    *, code_t, blocksize,
):
    # Decode the WHOLE [TKb, TN] scale tile in one vector pass (27 ps/elem
    # measured, experiments/probe_dqscale.py), park it in VMEM scratch, and
    # slice rows from the REF per sub-dot — both row-by-row decode ([1, TN]
    # vectors run at 1/8 sublane utilization) and slicing a computed vector
    # (Mosaic relayouts per slice) measured ~4-5x whole-kernel on-chip.
    k = pl.program_id(2)
    p = bp_ref[:].astype(jnp.int32)
    units = _decode_units(p, code_t)
    sc_ref[:] = _decode_scale_tile(
        u8_ref[:].astype(jnp.int32),
        s2a_ref[0:1, :], s2b_ref[0:1, :], sw_ref[0:1, :], off_ref[:],
    )
    acc = _subdot_accum(a_ref[:], units, sc_ref, blocksize)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(k > 0)
    def _accum():
        out_ref[:] += acc


def paired_gemm_dq_supported(M: int, N: int, K: int, blocksize: int) -> bool:
    if not paired_gemm_supported(M, N, K, blocksize):
        return False
    TM, TN, TK = _pick_tiles_paired(M, N, K, blocksize)
    # the uint8 scale-code tile needs a sublane-tileable first dim
    return (TK // blocksize) % 8 == 0


@functools.partial(
    jax.jit, static_argnames=("code", "blocksize", "out_dtype", "tiles")
)
def _gemm_4bit_paired_dq_jit(
    A, P, U8T, s2, offset, *, code, blocksize, out_dtype, tiles=None
):
    M, K = A.shape
    N = 2 * P.shape[0]
    TM, TN, TK = tiles if tiles is not None else _pick_tiles_paired(M, N, K, blocksize)

    M_pad = max(TM, 16)
    if M < M_pad:
        A = jnp.pad(A, ((0, M_pad - M), (0, 0)))
        TM = M_pad

    KB = K // blocksize
    TKb = TK // blocksize
    s2a, s2b, sw, off = _nested_scale_planes(s2, offset, N, KB, K // TK, TKb)

    grid = (A.shape[0] // TM, N // TN, K // TK)
    kernel = functools.partial(_paired_kernel_dq, code_t=code, blocksize=blocksize)
    row = lambda m, i, k: (k, i)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TK), lambda m, i, k: (m, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN // 2, TK), lambda m, i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TKb, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda m, i, k: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda m, i, k: (m, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A.shape[0], N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TKb, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * A.shape[0] * N * K,
            bytes_accessed=A.shape[0] * K * 2 + N * K // 2 + KB * N
            + A.shape[0] * N * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(A, P, U8T, s2a, s2b, sw, off)
    return out[:M].astype(out_dtype)


def gemm_4bit_paired_dq(
    A: jax.Array,
    P: jax.Array,
    absmax_u8_t: jax.Array,
    s2: jax.Array,
    offset: jax.Array,
    code,
    blocksize: int,
    shapeB: tuple,
    out_dtype=None,
    tiles=None,
) -> jax.Array:
    """Fused ``A @ dequant(B)^T`` with the double-quantized absmax decoded
    inside the kernel — no pre-pass, no f32 absmax materialization (the
    reference's in-register nested dequant, gemm_4bit_simt.cu:104-117).

    Args:
      absmax_u8_t: ``[K/blocksize, N]`` uint8 dynamic-map codes (transposed
        paired-layout storage; flat-canonical codes are ``u8_t.T.ravel()``).
      s2: second-level f32 scales, one per 256 flat-order first-level blocks.
      offset: scalar f32 mean offset.
    """
    N, K = shapeB
    lead = A.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    out_dtype = out_dtype or A.dtype
    code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:16])
    out = _gemm_4bit_paired_dq_jit(
        A.reshape(M, K),
        P,
        absmax_u8_t,
        s2,
        offset,
        code=code_t,
        blocksize=blocksize,
        out_dtype=out_dtype,
        tiles=tiles,
    )
    return out.reshape(*lead, N)


# ---------------------------------------------------------------------------
# transposed orientation: out[M, K] = G[M, N] @ dequant(B)[N, K]
# (the 4-bit matmul backward, reference autograd/_functions.py:381-384) —
# same decode, contraction over the bf16 rows instead of the columns.
# ---------------------------------------------------------------------------


def _nt_accum(g, units, scale, blocksize: int):
    """scale[b, n] folds into G per k-block: out[:, b] = (g * scale_b) @ units."""
    nb = units.shape[1] // blocksize
    parts = []
    for b in range(nb):
        gs = (g * scale[b : b + 1, :]).astype(
            jnp.bfloat16 if g.dtype != jnp.float32 else jnp.float32
        )
        sub = _dot_f32acc(
            gs, units[:, b * blocksize : (b + 1) * blocksize], (((1,), (0,)), ((), ()))
        )
        parts.append(sub)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _paired_nt_kernel(g_ref, bp_ref, scale_ref, out_ref, *, code_t, blocksize):
    n = pl.program_id(2)
    p = bp_ref[:].astype(jnp.int32)
    units = _decode_units(p, code_t)  # [TN, TK]
    acc = _nt_accum(g_ref[:], units, scale_ref[:], blocksize)

    @pl.when(n == 0)
    def _init():
        out_ref[:] = acc

    @pl.when(n > 0)
    def _accum():
        out_ref[:] += acc


def _paired_nt_kernel_dq(
    g_ref, bp_ref, u8_ref, s2a_ref, s2b_ref, sw_ref, off_ref, out_ref, sc_ref,
    *, code_t, blocksize,
):
    n = pl.program_id(2)
    p = bp_ref[:].astype(jnp.int32)
    units = _decode_units(p, code_t)
    sc_ref[:] = _decode_scale_tile(
        u8_ref[:].astype(jnp.int32),
        s2a_ref[0:1, :], s2b_ref[0:1, :], sw_ref[0:1, :], off_ref[:],
    )
    acc = _nt_accum(g_ref[:], units, sc_ref, blocksize)

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


@functools.partial(jax.jit, static_argnames=("code", "blocksize", "out_dtype"))
def _gemm_4bit_paired_nt_dq_jit(G, P, U8T, s2, offset, *, code, blocksize, out_dtype):
    M, N = G.shape
    K = P.shape[1]
    TM, TN, TK = _pick_tiles_paired(M, N, K, blocksize)

    M_pad = max(TM, 16)
    if M < M_pad:
        G = jnp.pad(G, ((0, M_pad - M), (0, 0)))
        TM = M_pad

    KB = K // blocksize
    TKb = TK // blocksize
    s2a, s2b, sw, off = _nested_scale_planes(s2, offset, N, KB, K // TK, TKb)

    grid = (G.shape[0] // TM, K // TK, N // TN)
    kernel = functools.partial(_paired_nt_kernel_dq, code_t=code, blocksize=blocksize)
    row = lambda m, k, n: (k, n)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, TN), lambda m, k, n: (m, n), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN // 2, TK), lambda m, k, n: (n, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TKb, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda m, k, n: (0, n), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TK), lambda m, k, n: (m, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G.shape[0], K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TKb, TN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(G, P, U8T, s2a, s2b, sw, off)
    return out[:M].astype(out_dtype)


def gemm_4bit_paired_nt_dq(
    G, P, absmax_u8_t, s2, offset, code, blocksize: int, shapeB, out_dtype=None
) -> jax.Array:
    """Fused ``G @ dequant(B)`` (contract over N) with in-kernel nested
    absmax decode — see :func:`gemm_4bit_paired_dq`."""
    N, K = shapeB
    lead = G.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    out_dtype = out_dtype or G.dtype
    code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:16])
    out = _gemm_4bit_paired_nt_dq_jit(
        G.reshape(M, N), P, absmax_u8_t, s2, offset,
        code=code_t, blocksize=blocksize, out_dtype=out_dtype,
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


def _paired_dequant_kernel_dq(
    bp_ref, u8_ref, s2a_ref, s2b_ref, sw_ref, off_ref, out_ref, *, code_t, blocksize
):
    p = bp_ref[:].astype(jnp.int32)
    units = _decode_units(p, code_t)  # [TN, TK]
    TK = p.shape[1]
    nb = TK // blocksize
    scale = _decode_scale_tile(
        u8_ref[:].astype(jnp.int32),
        s2a_ref[0:1, :], s2b_ref[0:1, :], sw_ref[0:1, :], off_ref[:],
    )  # [TKb, TN]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, TK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, TK), 1) // blocksize
    E = (rows == cols).astype(jnp.float32)
    sc = jax.lax.dot_general(
        scale, E, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # [TN, TK]
    out_ref[:] = (units.astype(jnp.float32) * sc).astype(out_ref.dtype)


def paired_dequant_dq_supported(N: int, K: int, blocksize: int) -> bool:
    if not paired_dequant_supported(N, K, blocksize):
        return False
    TN, TK = _dequant_tiles_paired(N, K, blocksize)
    return (TK // blocksize) % 8 == 0


@functools.partial(jax.jit, static_argnames=("code", "blocksize", "dtype"))
def dequantize_paired_fast_dq(P, absmax_u8_t, s2, offset, *, code, blocksize, dtype=jnp.bfloat16):
    """:func:`dequantize_paired_fast` with in-kernel nested absmax decode
    (same scale semantics as :func:`gemm_4bit_paired_dq`)."""
    N2, K = P.shape
    N = 2 * N2
    code_t = tuple(float(x) for x in np.asarray(code).reshape(-1)[:16])
    TN, TK = _dequant_tiles_paired(N, K, blocksize)
    KB = K // blocksize
    TKb = TK // blocksize
    s2a, s2b, sw, off = _nested_scale_planes(s2, offset, N, KB, K // TK, TKb)
    row = lambda i, k: (k, i)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_paired_dequant_kernel_dq, code_t=code_t, blocksize=blocksize),
        grid=(N // TN, K // TK),
        in_specs=[
            pl.BlockSpec((TN // 2, TK), lambda i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((TKb, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, TK), lambda i, k: (i, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, K), jnp.dtype(dtype)),
        interpret=_interpret(),
    )(P, absmax_u8_t, s2a, s2b, sw, off)


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
