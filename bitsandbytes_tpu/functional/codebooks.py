"""Quantization codebook construction.

TPU-native re-implementation of the codebook builders from the reference
bitsandbytes library (reference: bitsandbytes/functional.py:150-348 and
:772-859).  All codebooks are plain float32 numpy/jnp arrays; they are tiny
(16 or 256 entries) and are treated as compile-time constants by the kernels.

Codebook semantics (must match the reference bit-for-bit, see SURVEY.md §8):

* ``dynamic`` 8-bit: dynamic exponent + linear fraction (arXiv:1511.04561),
  256 sorted entries in [-1, 1] (reference `create_dynamic_map`,
  functional.py:296).
* ``nf4``: 16 quantiles of N(0, 1) (QLoRA, arXiv:2305.14314), sorted,
  normalized to [-1, 1] (reference `create_normal_map`, functional.py:169,
  hardcoded at functional.py:788-805).
* ``fp4``: 1-2-1 sign/exponent/mantissa float with bias 2, values stored in
  *bit-pattern order* (reference functional.py:806-823).
* ``int4`` / ``af4``: linear / AbnormalFloat research tables
  (reference functional.py:824-849).
* ``fp8``: configurable E/M split (reference `create_fp8_map`,
  functional.py:227).
"""

from __future__ import annotations

import functools
import itertools

import numpy as np

__all__ = [
    "create_dynamic_map",
    "create_linear_map",
    "create_normal_map",
    "create_fp8_map",
    "get_4bit_code",
    "CODE_DTYPE",
]

CODE_DTYPE = np.float32

# The 16 NF4 quantization levels: equal-probability-mass quantiles of the
# standard normal distribution, normalized to [-1, 1].  These exact constants
# are the public NF4 definition from the QLoRA paper (arXiv:2305.14314) and
# must match the reference tables (bitsandbytes/functional.py:788-805,
# csrc/kernels.cu:26-43) for checkpoint interop.
_NF4_TABLE = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=CODE_DTYPE,
)

# FP4 magnitude values in bit-pattern order (3 non-sign bits).  With exponent
# bias 2: 0b000=0 (zero), 0b001=0.0625 (subnormal), then normals
# (1 + m/2) * 2^(e-1) for e in 1..3.  Stored un-normalized; get_4bit_code
# divides by the absolute max (12) as the reference does
# (functional.py:821,858).
_FP4_TABLE = np.array(
    [0.0, 0.0625, 8.0, 12.0, 4.0, 6.0, 2.0, 3.0, -0.0, -0.0625, -8.0, -12.0, -4.0, -6.0, -2.0, -3.0],
    dtype=CODE_DTYPE,
)

_INT4_TABLE = np.array(
    [7, 6, 5, 4, 3, 2, 1, 0, -0.0, -1, -2, -3, -4, -5, -6, -7], dtype=CODE_DTYPE
)

# AF4 (AbnormalFloat, arXiv:2306.06965), blocksize-64 table, stored reversed
# like the reference (functional.py:832-855).
_AF4_TABLE = np.array(
    [
        -1.0,
        -0.69441008,
        -0.51243739,
        -0.3736951,
        -0.25607552,
        -0.14982478,
        -0.04934812,
        0.0,
        0.04273164,
        0.12934483,
        0.21961274,
        0.31675666,
        0.42563882,
        0.55496234,
        0.72424863,
        1.0,
    ],
    dtype=CODE_DTYPE,
)[::-1]


def create_linear_map(signed: bool = True, total_bits: int = 8, add_zero: bool = True) -> np.ndarray:
    """Evenly spaced quantization levels in [-1, 1] (or [0, 1] unsigned).

    Mirrors reference `create_linear_map` (functional.py:150-166): for signed
    maps one slot is sacrificed so that zero is exactly representable, and
    sub-8-bit maps are zero-padded in the middle up to 256 entries.
    """
    lo = -1.0 if signed else 0.0
    n = 2**total_bits
    if add_zero or total_bits < 8:
        n = n - 1 if signed else n
    values = np.linspace(lo, 1.0, n, dtype=np.float64)
    gap = 256 - values.size
    if gap == 0:
        return values.astype(CODE_DTYPE)
    half = values.size // 2
    out = np.concatenate([values[:half], np.zeros(gap), values[half:]])
    return out.astype(CODE_DTYPE)


def create_normal_map(offset: float = 0.9677083, use_extra_value: bool = True) -> np.ndarray:
    """NF4 codebook: normal-distribution quantiles normalized to [-1, 1].

    Mirrors reference `create_normal_map` (functional.py:169-224).  Returns a
    256-entry sorted table whose first 16 entries are the NF4 levels; the rest
    are zero padding for uint8 indexing convenience.
    """
    from scipy.stats import norm

    if use_extra_value:
        # Asymmetric: 8 negative, 9 non-negative (incl. 0) => 15 non-zero.
        v1 = norm.ppf(np.linspace(offset, 0.5, 9)[:-1]).tolist()
        v2 = [0.0] * (256 - 15)
        v3 = (-norm.ppf(np.linspace(offset, 0.5, 8)[:-1])).tolist()
    else:
        v1 = norm.ppf(np.linspace(offset, 0.5, 8)[:-1]).tolist()
        v2 = [0.0] * (256 - 14)
        v3 = (-norm.ppf(np.linspace(offset, 0.5, 8)[:-1])).tolist()
    values = np.sort(np.asarray(v1 + v2 + v3, dtype=np.float64))
    values /= values.max()
    return values.astype(CODE_DTYPE)


def create_fp8_map(
    signed: bool = True, exponent_bits: int = 5, precision_bits: int = 2, total_bits: int = 8
) -> np.ndarray:
    """Sorted levels of a small float format, normalized to [-1, 1].

    Mirrors reference `create_fp8_map` (functional.py:227-293): exponent bias
    2^(e-1), subnormals at exponent field 0, zero-padded up to 256 entries for
    sub-8-bit widths.
    """
    e, p = exponent_bits, precision_bits
    has_sign = 1 if signed else 0
    assert e + p == total_bits - has_sign
    bias = 2 ** (e - 1)
    values = []
    for evalue in range(2**e):
        for bits in itertools.product([0, 1], repeat=p):
            mant = 1.0 if evalue != 0 else 0.0
            for i, b in enumerate(bits):
                mant += b * 2.0 ** -(i + 1)
            if evalue == 0:
                val = mant * 2.0**-bias  # subnormal
            else:
                val = mant * 2.0 ** -(evalue - bias - 1)
            values.append(val)
            if signed:
                values.append(-val)
    assert len(values) == 2**total_bits
    values.sort()
    values.extend([0.0] * (256 - len(values)))
    values.sort()  # python stable sort preserves -0.0/0.0 order (reference)
    code = np.asarray(values, dtype=np.float64)
    code /= code.max()
    return code.astype(CODE_DTYPE)


def _linspace_f32(start: float, stop: float, num: int) -> np.ndarray:
    """torch.linspace-compatible float32 linspace when torch is available.

    The reference builds its dynamic map with torch.linspace, whose
    vectorized CPU kernel mixes f64 chunk bases with f32 lane offsets —
    1-ulp different from numpy's linspace on ~9% of entries.  Bit-exact
    codebooks matter (they decide quantization codes), so use torch when
    present and fall back to the f64-then-cast construction otherwise."""
    try:
        import torch

        return torch.linspace(start, stop, num, dtype=torch.float32).numpy()
    except ImportError:
        return np.linspace(start, stop, num).astype(np.float32)


@functools.lru_cache(maxsize=None)
def create_dynamic_map(signed: bool = True, max_exponent_bits: int = 7, total_bits: int = 8) -> np.ndarray:
    """Dynamic-exponent 8-bit codebook (arXiv:1511.04561).

    The format spends a unary prefix on a base-10 exponent and the remaining
    bits on a linear fraction; see reference `create_dynamic_map`
    (functional.py:296-348).  Returns 256 sorted float32 entries incl. 0 and
    ±1 — bit-identical to the reference's construction.
    """
    data: list[float] = []
    non_sign_bits = total_bits - 1
    additional_items = 2 ** (non_sign_bits - max_exponent_bits) - 1
    for i in range(max_exponent_bits):
        fraction_items = int(
            2 ** (i + non_sign_bits - max_exponent_bits) + 1
            if signed
            else 2 ** (i + non_sign_bits - max_exponent_bits + 1) + 1
        )
        boundaries = _linspace_f32(0.1, 1, fraction_items)
        means = ((boundaries[:-1] + boundaries[1:]) / 2.0).astype(np.float32)
        # torch downcasts the python scalar to the tensor dtype: f32 multiply
        scale = np.float32(10.0 ** (-(max_exponent_bits - 1) + i))
        data += (scale * means).tolist()
        if signed:
            data += (-scale * means).tolist()
    if additional_items > 0:
        boundaries = _linspace_f32(0.1, 1, additional_items + 1)
        means = ((boundaries[:-1] + boundaries[1:]) / 2.0).astype(np.float32)
        scale = np.float32(10.0 ** (-(max_exponent_bits - 1) + max_exponent_bits - 1))
        data += (scale * means).tolist()
        if signed:
            data += (-scale * means).tolist()
    data.append(0.0)
    data.append(1.0)
    assert len(data) == 2**total_bits
    data.extend([0.0] * (256 - len(data)))
    data.sort()  # python stable sort, as the reference (functional.py:347)
    return np.asarray(data, dtype=CODE_DTYPE)


@functools.lru_cache(maxsize=None)
def get_4bit_code(quant_type: str, blocksize: int = 64) -> np.ndarray:
    """Return the 16-entry 4-bit codebook for `quant_type`, normalized so that
    max |value| == 1 (reference `get_4bit_type`, functional.py:772-859).

    NF4 is in sorted order (index == rank); FP4/int4 are in *bit-pattern*
    order (index == the 4-bit encoding), matching the reference layout.
    """
    if quant_type == "nf4":
        data = _NF4_TABLE
    elif quant_type == "fp4":
        data = _FP4_TABLE
    elif quant_type == "int4":
        data = _INT4_TABLE
    elif quant_type == "af4":
        if blocksize != 64:
            raise NotImplementedError("af4 only supports blocksize 64")
        data = _AF4_TABLE
    else:
        raise NotImplementedError(f"4-bit quant type {quant_type!r} not supported")
    data = data / np.abs(data).max()
    return data.astype(CODE_DTYPE)
