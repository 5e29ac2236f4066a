"""LLM.int8() functional ops (TPU-native).

Re-implementation of the reference int8 op family (bitsandbytes/_ops.py:
10-260; functional.py:1536-1673; oracle semantics from
backends/default/ops.py:38-177) designed for XLA:

* ``int8_linear_matmul`` lowers to `lax.dot_general` on int8 operands with
  int32 accumulation — the TPU MXU runs this natively, replacing the
  reference's cuBLASLt `igemmlt` (csrc/ops.cu:282-404).
* The dequant epilogue is plain elementwise jnp that XLA fuses into the
  matmul output (replacing csrc/kernels.cu:1396-1448).
* Outlier decomposition is jit-safe: instead of dynamically-sized outlier
  column *indices* (reference `new_dynamic_size()`, _ops.py:30), we carry a
  static-shape boolean column mask and compute the fp outlier contribution
  with a masked matmul.  Numerics match the reference's semantics
  (|x| >= threshold columns excluded from the int8 path and computed in the
  activation dtype, backends/default/ops.py:64-100).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "int8_vectorwise_quant",
    "int8_vectorwise_dequant",
    "int8_double_quant",
    "int8_linear_matmul",
    "int8_mm_dequant",
    "int8_scaled_mm",
    "int8_mixed_scaled_mm",
]

# Exact 1/127 and 1/(127*127); SURVEY.md §8.7 — the reference carries two
# slightly different constants (_ops.py:121 vs default/ops.py:57); we use the
# exact values everywhere.
_INV_127 = 1.0 / 127.0
_INV_127_SQ = 1.0 / (127.0 * 127.0)


@partial(jax.jit, static_argnames=("threshold",))
def int8_vectorwise_quant(
    A: jax.Array, threshold: float = 0.0
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Symmetric row-wise int8 quantization.

    Returns ``(quantized int8 [..., K], row_stats float32 [...], outlier_cols
    mask bool [K] or None)``.

    With ``threshold > 0``, elements with |x| >= threshold are excluded from
    the row absmax and their *columns* are zeroed in the int8 output
    (reference kernels.cu:1331-1392, backends/cuda/ops.py:250-252).  The
    outlier columns are reported as a boolean mask over the last axis (static
    shape; TPU-native replacement for the reference's dynamic index list).
    """
    A_f = A.astype(jnp.float32)
    if threshold > 0.0:
        outliers = jnp.abs(A_f) >= threshold
        inlier_vals = jnp.where(outliers, 0.0, A_f)
        row_stats = jnp.max(jnp.abs(inlier_vals), axis=-1)
        outlier_cols = jnp.any(outliers.reshape(-1, A.shape[-1]), axis=0)
        quant = jnp.round(inlier_vals * (127.0 / jnp.clip(row_stats[..., None], 1e-38, None)))
        quant = jnp.clip(quant, -127, 127).astype(jnp.int8)
        # Zero every outlier column across all rows (matches reference when
        # rows > 1; for a single row this equals zeroing the outliers).
        quant = jnp.where(outlier_cols[None, :], 0, quant.reshape(-1, A.shape[-1])).reshape(A.shape)
        return quant, row_stats, outlier_cols
    row_stats = jnp.max(jnp.abs(A_f), axis=-1)
    quant = jnp.round(A_f * (127.0 / jnp.clip(row_stats[..., None], 1e-38, None)))
    quant = jnp.clip(quant, -127, 127).astype(jnp.int8)
    return quant, row_stats, None


@jax.jit
def int8_vectorwise_dequant(A: jax.Array, stats: jax.Array) -> jax.Array:
    """Dequantize int8 with row stats: ``A * stats/127`` (reference
    functional.py:1641-1652)."""
    return A.astype(jnp.float32) * stats[..., None] * _INV_127


@partial(jax.jit, static_argnames=("threshold",))
def int8_double_quant(
    A: jax.Array, threshold: float = 0.0
):
    """Row-wise AND column-wise int8 quantization (for the int8 training
    backward path; reference functional.py:1590-1638).

    Returns ``(out_row int8, out_col int8, row_stats, col_stats,
    outlier_mask)``.
    """
    out_row, row_stats, outlier_mask = int8_vectorwise_quant(A, threshold=threshold)
    A_f = A.astype(jnp.float32)
    if threshold > 0.0:
        A_f = jnp.where(jnp.abs(A_f) >= threshold, 0.0, A_f)
    A2d = A_f.reshape(-1, A.shape[-1])
    col_stats = jnp.max(jnp.abs(A2d), axis=0)
    out_col = jnp.round(A2d * (127.0 / jnp.clip(col_stats[None, :], 1e-38, None)))
    out_col = jnp.clip(out_col, -127, 127).astype(jnp.int8).reshape(A.shape)
    return out_row, out_col, row_stats, col_stats, outlier_mask


@jax.jit
def int8_linear_matmul(A: jax.Array, B: jax.Array) -> jax.Array:
    """int8 x int8 -> int32 matmul: ``A [..., K] @ B [N, K]^T -> [..., N]``.

    XLA lowers this directly onto the MXU's int8 path — the TPU-native
    equivalent of cuBLASLt igemmlt (reference csrc/ops.cu:282-404).
    """
    return jax.lax.dot_general(
        A,
        B,
        dimension_numbers=(((A.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@partial(jax.jit, static_argnames=("dtype",))
def int8_mm_dequant(
    A: jax.Array,
    row_stats: jax.Array,
    col_stats: jax.Array,
    dtype=jnp.float16,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Dequantize an int32 matmul result:
    ``out = A * row_stats[:,None] * col_stats[None,:] / 127^2 (+ bias)``
    (reference csrc/kernels.cu:1396-1448)."""
    out = A.astype(jnp.float32) * (row_stats[..., None] * col_stats) * _INV_127_SQ
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def int8_scaled_mm(
    A: jax.Array,
    B: jax.Array,
    row_stats: jax.Array,
    col_stats: jax.Array,
    bias: Optional[jax.Array] = None,
    dtype=jnp.float16,
) -> jax.Array:
    """int8 matmul + dequant epilogue (reference _ops.py:124-142).  XLA fuses
    the epilogue into the matmul output, so this is a single MXU pass."""
    out32 = int8_linear_matmul(A, B)
    return int8_mm_dequant(out32, row_stats, col_stats, dtype=dtype, bias=bias)



def int8_mixed_scaled_mm(
    A_quant: jax.Array,
    A_full: jax.Array,
    B: jax.Array,
    row_stats: jax.Array,
    col_stats: jax.Array,
    outlier_cols: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    dtype=jnp.float16,
) -> jax.Array:
    """LLM.int8() mixed-precision matmul with outlier decomposition.

    ``out = int8_scaled_mm(A_quant, B) + A_full[:, outliers] @ dequant(B)[outliers, :]``

    jit-safe formulation of reference _ops.py:89-121 / default/ops.py:64-100:
    ``outlier_cols`` is a boolean mask [K]; the fp16 outlier contribution is a
    masked full-width matmul (the int8 path saw zeros in those columns, so
    the sum is exact).
    """
    out = int8_scaled_mm(A_quant, B, row_stats, col_stats, bias=bias, dtype=dtype)
    if outlier_cols is not None:
        # B columns (along K) scaled back to fp: B is int8 [N, K] with
        # row-wise col_stats [N]; dequant = B * col_stats[:, None]/127.
        mask = outlier_cols.astype(jnp.float32)
        B_dq = B.astype(jnp.float32) * (col_stats[:, None] * _INV_127) * mask[None, :]
        A_masked = A_full.astype(jnp.float32) * mask
        corr = jnp.dot(
            A_masked.astype(dtype),
            B_dq.astype(dtype).T,
            preferred_element_type=jnp.float32,
        )
        out = (out.astype(jnp.float32) + corr).astype(dtype)
    return out
