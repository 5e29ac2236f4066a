"""Autodiff layer: custom-VJP quantized matmuls.

TPU-native analog of the reference autograd functions
(bitsandbytes/autograd/_functions.py):

* :func:`matmul_4bit` — MatMul4Bit (reference :300-386): forward is the fused
  dequant+matmul; backward is ``grad_A = g @ dequant(B)`` with **no weight
  gradient** (the 4-bit weight is frozen; QLoRA trains adapters).
* :func:`matmul` — MatMul8bitLt (reference :101-242): LLM.int8() forward with
  outlier decomposition; backward dequantizes the int8 weight for ``grad_A``
  and (when the weight is trainable fp16) computes ``grad_B`` from the
  straight-through estimator.

Being JAX, there is no Function/ctx machinery: module-level
``jax.custom_vjp`` pairs taking the quantized state as explicit pytree
arguments (closing over it would leak tracers when the state itself is
produced inside an outer differentiated computation) and returning zero
cotangents for every weight leaf.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .functional.fourbit import dequantize_4bit
from .functional.gemm import gemm_4bit, gemm_4bit_grad_A
from .functional.int8 import (
    int8_linear_matmul,
    int8_mixed_scaled_mm,
    int8_mm_dequant,
    int8_scaled_mm,
    int8_vectorwise_quant,
)
from .functional.quant_state import QuantState

__all__ = ["matmul_4bit", "matmul", "MatmulLtState"]


def _zero_cot(x):
    """Zero cotangent for a weight leaf: float0 for integer arrays."""
    if x is None:
        return None
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(np.shape(x), jax.dtypes.float0)


# ---------------------------------------------------------------------------
# 4-bit
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _mm_4bit(A, B_packed, state: QuantState):
    return gemm_4bit(A, B_packed, state)


def _mm_4bit_fwd(A, B_packed, state):
    return _mm_4bit(A, B_packed, state), (B_packed, state)


def _mm_4bit_bwd(res, g):
    B_packed, state = res
    # grad_A = g @ dequant(B)  (reference :381-384), fused on TPU so the
    # dequantized weight never hits HBM.  No weight gradient.
    grad_A = gemm_4bit_grad_A(g, B_packed, state).astype(g.dtype)
    return (
        grad_A,
        _zero_cot(B_packed),
        jax.tree_util.tree_map(_zero_cot, state),
    )


_mm_4bit.defvjp(_mm_4bit_fwd, _mm_4bit_bwd)


def matmul_4bit(
    A: jax.Array,
    B_packed: jax.Array,
    quant_state: QuantState,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """``A @ dequant(B)^T + bias`` with gradients flowing only to ``A`` (and
    ``bias``).  Reference autograd/_functions.py:407-491."""
    out = _mm_4bit(A, B_packed, quant_state)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# LLM.int8()
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MatmulLtState:
    """Int8 weight state for LLM.int8() matmul (reference MatmulLtState,
    autograd/_functions.py:57-98).

    ``CB`` is the int8 weight [N, K]; ``SCB`` its per-row absmax stats [N].
    ``threshold`` enables outlier decomposition; ``has_fp16_weights`` keeps a
    full-precision weight for training.
    """

    CB: Optional[jax.Array] = None
    SCB: Optional[jax.Array] = None
    threshold: float = 0.0
    has_fp16_weights: bool = False
    # static residual budget for outlier columns in the training backward
    # (None -> _outlier_budget(K)); the reference's subA is dynamically sized
    outlier_budget: Optional[int] = None


def _int8_forward(A, CB, SCB, threshold, out_dtype):
    lead = A.shape[:-1]
    A2 = A.reshape(-1, A.shape[-1])
    if threshold > 0.0:
        Aq, row_stats, outlier_cols = int8_vectorwise_quant(A2, threshold=threshold)
        out = int8_mixed_scaled_mm(
            Aq, A2, CB, row_stats, SCB, outlier_cols=outlier_cols, dtype=out_dtype
        )
    else:
        Aq, row_stats, _ = int8_vectorwise_quant(A2)
        out = int8_scaled_mm(Aq, CB, row_stats, SCB, dtype=out_dtype)
    return out.reshape(*lead, CB.shape[0])


def _colwise_quant(x2d):
    """Column-wise symmetric int8 quantization: per-column absmax scales.
    The transposed half of the reference's `int8_double_quant`
    (functional.py:1590-1638) — what the int8 training backward contracts
    with."""
    x_f = x2d.astype(jnp.float32)
    col_stats = jnp.max(jnp.abs(x_f), axis=0)
    q = jnp.round(x_f * (127.0 / jnp.clip(col_stats[None, :], 1e-38, None)))
    return jnp.clip(q, -127, 127).astype(jnp.int8), col_stats


def _outlier_budget(K: int) -> int:
    """Static residual budget for outlier columns: LLM.int8() finds ~0.1% of
    feature dims are outliers at threshold 6.0 (arXiv:2208.07339 §3), so
    K/64 (~1.6%) is a 16x safety margin while keeping the fp residual slice
    ~3% of the int8 residual's bytes."""
    return min(K, max(32, K // 64))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _mm_8bit_train(A, B_fp, threshold, outlier_budget):
    CB, SCB, _ = int8_vectorwise_quant(B_fp)
    return _int8_forward(A, CB, SCB, threshold, A.dtype)


def _mm_8bit_train_fwd(A, B_fp, threshold, outlier_budget):
    """LLM.int8() training forward.

    Residuals follow reference MatMul8bitLt (autograd/_functions.py:135-141,
    186-191): the *column-quantized* int8 activations ``CAt`` + their scales
    are saved for ``grad_B`` — int8 residual memory instead of fp.  With
    outlier decomposition (``threshold > 0``) the reference stores a
    dynamically-sized fp ``subA`` slice; jit-static shapes replace it with a
    FIXED-BUDGET slice: the top-``outlier_budget`` columns by column absmax.
    Every true outlier column has absmax >= threshold while inlier columns
    don't, so the top-k capture is EXACT whenever the outlier count fits the
    budget (the ~16x-margin default, :func:`_outlier_budget`).  Columns
    beyond the budget are left int8-quantized in ``CAt`` instead of zeroed,
    so an overflow degrades those columns' grad_B to int8 precision rather
    than dropping them.  Residual bytes: int8 [M, K] + fp [M, budget] —
    ~(1/2 + budget/K) of an fp16 activation copy, matching the reference's
    int8+subA story.
    """
    CB, SCB, _ = int8_vectorwise_quant(B_fp)
    out = _int8_forward(A, CB, SCB, threshold, A.dtype)
    A2 = A.reshape(-1, A.shape[-1])
    if threshold > 0.0:
        A2f = A2.astype(jnp.float32)
        K = A2.shape[-1]
        colmax = jnp.max(jnp.abs(A2f), axis=0)
        _, idx = jax.lax.top_k(colmax, min(outlier_budget, K))
        captured = colmax[idx] >= threshold  # budget slots holding outliers
        subA = (jnp.take(A2f, idx, axis=1) * captured[None, :]).astype(A2.dtype)
        capture_mask = jnp.zeros((K,), bool).at[idx].set(captured)
        CAt, SCAt = _colwise_quant(jnp.where(capture_mask[None, :], 0.0, A2f))
        res_a = (CAt, SCAt, subA, idx)
    else:
        CAt, SCAt = _colwise_quant(A2)
        res_a = (CAt, SCAt, None, None)
    # zero-size token carries B's dtype so the cotangent matches the primal
    return out, (res_a, CB, SCB, jnp.zeros((0,), B_fp.dtype))


def _mm_8bit_train_bwd(threshold, outlier_budget, res, g):
    """Backward per reference autograd/_functions.py:202-242: ``grad_B`` is
    an int8 matmul of the column-quantized grad with the column-quantized
    activations, plus the fp outlier correction scattered into the captured
    columns (reference: ``grad_B[:, idx] += grad_output.t() @ subA``);
    ``grad_A`` contracts with the dequantized int8 weight."""
    (CAt, SCAt, subA, idx), CB, SCB, b_token = res
    W_dq = CB.astype(jnp.float32) * (SCB[:, None] / 127.0)
    grad_A = jnp.matmul(
        g.astype(jnp.float32), W_dq, preferred_element_type=jnp.float32
    ).astype(g.dtype)

    g2 = g.reshape(-1, g.shape[-1])
    Cgt, SCgt = _colwise_quant(g2)
    # grad_B[n, k] = sum_m g[m, n] A[m, k]: int8 dot of the transposed
    # column-quantized operands, dequantized by SCgt[n] * SCAt[k] / 127^2
    grad_B = int8_scaled_mm(
        Cgt.T, CAt.T, SCgt, SCAt, dtype=jnp.float32
    )
    if threshold > 0.0:
        corr = jnp.matmul(
            g2.T.astype(jnp.float32), subA.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # [N, budget]
        grad_B = grad_B.at[:, idx].add(corr)
    return grad_A, grad_B.astype(b_token.dtype)


_mm_8bit_train.defvjp(_mm_8bit_train_fwd, _mm_8bit_train_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mm_8bit_frozen(A, CB, SCB, threshold):
    return _int8_forward(A, CB, SCB, threshold, A.dtype)


def _mm_8bit_frozen_fwd(A, CB, SCB, threshold):
    return _int8_forward(A, CB, SCB, threshold, A.dtype), (CB, SCB)


def _mm_8bit_frozen_bwd(threshold, res, g):
    CB, SCB = res
    W_dq = CB.astype(jnp.float32) * (SCB[:, None] / 127.0)
    grad_A = jnp.matmul(
        g.astype(jnp.float32), W_dq, preferred_element_type=jnp.float32
    ).astype(g.dtype)
    return grad_A, _zero_cot(CB), _zero_cot(SCB)


_mm_8bit_frozen.defvjp(_mm_8bit_frozen_fwd, _mm_8bit_frozen_bwd)


def matmul(
    A: jax.Array,
    B: Optional[jax.Array],
    state: MatmulLtState,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """LLM.int8() matmul: ``A @ B^T`` with vector-wise int8 quantization and
    fp outlier decomposition (reference MatMul8bitLt,
    autograd/_functions.py:101-242).

    ``B`` is the fp weight [N, K] when ``state.has_fp16_weights`` (training);
    otherwise ``state.CB/SCB`` hold the frozen int8 weight and ``B`` is
    ignored for the forward.
    """
    if state.has_fp16_weights:
        budget = state.outlier_budget
        if budget is None:
            budget = _outlier_budget(A.shape[-1])
        out = _mm_8bit_train(A, B, float(state.threshold), int(budget))
    else:
        out = _mm_8bit_frozen(A, state.CB, state.SCB, float(state.threshold))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
