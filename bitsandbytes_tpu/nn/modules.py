"""Flax linen modules with quantized weights.

TPU-native analog of bitsandbytes/nn/modules.py:

* :class:`Linear4bit` (+ NF4/FP4 aliases) — reference nn/modules.py:504-716.
  The packed weight + QuantState live inside the params tree as a
  :class:`QuantizedTensor` pytree.  Unlike the reference (which quantizes
  lazily on ``.to(device)``), quantization happens at init / weight load —
  the JAX-natural point.  The packed payload is uint8, so JAX assigns it
  float0 tangents and no gradient ever flows into it; absmax is protected by
  the custom-VJP in :mod:`bitsandbytes_tpu.autograd`.
* :class:`Linear8bitLt` — reference nn/modules.py:1018-1194; weight stored as
  int8 CB + float32 SCB row stats.
* :class:`Embedding4bit` / :class:`Embedding8bit` — reference
  nn/modules.py:833-1015: embedding lookup with *partial dequantization*
  (gather packed rows + their absmax, dequantize only the gathered rows).
* :class:`StableEmbedding` — reference nn/modules.py:28-131: xavier init +
  LayerNorm, with 32-bit optimizer-state override metadata.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import autograd
from ..functional.fourbit import dequantize_4bit, quantize_4bit
from ..functional.int8 import int8_vectorwise_quant
from ..functional.quant_state import QuantState

__all__ = [
    "QuantizedTensor",
    "Int8TensorState",
    "Linear4bit",
    "LinearFP4",
    "LinearNF4",
    "Linear8bitLt",
    "Embedding4bit",
    "EmbeddingFP4",
    "EmbeddingNF4",
    "Embedding8bit",
    "Embedding",
    "StableEmbedding",
    "OutlierAwareLinear",
]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """A packed 4-bit tensor + its QuantState, as a single pytree leaf-group.

    The JAX analog of the reference's `Params4bit` tensor subclass
    (nn/modules.py:217-501): it flows through jit/pjit/shard_map/optax like
    any array pytree and carries its quantization metadata along.
    """

    data: jax.Array  # packed payload
    state: QuantState

    def tree_flatten(self):
        return (self.data, self.state), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def quantize(
        cls,
        W: jax.Array,
        blocksize: int = 64,
        quant_type: str = "nf4",
        compress_statistics: bool = False,
        quant_storage=jnp.uint8,
        layout: str = "auto",
    ) -> "QuantizedTensor":
        # layout="auto": prefer the N-paired decode layout (fastest fused
        # dequant+matmul kernel, ops/pallas/gemm4bit_paired.py), then the
        # TPU-native 2-D payload layout; the flat [(n)//2, 1] interop shape
        # costs a relayout copy per kernel call (2x on decode).
        if layout == "auto":
            if (
                W.ndim == 2
                and W.shape[-1] % blocksize == 0
                and W.shape[0] % 2 == 0
                and jnp.dtype(quant_storage) == jnp.dtype(jnp.uint8)
            ):
                layout = "paired"
            elif W.ndim == 2 and W.shape[-1] % blocksize == 0 and W.shape[-1] % 2 == 0:
                layout = "2d"
            else:
                layout = "flat"
        packed, state = quantize_4bit(
            W,
            blocksize=blocksize,
            quant_type=quant_type,
            compress_statistics=compress_statistics,
            quant_storage=quant_storage,
            layout=layout,
        )
        return cls(data=packed, state=state)

    def dequantize(self) -> jax.Array:
        return dequantize_4bit(self.data, quant_state=self.state)

    def resolve_nested(self) -> "QuantizedTensor":
        """Materialize a double-quantized (compress_statistics) state's
        absmax to float32 once, so matmuls stop paying a per-call nested
        dequant (QuantState.resolve_nested — DQ runtime throughput becomes
        identical to plain NF4 at +1/32 weight bytes).  No-op when not
        nested."""
        if not self.state.nested:
            return self
        return QuantizedTensor(data=self.data, state=self.state.resolve_nested())

    def to_layout(self, layout: str) -> "QuantizedTensor":
        """Relayout the packed payload between ``flat``/``2d`` (reference-
        interop K-adjacent byte order) and ``paired`` (the TPU decode-kernel
        order, ops/pallas/gemm4bit_paired.py).  Byte-exact round trip; the
        absmax (f32 values or uint8 nested codes) transposes with the
        payload."""
        cur = self.state.layout
        if cur == layout:
            return self
        state = self.state
        N, K = (int(s) for s in state.shape)
        data = self.data
        if data.dtype != jnp.uint8:
            data = jax.lax.bitcast_convert_type(data.reshape(-1), jnp.uint8)
        bs = state.blocksize
        if layout == "paired" or cur == "paired":
            from ..ops.pallas.gemm4bit_paired import (
                repack_2d_to_npaired,
                repack_npaired_to_2d,
            )
        if layout == "paired":
            if N % 2 or K % bs:
                raise ValueError(f"paired layout needs even N and K % {bs} == 0")
            new_data = repack_2d_to_npaired(data.reshape(N, K // 2), (N, K))
            # f32 values and uint8 nested codes alike store transposed
            new_absmax = state.absmax.reshape(N, K // bs).T
        elif cur == "paired":
            new_data = repack_npaired_to_2d(data.reshape(N // 2, K))
            if layout == "flat":
                new_data = new_data.reshape(-1, 1)
            new_absmax = state.absmax.T.reshape(-1)
        else:  # flat <-> 2d: same bytes, free reshape
            new_data = data.reshape(N, K // 2) if layout == "2d" else data.reshape(-1, 1)
            new_absmax = state.absmax
        new_state = dataclasses.replace(state, absmax=new_absmax, layout=layout)
        return QuantizedTensor(data=new_data, state=new_state)

    @property
    def shape(self):
        return self.state.shape

    @property
    def dtype(self):
        return self.state.dtype


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Int8TensorState:
    """int8 weight (CB) + per-row absmax stats (SCB) — the reference's
    `Int8Params` (nn/modules.py:719-809)."""

    CB: jax.Array
    SCB: jax.Array

    def tree_flatten(self):
        return (self.CB, self.SCB), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def quantize(cls, W: jax.Array) -> "Int8TensorState":
        CB, SCB, _ = int8_vectorwise_quant(W)
        return cls(CB=CB, SCB=SCB)

    def dequantize(self) -> jax.Array:
        return self.CB.astype(jnp.float32) * (self.SCB[:, None] / 127.0)

    @property
    def shape(self):
        return self.CB.shape


class Linear4bit(nn.Module):
    """Linear layer over a frozen 4-bit blockwise-quantized weight.

    ``features``: output dim N.  Weight is [N, K] quantized along K.
    Reference: nn/modules.py:504-637.
    """

    features: int
    use_bias: bool = True
    compute_dtype: Any = jnp.bfloat16
    quant_type: str = "nf4"
    blocksize: int = 64
    compress_statistics: bool = False
    quant_storage: Any = jnp.uint8
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        K = x.shape[-1]

        def init_fn(key):
            W = self.kernel_init(key, (self.features, K), jnp.float32)
            return QuantizedTensor.quantize(
                W,
                blocksize=self.blocksize,
                quant_type=self.quant_type,
                compress_statistics=self.compress_statistics,
                quant_storage=self.quant_storage,
            )

        qweight = self.param("kernel", init_fn)
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.compute_dtype)
            if self.use_bias
            else None
        )
        x = x.astype(self.compute_dtype)
        return autograd.matmul_4bit(x, qweight.data, qweight.state, bias=bias)


class LinearNF4(Linear4bit):
    """Reference nn/modules.py:676-716."""

    quant_type: str = "nf4"


class LinearFP4(Linear4bit):
    """Reference nn/modules.py:640-673."""

    quant_type: str = "fp4"


class Linear8bitLt(nn.Module):
    """LLM.int8() linear layer (reference nn/modules.py:1018-1194).

    With ``has_fp16_weights=True`` the fp weight is kept and trained
    (int8 quantization happens on the fly); otherwise the weight is frozen
    int8 (CB/SCB).
    """

    features: int
    use_bias: bool = True
    has_fp16_weights: bool = False
    threshold: float = 0.0
    compute_dtype: Any = jnp.bfloat16
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        K = x.shape[-1]
        x = x.astype(self.compute_dtype)
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.compute_dtype)
            if self.use_bias
            else None
        )
        if self.has_fp16_weights:
            W = self.param("kernel", self.kernel_init, (self.features, K), self.compute_dtype)
            state = autograd.MatmulLtState(threshold=self.threshold, has_fp16_weights=True)
            return autograd.matmul(x, W, state, bias=bias)

        def init_fn(key):
            W = self.kernel_init(key, (self.features, K), jnp.float32)
            return Int8TensorState.quantize(W)

        qweight = self.param("kernel", init_fn)
        state = autograd.MatmulLtState(
            CB=qweight.CB,
            SCB=qweight.SCB,
            threshold=self.threshold,
            has_fp16_weights=False,
        )
        return autograd.matmul(x, None, state, bias=bias)


def _partial_dequant_rows(qweight: QuantizedTensor, ids: jax.Array) -> jax.Array:
    """Gather embedding rows from a packed 4-bit table and dequantize only
    those rows (reference Embedding4bit forward, nn/modules.py:930-961).

    Requires the embedding dim to be a multiple of 2 and the row length to be
    a multiple of the blocksize (so rows own whole quant blocks).
    """
    if qweight.state.layout == "paired":
        # paired bytes mix adjacent rows — relayout to row-major byte order
        # (embedding tables should be quantized with layout="2d" to avoid
        # paying this per lookup)
        qweight = qweight.to_layout("2d")
    state = qweight.state
    V, D = state.shape
    bs = state.blocksize
    if D % 2 or (D % bs and (V * D) % bs):
        # rows straddle pack/block boundaries: dequantize everything
        return jnp.take(qweight.dequantize(), ids, axis=0)
    packed = qweight.data.reshape(V, D // 2)
    rows = jnp.take(packed, ids.reshape(-1), axis=0)
    absmax = state.dequant_absmax().reshape(V, D // bs) if D % bs == 0 else None
    if absmax is None:
        return jnp.take(qweight.dequantize(), ids, axis=0)
    absmax_rows = jnp.take(absmax, ids.reshape(-1), axis=0)
    out = dequantize_4bit(
        rows.reshape(-1, 1),
        absmax=absmax_rows.reshape(-1),
        blocksize=bs,
        quant_type=state.quant_type,
        shape=(rows.shape[0], D),
        dtype=state.dtype,
    )
    return out.reshape(*ids.shape, D)


def _apply_lookup_opts(out, ids, padding_idx, max_norm, norm_type):
    """Lookup-side ``padding_idx`` / ``max_norm`` semantics shared by the
    embedding modules (reference nn/modules.py:58-62 constructor surface).

    torch's ``max_norm`` renormalizes the *stored* row in place whenever it
    is looked up; under JAX's functional parameters the renorm is applied to
    the gathered rows instead — forward values match torch's post-renorm
    lookup, while the table itself stays unmutated."""
    if padding_idx is not None:
        pad = (ids.reshape(-1) == padding_idx)[:, None]
        out = jnp.where(pad, 0.0, out)
    if max_norm is not None:
        norms = jnp.linalg.norm(out.astype(jnp.float32), ord=norm_type, axis=-1, keepdims=True)
        out = out * jnp.minimum(1.0, max_norm / jnp.maximum(norms, 1e-30)).astype(out.dtype)
    return out


class Embedding4bit(nn.Module):
    """Embedding with a 4-bit quantized table and partial-dequantize lookup
    (reference nn/modules.py:833-1015).  ``padding_idx``/``max_norm`` follow
    the torch ``nn.Embedding`` surface the reference class inherits."""

    num_embeddings: int
    features: int
    quant_type: str = "nf4"
    blocksize: int = 64
    dtype: Any = jnp.float32
    padding_idx: Optional[int] = None
    max_norm: Optional[float] = None
    norm_type: float = 2.0
    embedding_init: Callable = nn.initializers.normal(stddev=1.0)

    @nn.compact
    def __call__(self, ids):
        def init_fn(key):
            W = self.embedding_init(key, (self.num_embeddings, self.features), jnp.float32)
            # embeddings gather rows (not matmul): the row-major 2d byte
            # layout keeps partial dequantization a contiguous row slice
            layout = (
                "2d"
                if self.features % self.blocksize == 0 and self.features % 2 == 0
                else "flat"
            )
            return QuantizedTensor.quantize(
                W, blocksize=self.blocksize, quant_type=self.quant_type, layout=layout
            )

        qtable = self.param("embedding", init_fn)
        # quantized tables are frozen (reference Embedding4bit has no weight
        # grads); without this, absmax would accumulate nonzero cotangents
        qtable = jax.lax.stop_gradient(qtable)
        out = _partial_dequant_rows(qtable, ids).astype(self.dtype)
        flat = _apply_lookup_opts(
            out.reshape(-1, self.features), ids, self.padding_idx, self.max_norm, self.norm_type
        )
        return flat.reshape(out.shape)


class EmbeddingNF4(Embedding4bit):
    quant_type: str = "nf4"


class EmbeddingFP4(Embedding4bit):
    quant_type: str = "fp4"


class Embedding8bit(nn.Module):
    """Embedding with an int8 table + per-row stats (reference
    nn/modules.py:833-930)."""

    num_embeddings: int
    features: int
    dtype: Any = jnp.float32
    padding_idx: Optional[int] = None
    max_norm: Optional[float] = None
    norm_type: float = 2.0
    embedding_init: Callable = nn.initializers.normal(stddev=1.0)

    @nn.compact
    def __call__(self, ids):
        def init_fn(key):
            W = self.embedding_init(key, (self.num_embeddings, self.features), jnp.float32)
            return Int8TensorState.quantize(W)

        qtable = self.param("embedding", init_fn)
        qtable = jax.lax.stop_gradient(qtable)  # frozen int8 table
        rows = jnp.take(qtable.CB, ids.reshape(-1), axis=0).astype(jnp.float32)
        stats = jnp.take(qtable.SCB, ids.reshape(-1), axis=0)
        out = rows * (stats[:, None] / 127.0)
        out = _apply_lookup_opts(out, ids, self.padding_idx, self.max_norm, self.norm_type)
        return out.reshape(*ids.shape, self.features).astype(self.dtype)


class Embedding(nn.Module):
    """Plain embedding whose optimizer state stays 32-bit — the reference's
    `bnb.nn.Embedding` (nn/modules.py:134-197): a standard xavier-uniform
    embedding (no LayerNorm, unlike StableEmbedding) that registers a
    32-bit-optimizer override for its weight.  Here the parameter name
    `embedding` matches :data:`bitsandbytes_tpu.optim.STABLE_EMBEDDING_RULE`
    so the same per-path override pins it to 32-bit state under the 8-bit
    optimizers.  ``padding_idx`` zeroes that row's output (the lookup-side
    equivalent of the reference zeroing the row at init)."""

    num_embeddings: int
    features: int
    padding_idx: Optional[int] = None
    max_norm: Optional[float] = None
    norm_type: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embedding",
            nn.initializers.xavier_uniform(),
            (self.num_embeddings, self.features),
            jnp.float32,
        )
        out = jnp.take(table, ids.reshape(-1), axis=0)
        out = _apply_lookup_opts(out, ids, self.padding_idx, self.max_norm, self.norm_type)
        return out.reshape(*ids.shape, self.features).astype(self.dtype)


class StableEmbedding(nn.Module):
    """Embedding + LayerNorm with xavier-uniform init; its optimizer state
    should stay 32-bit (reference nn/modules.py:28-131 registers a
    GlobalOptimManager override; here the `optim32bit_paths` collection name
    marks it for :func:`bitsandbytes_tpu.optim.override_to_32bit`)."""

    num_embeddings: int
    features: int
    padding_idx: Optional[int] = None
    max_norm: Optional[float] = None
    norm_type: float = 2.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids):
        table = self.param(
            "embedding",
            nn.initializers.xavier_uniform(),
            (self.num_embeddings, self.features),
            jnp.float32,
        )
        out = jnp.take(table, ids.reshape(-1), axis=0)
        out = _apply_lookup_opts(out, ids, self.padding_idx, self.max_norm, self.norm_type)
        out = nn.LayerNorm(dtype=jnp.float32)(out)
        return out.reshape(*ids.shape, self.features).astype(self.dtype)


class OutlierAwareLinear(nn.Module):
    """Linear whose weight is int8-quantized except for a fixed budget of
    outlier input dimensions, which stay in full precision (reference
    `OutlierAwareLinear`, nn/modules.py:1197-1220, using OutlierTracer).

    The reference discovers outliers with forward pre-hooks at runtime; under
    XLA, dynamic outlier counts don't exist, so a fixed ``outlier_topk``
    budget is selected from the weight at init (SURVEY.md §7's
    fixed-outlier-budget strategy)."""

    features: int
    outlier_topk: int = 16
    compute_dtype: Any = jnp.bfloat16
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        from ..utils.outliers import find_outlier_dims

        K = x.shape[-1]

        def init_fn(key):
            W = self.kernel_init(key, (self.features, K), jnp.float32)
            idx = find_outlier_dims(W, reduction_dim=0, topk=self.outlier_topk)
            W_outl = jnp.take(W, idx, axis=1)  # [N, topk] fp columns
            W_base = W.at[:, idx].set(0.0)
            q = Int8TensorState.quantize(W_base)
            return {"q": q, "outlier_idx": idx, "outlier_w": W_outl}

        packed = self.param("kernel", init_fn)
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.compute_dtype)
            if self.use_bias
            else None
        )
        x = x.astype(self.compute_dtype)
        state = autograd.MatmulLtState(
            CB=packed["q"].CB, SCB=packed["q"].SCB, has_fp16_weights=False
        )
        out = autograd.matmul(x, None, state)
        x_outl = jnp.take(x, packed["outlier_idx"], axis=-1)
        out = out + jnp.matmul(
            x_outl, packed["outlier_w"].T.astype(self.compute_dtype)
        )
        if bias is not None:
            out = out + bias
        return out
