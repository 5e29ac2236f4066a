"""Pytree-level quantization utilities (the reference's parametrize API).

TPU-native analog of bitsandbytes/nn/parametrize.py: where the reference
hooks `torch.nn.utils.parametrize` to store arbitrary module parameters
(e.g. MoE expert weights) in 4-bit and dequantize on access, in JAX the same
capability is a *pytree transformation*: replace selected float leaves of a
params tree with :class:`QuantizedTensor` and dequantize where consumed.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .modules import QuantizedTensor

__all__ = ["quantize_tree", "dequantize_tree", "mask_quantized"]


def _is_quantizable(x, min_size: int) -> bool:
    return (
        isinstance(x, (jax.Array,))
        and jnp.issubdtype(x.dtype, jnp.floating)
        and x.ndim >= 2
        and x.size >= min_size
    )


def quantize_tree(
    params,
    predicate: Optional[Callable[[tuple, jax.Array], bool]] = None,
    blocksize: int = 64,
    quant_type: str = "nf4",
    compress_statistics: bool = False,
    min_size: int = 4096,
):
    """Replace float array leaves with 4-bit :class:`QuantizedTensor`s.

    ``predicate(path, leaf) -> bool`` selects leaves (default: all float
    arrays with ndim >= 2 and >= min_size elements).  The inverse of
    reference `replace_parameter_4bit` (nn/parametrize.py:42-126).
    """

    def maybe_quantize(path, leaf):
        if isinstance(leaf, QuantizedTensor):
            return leaf
        selected = (
            predicate(path, leaf)
            if predicate is not None
            else _is_quantizable(leaf, min_size)
        )
        if not selected:
            return leaf
        return QuantizedTensor.quantize(
            leaf,
            blocksize=blocksize,
            quant_type=quant_type,
            compress_statistics=compress_statistics,
        )

    return jax.tree_util.tree_map_with_path(
        maybe_quantize, params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )


def dequantize_tree(params):
    """Dequantize every :class:`QuantizedTensor` leaf back to a dense array
    (reference `Bnb4bitParametrization.forward`, nn/parametrize.py:11-39)."""
    return jax.tree_util.tree_map(
        lambda x: x.dequantize() if isinstance(x, QuantizedTensor) else x,
        params,
        is_leaf=lambda x: isinstance(x, QuantizedTensor),
    )


def mask_quantized(params, trainable: bool = False):
    """Boolean mask pytree for optax.masked: ``trainable`` for quantized
    leaves, the opposite elsewhere.  Use to exclude frozen quantized weights
    from optimizer updates."""
    return jax.tree_util.tree_map(
        lambda x: trainable if isinstance(x, QuantizedTensor) else not trainable,
        params,
        is_leaf=lambda x: isinstance(x, QuantizedTensor),
    )
