"""Reference-named utility shims.

Each function here is a thin, documented delegate to this repo's JAX-native
implementation, published under the name a bitsandbytes user already knows
(reference ``bitsandbytes/utils.py``).  They exist for discoverability when
porting code — the native APIs they wrap are the first-class surface.
"""
from __future__ import annotations

import json
from typing import Optional

import jax
import numpy as np

from .outliers import find_outlier_dims

__all__ = [
    "OutlierTracer",
    "pack_dict_to_tensor",
    "unpack_tensor_to_dict",
    "replace_linear",
]


def pack_dict_to_tensor(source_dict: dict) -> np.ndarray:
    """JSON-encode a metadata dict into a uint8 array — the convention used
    to embed quant-state metadata in tensor-only containers (reference
    utils.py:166-179; QuantState.as_dict(packed=True) uses the same
    encoding under ``quant_state.bitsandbytes__{type}`` keys)."""
    return np.frombuffer(json.dumps(source_dict).encode("utf-8"), np.uint8).copy()


def unpack_tensor_to_dict(tensor_data) -> dict:
    """Inverse of :func:`pack_dict_to_tensor` (reference utils.py:183-196)."""
    return json.loads(bytes(np.asarray(tensor_data, np.uint8)).decode("utf-8"))


def replace_linear(
    params,
    quant_type: str = "nf4",
    blocksize: int = 64,
    skip: Optional[list] = None,
    compress_statistics: bool = False,
):
    """Quantize the linear weights of a param tree — the JAX analog of the
    reference's module-surgery ``replace_linear(model, Linear4bit, ...)``
    (utils.py:200-246).  Torch replaces ``nn.Linear`` submodules in place;
    the pytree equivalent replaces float matrix leaves with
    :class:`~bitsandbytes_tpu.nn.QuantizedTensor`.

    ``skip``: leaf-path substrings to leave unquantized (the reference's
    ``modules_to_not_convert``, default ``["lm_head"]``).
    """
    from ..nn.parametrize import quantize_tree

    skip = ["lm_head"] if skip is None else skip

    def predicate(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if any(s in name for s in skip):
            return False
        return hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.size >= 4096 and (
            jax.numpy.issubdtype(leaf.dtype, jax.numpy.floating)
        )

    return quantize_tree(
        params,
        predicate=predicate,
        blocksize=blocksize,
        quant_type=quant_type,
        compress_statistics=compress_statistics,
    )


class OutlierTracer:
    """Minimal JAX analog of the reference's weight-outlier tracer
    (utils.py:21-76): maps a weight matrix to its outlier feature indices.
    The torch original is a forward-hook singleton keyed by weight hash;
    with pure functions there is no hook machinery — call
    :meth:`get_outliers` on the weight directly (it memoizes by id)."""

    _instance = None

    def __init__(self):
        self._cache: dict = {}

    @classmethod
    def get_instance(cls) -> "OutlierTracer":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def initialize(self, *_args, **_kwargs) -> None:  # hook-API compat: no-op
        return None

    def is_initialized(self) -> bool:
        return True

    def get_hvalue(self, weight) -> int:
        return id(weight)

    def get_outliers(self, weight, reduction_dim: int = 0, zscore: float = 4.0):
        """Boolean outlier mask over features (the torch original returns
        index tensors; the JAX-native :func:`find_outlier_dims` returns a
        static-shape mask so it stays jittable — ``jnp.nonzero`` it outside
        jit if indices are needed)."""
        h = self.get_hvalue(weight)
        if h not in self._cache:
            self._cache[h] = find_outlier_dims(
                weight, reduction_dim=reduction_dim, zscore=zscore
            )
        return self._cache[h]
