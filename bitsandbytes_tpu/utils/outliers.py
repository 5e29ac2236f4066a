"""Outlier-dimension tracking utilities.

TPU-native analog of the reference's `OutlierTracer` + `GlobalOutlierPooler`
(bitsandbytes/utils.py:11-101, autograd/_functions.py:25-51): find the
weight/activation dimensions whose magnitudes are outliers (LLM.int8()
emergent features, arXiv:2208.07339) so they can be kept in higher
precision.  Where the reference uses forward pre-hooks and a singleton
registry keyed by weight hash, here these are pure functions over arrays —
call them where you have the tensors.
"""

from __future__ import annotations

from typing import Optional, Set

import jax
import jax.numpy as jnp

__all__ = ["find_outlier_dims", "OutlierPool"]


def find_outlier_dims(
    weight: jax.Array,
    reduction_dim: int = 0,
    zscore: float = 4.0,
    topk: Optional[int] = None,
) -> jax.Array:
    """Columns (along ``reduction_dim``) whose L2 magnitude is a z-score
    outlier (reference `OutlierTracer`/`find_outlier_dims`,
    utils.py:104-119).

    Returns indices (topk) or a boolean mask (zscore mode).  Note the
    XLA constraint: data-dependent sizes don't exist under jit, so the
    zscore mode returns a fixed-shape mask and the topk mode a fixed-size
    index set — the reference's dynamic-size variant has no jit equivalent
    (SURVEY.md §7 "outlier decomposition under jit").
    """
    m = jnp.linalg.norm(weight.astype(jnp.float32), axis=reduction_dim)
    if topk is not None:
        _, idx = jax.lax.top_k(m, topk)
        return idx
    mu = jnp.mean(m)
    sd = jnp.std(m)
    return (m - mu) / jnp.maximum(sd, 1e-12) > zscore


class OutlierPool:
    """Accumulates outlier dimensions observed across layers (reference
    `GlobalOutlierPooler`, autograd/_functions.py:25-51).  Host-side object;
    feed it concrete (non-traced) masks/indices."""

    def __init__(self):
        self.outliers: Set[int] = set()
        self.model_dim: Optional[int] = None

    def add_outliers(self, outlier_idx, feature_dim: int) -> None:
        if self.model_dim is None:
            self.model_dim = feature_dim
        if feature_dim != self.model_dim:
            return  # ignore non-model-dim layers, as the reference does
        import numpy as np

        self.outliers.update(np.asarray(outlier_idx).reshape(-1).tolist())

    def get_current_outlier_idx(self):
        import numpy as np

        return np.asarray(sorted(self.outliers), np.int64)
