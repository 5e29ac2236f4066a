"""Per-parameter optimizer config overrides.

TPU-native analog of the reference ``GlobalOptimManager``
(bitsandbytes/optim/optimizer.py:26-114): specific parameters can use
different optimizer settings (most commonly ``optim_bits=32`` for
embeddings — StableEmbedding registers exactly that override, reference
nn/modules.py:99).  Instead of a global mutable registry, the override is a
pure function of the param-tree path: rules are ``(path_regex, kwargs)``
pairs and the result is an ``optax.multi_transform`` partitioned optimizer.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
import optax

from .base import make_optimizer

__all__ = [
    "make_optimizer_with_overrides",
    "STABLE_EMBEDDING_RULE",
    "path_labels",
]

# StableEmbedding's weight must keep 32-bit optimizer state (reference
# nn/modules.py:95-99 register_module_override({"optim_bits": 32})).
STABLE_EMBEDDING_RULE: Tuple[str, dict] = (r"(^|.*[./])embedding([./].*|$)", {"optim_bits": 32})


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return ".".join(parts)


def path_labels(params: Any, rules: Sequence[Tuple[str, dict]]) -> Any:
    """Label pytree: index (as str) of the first matching rule, else
    'default'."""
    compiled = [re.compile(rx) for rx, _ in rules]

    def label(path, leaf):
        p = _path_str(path)
        for i, rx in enumerate(compiled):
            if rx.search(p):
                return str(i)
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer_with_overrides(
    name: str,
    learning_rate: float = 1e-3,
    rules: Sequence[Tuple[str, dict]] = (),
    **kwargs,
) -> optax.GradientTransformation:
    """Build an optimizer where params whose tree path matches a rule's
    regex use that rule's overridden kwargs.

    Example (train everything with Adam8bit, embeddings in 32-bit)::

        opt = make_optimizer_with_overrides(
            "adam", 1e-3, rules=[STABLE_EMBEDDING_RULE], optim_bits=8,
        )
    """
    transforms = {"default": make_optimizer(name, learning_rate, **kwargs)}
    for i, (_, delta) in enumerate(rules):
        merged = dict(kwargs)
        merged.update(delta)
        lr = merged.pop("learning_rate", learning_rate)
        transforms[str(i)] = make_optimizer(name, lr, **merged)
    return optax.multi_transform(transforms, lambda params: path_labels(params, rules))
