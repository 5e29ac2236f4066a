"""Reference-named optimizer-layer shims (reference optim/optimizer.py).

Thin, documented delegates to this repo's optax-native factories so code
being ported from the reference finds the classes it subclassed or
configured.  The native surface (make_optimizer / make_optimizer_with_
overrides / the 48 per-family factories) is the first-class API.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

from .base import make_optimizer
from .overrides import make_optimizer_with_overrides

__all__ = [
    "GlobalOptimManager",
    "MockArgs",
    "Optimizer1State",
    "Optimizer2State",
    "Optimizer8bit",
    "PytorchLARS",
]


class MockArgs:
    """Attribute bag over a dict (reference optim/optimizer.py:15-18),
    used by configuration code that reads ``args.key``."""

    def __init__(self, initial_data: dict):
        for key, value in initial_data.items():
            setattr(self, key, value)


class GlobalOptimManager:
    """Per-parameter optimizer-config overrides (reference
    optim/optimizer.py:21-130).

    The torch original keys overrides by parameter IDENTITY (``id(p)``)
    registered before ``optimizer.__init__``; with JAX pytrees the native
    addressing is the parameter's TREE PATH, so overrides here are
    ``(path_regex, kwargs)`` rules and :meth:`build` produces the
    optax transformation via :func:`make_optimizer_with_overrides`.
    ``override_config(pattern, 'optim_bits', 32)`` reproduces the
    reference's canonical use-case (32-bit states for embeddings —
    `STABLE_EMBEDDING_RULE` is the prebuilt rule for that).
    """

    _instance: Optional["GlobalOptimManager"] = None

    def __init__(self):
        self.rules: list = []

    @classmethod
    def get_instance(cls) -> "GlobalOptimManager":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def initialize(self) -> None:  # hook-API compat: no-op
        self.rules = []

    def register_parameters(self, *_args, **_kwargs) -> None:
        """No-op: JAX params need no pre-registration (identity-keyed
        lookup does not exist here — use path-regex overrides)."""

    def override_config(
        self, path_regex: str, key: Optional[str] = None, value=None,
        key_value_dict: Optional[dict] = None,
    ) -> None:
        merged = dict(key_value_dict or {})
        if key is not None:
            merged[key] = value
        self.rules.append((path_regex, merged))

    register_module_override = override_config

    def build(self, name: str, learning_rate: float = 1e-3, **kwargs):
        """The registered rules as an optax transformation."""
        return make_optimizer_with_overrides(
            name, learning_rate, rules=tuple(self.rules), **kwargs
        )


def Optimizer2State(
    optimizer_name: str, learning_rate: float = 1e-3, optim_bits: int = 32, **kwargs
):
    """Two-state (momentum + second-moment) optimizer entry point
    (reference optim/optimizer.py:317-585: the base class Adam/AdamW/
    LAMB/AdEMAMix instantiate).  Here the family is data, not a class
    hierarchy — delegates to :func:`make_optimizer`."""
    return make_optimizer(
        optimizer_name, learning_rate, optim_bits=optim_bits, **kwargs
    )


def Optimizer1State(
    optimizer_name: str, learning_rate: float = 1e-3, optim_bits: int = 32, **kwargs
):
    """One-state optimizer entry point (reference optim/optimizer.py:588-
    830: SGD/RMSprop/Adagrad/Lion/LARS base).  Delegates to
    :func:`make_optimizer`."""
    return make_optimizer(
        optimizer_name, learning_rate, optim_bits=optim_bits, **kwargs
    )


def Optimizer8bit(optimizer_name: str, learning_rate: float = 1e-3, **kwargs):
    """8-bit-state optimizer entry point (reference optim/optimizer.py
    Optimizer8bit base)."""
    return make_optimizer(optimizer_name, learning_rate, optim_bits=8, **kwargs)


def PytorchLARS(learning_rate: float = 1e-2, **kwargs):
    """The reference ships a plain-torch LARS as its own comparison
    baseline (optim/lars.py:81-174); the equivalent baseline here is the
    32-bit LARS factory."""
    return make_optimizer("lars", learning_rate, optim_bits=32, **kwargs)
