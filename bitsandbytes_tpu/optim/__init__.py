"""Optimizer family (reference bitsandbytes/optim/__init__.py:6-22).

Every reference optimizer class has a factory here returning an
`optax.GradientTransformation`.  Naming follows the reference: plain name =
``optim_bits`` selectable (default 32), ``*8bit``/``*32bit`` = fixed width,
``paged_*`` = host-memory state placement.

CamelCase aliases (Adam8bit, PagedAdamW8bit, ...) are provided for parity
with the reference's public API.
"""

from __future__ import annotations

import functools

from .base import BnbOptimizerState, make_optimizer
from .paged import make_paged_update, paged_state_sharding, to_host
from .overrides import (
    STABLE_EMBEDDING_RULE,
    make_optimizer_with_overrides,
    path_labels,
)
from .compat import (
    GlobalOptimManager,
    MockArgs,
    Optimizer1State,
    Optimizer2State,
    Optimizer8bit,
    PytorchLARS,
)

__all__ = [
    "GlobalOptimManager",
    "MockArgs",
    "Optimizer1State",
    "Optimizer2State",
    "Optimizer8bit",
    "PytorchLARS",
    "make_optimizer",
    "BnbOptimizerState",
    "paged_state_sharding",
    "make_paged_update",
    "to_host",
    "make_optimizer_with_overrides",
    "STABLE_EMBEDDING_RULE",
    "path_labels",
]


def _family(name, fname, *, beta1=0.9, beta2=0.999, eps=1e-8, weight_decay=0.0, lr=1e-3, **extra):
    """Create {fname, fname8bit, fname32bit, paged_*} factory functions."""

    def factory(learning_rate=lr, *, optim_bits=32, is_paged=False, **kw):
        args = dict(beta1=beta1, beta2=beta2, eps=eps, weight_decay=weight_decay, **extra)
        args.update(kw)
        return make_optimizer(
            name, learning_rate, optim_bits=optim_bits, is_paged=is_paged, **args
        )

    out = {}
    out[fname] = factory
    out[f"{fname}8bit"] = functools.partial(factory, optim_bits=8)
    out[f"{fname}32bit"] = functools.partial(factory, optim_bits=32)
    out[f"paged_{fname}"] = functools.partial(factory, is_paged=True)
    out[f"paged_{fname}8bit"] = functools.partial(factory, optim_bits=8, is_paged=True)
    out[f"paged_{fname}32bit"] = functools.partial(factory, optim_bits=32, is_paged=True)
    return out


def _sgd_factory(learning_rate=1e-2, momentum=0.9, *, optim_bits=32, is_paged=False, **kw):
    """SGD with momentum (reference optim/sgd.py; momentum==0 unsupported
    there too — the kernel family has no plain-SGD entry)."""
    if momentum == 0:
        raise ValueError("bitsandbytes SGD requires momentum > 0 (reference optim/sgd.py:87)")
    kw.setdefault("beta1", momentum)
    kw.setdefault("eps", 0.0)
    return make_optimizer("momentum", learning_rate, optim_bits=optim_bits, is_paged=is_paged, **kw)


_factories = {}
# Adam / AdamW (adam rule; AdamW defaults weight_decay=1e-2, reference optim/adamw.py)
_factories.update(_family("adam", "adam"))
_factories.update(_family("adam", "adamw", weight_decay=1e-2))
# Lion (reference optim/lion.py: betas (0.9, 0.99), no eps)
_factories.update(_family("lion", "lion", beta1=0.9, beta2=0.99, eps=0.0, lr=1e-4))
# RMSprop (reference optim/rmsprop.py: alpha->beta1=0.99)
_factories.update(_family("rmsprop", "rmsprop", beta1=0.99, eps=1e-8, lr=1e-2))
# Adagrad (reference optim/adagrad.py)
_factories.update(_family("adagrad", "adagrad", beta1=0.0, beta2=0.0, eps=1e-10, lr=1e-2))
# LAMB (adam rule + max_unorm trust clipping, reference optim/lamb.py)
_factories.update(_family("adam", "lamb", max_unorm=1.0))
# LARS (momentum rule + max_unorm, reference optim/lars.py)
_factories.update(_family("momentum", "lars", beta1=0.9, eps=0.0, max_unorm=0.02, lr=1e-2))
# AdEMAMix (reference optim/ademamix.py: betas (0.9, 0.999, 0.9999), alpha 5)
_factories.update(
    _family("ademamix", "ademamix", beta1=0.9, beta2=0.999, beta3=0.9999, alpha=5.0, lr=1e-3)
)

globals().update(_factories)
__all__ += list(_factories)

# SGD family
sgd = _sgd_factory
sgd8bit = functools.partial(_sgd_factory, optim_bits=8)
sgd32bit = functools.partial(_sgd_factory, optim_bits=32)
__all__ += ["sgd", "sgd8bit", "sgd32bit"]

# CamelCase aliases for reference-API parity (optim/__init__.py:6-22)
_camel = {
    "Adam": "adam", "Adam8bit": "adam8bit", "Adam32bit": "adam32bit",
    "PagedAdam": "paged_adam", "PagedAdam8bit": "paged_adam8bit", "PagedAdam32bit": "paged_adam32bit",
    "AdamW": "adamw", "AdamW8bit": "adamw8bit", "AdamW32bit": "adamw32bit",
    "PagedAdamW": "paged_adamw", "PagedAdamW8bit": "paged_adamw8bit", "PagedAdamW32bit": "paged_adamw32bit",
    "Lion": "lion", "Lion8bit": "lion8bit", "Lion32bit": "lion32bit",
    "PagedLion": "paged_lion", "PagedLion8bit": "paged_lion8bit", "PagedLion32bit": "paged_lion32bit",
    "SGD": "sgd", "SGD8bit": "sgd8bit", "SGD32bit": "sgd32bit",
    "RMSprop": "rmsprop", "RMSprop8bit": "rmsprop8bit", "RMSprop32bit": "rmsprop32bit",
    "Adagrad": "adagrad", "Adagrad8bit": "adagrad8bit", "Adagrad32bit": "adagrad32bit",
    "LAMB": "lamb", "LAMB8bit": "lamb8bit", "LAMB32bit": "lamb32bit",
    "LARS": "lars", "LARS8bit": "lars8bit", "LARS32bit": "lars32bit",
    "AdEMAMix": "ademamix", "AdEMAMix8bit": "ademamix8bit", "AdEMAMix32bit": "ademamix32bit",
    "PagedAdEMAMix": "paged_ademamix", "PagedAdEMAMix8bit": "paged_ademamix8bit",
    "PagedAdEMAMix32bit": "paged_ademamix32bit",
}
for camel, snake in _camel.items():
    globals()[camel] = globals()[snake]
__all__ += list(_camel)
