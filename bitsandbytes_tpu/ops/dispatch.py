"""Backend dispatch: Pallas kernels vs pure-jnp reference implementations.

TPU-native analog of the reference's torch.library multi-backend registry
(bitsandbytes/_ops.py + bitsandbytes/backends/*/ops.py).  In JAX there is no
FFI boundary to manage — both tiers are jittable functions — so dispatch
reduces to a single policy switch:

  * ``auto`` (default): Pallas kernels on TPU, reference jnp elsewhere.
  * ``pallas``: force Pallas (uses interpret mode off-TPU — slow, for tests).
  * ``reference``: force the pure-jnp tier everywhere.

Controlled by env var ``BNB_TPU_BACKEND`` or :func:`set_backend`.
"""

from __future__ import annotations

import os

import jax

_VALID = ("auto", "pallas", "reference")
_backend = os.environ.get("BNB_TPU_BACKEND", "auto")
if _backend not in _VALID:
    raise ValueError(f"BNB_TPU_BACKEND must be one of {_VALID}, got {_backend!r}")


def backend() -> str:
    return _backend


def set_backend(name: str) -> None:
    global _backend
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}, got {name!r}")
    _backend = name


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def use_pallas() -> bool:
    """Should the current call use the Pallas kernel tier?"""
    if _backend == "pallas":
        return True
    if _backend == "reference":
        return False
    return _on_tpu()
