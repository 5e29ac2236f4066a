"""Op implementation tiers (the L1/L2 layers of SURVEY.md §1).

`pallas/` holds the hand-written TPU kernels; `dispatch` picks between the
Pallas tier and the pure-jnp reference tier per call site.
"""

from .dispatch import backend, set_backend, use_pallas

__all__ = ["backend", "set_backend", "use_pallas"]
