"""``python -m bitsandbytes_tpu`` — environment diagnostics + sanity check
(reference bitsandbytes/__main__.py:1-4)."""

import os
import sys

# Honor JAX_PLATFORMS even on stacks whose sitecustomize pins a different
# platform after env-var processing (e.g. the axon TPU plugin): the config
# knob still wins if no backend has been initialized yet.
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        import jax

        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

from .diagnostics import main

sys.exit(main())
