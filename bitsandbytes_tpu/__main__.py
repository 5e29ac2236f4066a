"""``python -m bitsandbytes_tpu`` — environment diagnostics + sanity check
(reference bitsandbytes/__main__.py:1-4)."""

import sys

from .diagnostics import main

sys.exit(main())
