"""Utilities: benchmarking, serialization, model surgery."""

from .benchmark import device_loop_time, sol_fraction
from . import native
from .outliers import OutlierPool, find_outlier_dims
from .serialization import (
    state_dict_from_params,
    params_from_state_dict,
    save_checkpoint,
    load_checkpoint,
    import_hf_llama,
)

__all__ = [
    "native",
    "OutlierPool",
    "find_outlier_dims",
    "device_loop_time",
    "sol_fraction",
    "state_dict_from_params",
    "params_from_state_dict",
    "save_checkpoint",
    "load_checkpoint",
    "import_hf_llama",
]
