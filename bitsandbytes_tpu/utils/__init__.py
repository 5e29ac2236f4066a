"""Utilities: benchmarking, serialization, model surgery."""

from .benchmark import device_loop_time, sol_fraction
from . import native
from .compat import (
    OutlierTracer,
    pack_dict_to_tensor,
    replace_linear,
    unpack_tensor_to_dict,
)
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
    "OutlierTracer",
    "find_outlier_dims",
    "device_loop_time",
    "sol_fraction",
    "state_dict_from_params",
    "params_from_state_dict",
    "save_checkpoint",
    "load_checkpoint",
    "import_hf_llama",
    "pack_dict_to_tensor",
    "unpack_tensor_to_dict",
    "replace_linear",
]
