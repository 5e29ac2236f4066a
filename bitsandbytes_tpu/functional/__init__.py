"""Functional API (the L3 layer of SURVEY.md §1).

Pure-functional quantize/dequantize/matmul primitives plus the QuantState
container.  Everything here is jit/pjit-compatible.
"""

from .codebooks import (
    CODE_DTYPE,
    create_dynamic_map,
    create_fp8_map,
    create_linear_map,
    create_normal_map,
    get_4bit_code,
)
from .quant_state import QuantState
from .blockwise import (
    blockwise_absmax,
    dequantize_blockwise,
    dequantize_blockwise_with_code,
    quantize_blockwise,
    quantize_blockwise_with_code,
)
from .fourbit import (
    dequantize_4bit,
    dequantize_fp4,
    dequantize_nf4,
    pack_4bit,
    quantize_4bit,
    quantize_fp4,
    quantize_nf4,
    unpack_4bit,
)

# reference name for the codebook lookup (functional.py get_4bit_type)
get_4bit_type = get_4bit_code
from .int8 import (
    int8_double_quant,
    int8_linear_matmul,
    int8_mixed_scaled_mm,
    int8_mm_dequant,
    int8_scaled_mm,
    int8_vectorwise_dequant,
    int8_vectorwise_quant,
)
from .optim_update import (
    optimizer_update_32bit,
    optimizer_update_8bit_blockwise,
)
from .gemm import gemm_4bit, gemv_4bit

__all__ = [k for k in dir() if not k.startswith("_")]
