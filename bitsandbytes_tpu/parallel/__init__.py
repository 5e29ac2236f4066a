"""Distribution layer: GSPMD/pjit sharding of quantized pytrees.

The reference library ships only *compatibility surface* for external
sharding engines (FSDP property proxies, `__torch_function__` chunk/split
overrides — reference nn/modules.py:261-339,446-484; SURVEY.md §2.4).  On
TPU, distribution is first-class: quantized weights shard over a
`jax.sharding.Mesh` with rules that keep quantization blocks whole, and the
decode path can all-gather *packed* 4-bit payloads (4-8x cheaper ICI
traffic than gathering dequantized bf16) and dequantize on-chip after the
collective.
"""

from .sharding import (
    make_mesh,
    leaf_sharding,
    shard_quantized_tree,
    llama_param_specs,
    llama_tp_rules,
    kv_cache_specs,
    shard_kv_cache,
)
from .collectives import all_gather_packed, tp_gemm_4bit_allgather, tp_gemm_4bit_ring
from .pipeline import gpipe, stack_stage_params
from .ring_attention import ring_attention

__all__ = [
    "make_mesh",
    "leaf_sharding",
    "shard_quantized_tree",
    "llama_param_specs",
    "llama_tp_rules",
    "kv_cache_specs",
    "shard_kv_cache",
    "all_gather_packed",
    "tp_gemm_4bit_allgather",
    "tp_gemm_4bit_ring",
    "gpipe",
    "stack_stage_params",
    "ring_attention",
]
