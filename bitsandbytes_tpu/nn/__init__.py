"""Flax linen modules over quantized weights (the L5 layer of SURVEY.md §1)."""

from .modules import (
    Embedding,
    Embedding4bit,
    Embedding8bit,
    EmbeddingFP4,
    EmbeddingNF4,
    Linear4bit,
    Linear8bitLt,
    LinearFP4,
    LinearNF4,
    StableEmbedding,
    OutlierAwareLinear,
    QuantizedTensor,
    Int8TensorState,
)
from .parametrize import (
    dequantize_tree,
    quantize_tree,
    mask_quantized,
)

# reference tensor-subclass names (nn/modules.py Params4bit:217-501 /
# Int8Params:719-809): the pytree carriers are their JAX analogs — same
# role (packed payload + quant metadata flowing through the framework),
# published under the names porting users grep for
Params4bit = QuantizedTensor
Int8Params = Int8TensorState

__all__ = [
    "Params4bit",
    "Int8Params",
    "Linear4bit",
    "LinearFP4",
    "LinearNF4",
    "Linear8bitLt",
    "Embedding4bit",
    "EmbeddingFP4",
    "EmbeddingNF4",
    "Embedding8bit",
    "Embedding",
    "StableEmbedding",
    "OutlierAwareLinear",
    "QuantizedTensor",
    "Int8TensorState",
    "quantize_tree",
    "dequantize_tree",
    "mask_quantized",
]
