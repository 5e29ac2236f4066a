"""Serving slice: continuous-batching decode over quantized weights.

The reference library stops at ops/modules (serving is HF's job); the
TPU-native framework serves directly (BASELINE.json configs #3/#5:
"continuous batching + KV-cache", "int8 KV sharded").
"""

from .engine import GenerationResult, ContinuousBatchingEngine

__all__ = ["ContinuousBatchingEngine", "GenerationResult"]
