"""Model zoo: flagship transformer families running on the quantized ops.

The reference library ships no models (it plugs into HF Transformers);
for the TPU-native framework the serving slice is first-class
(BASELINE.json configs #2-#5), so a Llama-family implementation lives here.
"""

from . import gpt2, moe
from .llama import (
    KVCache,
    LlamaConfig,
    decode_step,
    forward,
    init_params,
    init_kv_cache,
    prefill,
    quantize_params_4bit,
    quantize_params_int8,
    add_lora,
    lora_train_step,
)

__all__ = [
    "moe",
    "gpt2",
    "LlamaConfig",
    "KVCache",
    "init_params",
    "init_kv_cache",
    "forward",
    "prefill",
    "decode_step",
    "quantize_params_4bit",
    "quantize_params_int8",
    "add_lora",
    "lora_train_step",
]
