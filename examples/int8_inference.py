"""LLM.int8() inference (reference examples/int8_inference_huggingface.py).

Quantizes a Llama-family model to int8 (with outlier decomposition) and
generates greedily through the continuous-batching engine.  Uses random
weights here; load real ones with
`bitsandbytes_tpu.utils.import_hf_llama(state_dict, cfg, quantize=...)`.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax

from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.serving import ContinuousBatchingEngine


def main():
    cfg = L.LlamaConfig.tiny()  # swap for LlamaConfig.llama3_8b() with real weights
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    q8 = L.quantize_params_int8(params)

    eng = ContinuousBatchingEngine(q8, cfg, max_batch=4, max_len=128)
    results = eng.generate([[1, 2, 3], [9, 8, 7, 6]], max_new_tokens=16)
    for r in results:
        print(f"request {r.request_id}: prompt={r.prompt} -> {r.tokens}")


if __name__ == "__main__":
    main()
