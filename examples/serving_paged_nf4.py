"""NF4 serving with paged KV and per-request sampling.

The production serving shape: 4-bit weights decoded in the fused Pallas
kernel, an int8 KV cache consumed natively by the blockwise flash-attention
kernel, KV memory in a shared block pool sized for live tokens (not
max_batch x max_len), and temperature/top-p sampling on-device.  Uses
random weights here; load real ones with
`bitsandbytes_tpu.utils.serialization.import_hf_llama(sd, cfg, quantize="nf4")`
or `load_checkpoint_safetensors`.
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
    qparams = L.quantize_params_4bit(params, quant_type="nf4", fuse=True)

    eng = ContinuousBatchingEngine(
        qparams,
        cfg,
        max_batch=8,
        max_len=512,
        kv_dtype="int8",        # int8 KV, dequantized per-block in VMEM
        kv_layout="paged",      # block-table pool; memory ~ live tokens
        kv_block_size=64,
        num_kv_blocks=32,       # 32*64 = 2048 live tokens across all slots
        seed=0,
    )

    # mixed traffic: greedy and sampled requests decode in the same batch
    eng.add_request([1, 2, 3, 4], max_new_tokens=24)  # greedy
    eng.add_request([5, 6, 7], max_new_tokens=24, temperature=0.8, top_p=0.95)
    eng.add_request([11, 12], max_new_tokens=24, temperature=1.2, top_p=0.9)

    finished = []
    while eng.has_work():
        finished += eng.step()
    for r in sorted(finished, key=lambda r: r.request_id):
        print(f"request {r.request_id}: prompt={r.prompt} -> {r.tokens}")


if __name__ == "__main__":
    main()
