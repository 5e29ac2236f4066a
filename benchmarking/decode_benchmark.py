"""Decode throughput across weight formats (reference
benchmarking/inference_benchmark.py's {bf16, nf4, nf4-dq, int8} sweep)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import jax.numpy as jnp

from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.utils.benchmark import device_loop_time


def main():
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    cfg = L.LlamaConfig.llama3_8b(num_layers=4) if on_tpu else L.LlamaConfig.tiny()
    bs, cache_len = (8, 256) if on_tpu else (2, 32)
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    jax.block_until_ready(params)

    variants = {
        "bf16": params,
        "nf4": L.quantize_params_4bit(params, fuse=True),
        "nf4-dq": L.quantize_params_4bit(params, compress_statistics=True, fuse=True),
        "int8": L.quantize_params_int8(params),
    }
    for name, p in variants.items():
        jax.block_until_ready(jax.tree_util.tree_leaves(p))
        cache = L.init_kv_cache(cfg, bs, cache_len)
        tok = jnp.zeros((bs,), jnp.int32)

        def step(p, tok, k, v):
            logits, c = L.decode_step(p, tok, cfg, L.KVCache(k, v), cache_len // 2)
            return jnp.argmax(logits, -1).astype(jnp.int32), c.k, c.v

        s = device_loop_time(step, (tok, cache.k, cache.v), iters=10, const_args=(p,))
        print(f"{name:8s}: {s*1e3:7.3f} ms/step  {bs/s:9.1f} tok/s (bs={bs})")


if __name__ == "__main__":
    main()
