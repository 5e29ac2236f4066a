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


def main_full_model(fmt: str = "nf4"):
    """FULL 32-layer Llama-3-8B decode (absolute tok/s; the quantized model
    fits a single v5e chip — a bf16 copy would not, which is why the
    headline ratio bench uses layer-scaled geometry).  Reference absolute
    comparison points (benchmarking/README.md:91-103, H100 80GB): NF4 bs=1/
    8/32 30.14 / 168.05 / 658.65 tok/s; INT8 19.17 / 155.44 / 586.26."""
    if jax.default_backend() in ("cpu", "gpu"):
        print("full-model bench requires the TPU chip")
        return
    cfg = L.LlamaConfig.llama3_8b(num_layers=32)
    cache_len = 256
    # init + quantize ONE layer at a time: the full bf16 model (16 GB) does
    # not fit the chip; the NF4 (~4.7 GB) and int8 (~8 GB) models do
    cfg1 = L.LlamaConfig.llama3_8b(num_layers=1)
    qlayers = []
    for i in range(cfg.num_layers):
        p1 = L.init_params(jax.random.PRNGKey(i), cfg1)
        shell = {"layers": p1["layers"], "embed": None, "final_norm": None, "lm_head": None}
        if fmt == "nf4":
            ql = L.quantize_params_4bit(shell, quant_type="nf4", blocksize=64, fuse=True)["layers"][0]
        elif fmt in ("nf4-dq", "nf4-dq-resolved"):
            ql = L.quantize_params_4bit(
                shell, quant_type="nf4", blocksize=64, fuse=True,
                compress_statistics=True,
            )["layers"][0]
            if fmt == "nf4-dq-resolved":
                # materialize the DQ absmax once at load (QuantizedTensor.
                # resolve_nested): runtime == plain NF4, +1/32 weight bytes
                ql = {k: (v.resolve_nested() if hasattr(v, "resolve_nested") else v)
                      for k, v in ql.items()}
        else:
            ql = L.quantize_params_int8(shell)["layers"][0]
        jax.block_until_ready(jax.tree_util.tree_leaves(ql))
        if i == 0:
            head = {k: p1[k] for k in ("embed", "final_norm", "lm_head")}
            jax.block_until_ready(list(head.values()))
        del p1
        qlayers.append(ql)
    qparams = {**head, "layers": qlayers}
    del qlayers

    for bs in (1, 8, 32):
        cache = L.init_kv_cache(cfg, bs, cache_len)
        tok = jnp.zeros((bs,), jnp.int32)

        def step(p, tok, k, v):
            logits, c = L.decode_step(p, tok, cfg, L.KVCache(k, v), cache_len // 2)
            return jnp.argmax(logits, -1).astype(jnp.int32), c.k, c.v

        s = device_loop_time(
            step, (tok, cache.k, cache.v), iters=10, const_args=(qparams,)
        )
        del cache
        print(f"{fmt} 32-layer bs={bs:2d}: {s*1e3:7.3f} ms/step  {bs/s:9.1f} tok/s",
              flush=True)


if __name__ == "__main__":
    if "--full" in sys.argv:
        if "--int8" in sys.argv:
            fmt = "int8"
        elif "--dq" in sys.argv:
            fmt = "nf4-dq-resolved" if "--resolve" in sys.argv else "nf4-dq"
        else:
            fmt = "nf4"
        main_full_model(fmt)
    else:
        main()
