"""Decompose the engine decode-chunk cost: dense-bf16 vs dense-int8 vs
paged-int8 at identical shapes, plus the bare decode_step for reference.
Consecutive pipelined steps per engine, block-interleaved (one process).

Usage: python experiments/ab_engine_variants.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.serving.engine import ContinuousBatchingEngine
from bitsandbytes_tpu.utils.benchmark import device_loop_time


def build(qparams, cfg, bs, max_len, **kwargs):
    eng = ContinuousBatchingEngine(
        qparams, cfg, max_batch=bs, max_len=max_len, steps_per_sync=8, **kwargs
    )
    rng = np.random.default_rng(0)
    for _ in range(bs):
        eng.add_request(list(rng.integers(1, cfg.vocab_size, size=24)),
                        max_new_tokens=100_000)
    eng.step(); eng.step()
    return eng


def main():
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    cfg = L.LlamaConfig.llama3_8b(num_layers=4) if on_tpu else L.LlamaConfig.tiny()
    bs, max_len = (16, 2048) if on_tpu else (4, 128)

    params = L.init_params(jax.random.PRNGKey(0), cfg)
    if on_tpu:
        qparams = dict(params)
        qlayers = []
        for layer in params["layers"]:
            ql = L.quantize_params_4bit(
                {"layers": [layer], "embed": None, "final_norm": None, "lm_head": None},
                quant_type="nf4", blocksize=64, fuse=True,
            )["layers"][0]
            jax.block_until_ready(jax.tree_util.tree_leaves(ql))
            qlayers.append(ql)
        qparams["layers"] = qlayers
    else:
        qparams = L.quantize_params_4bit(params, fuse=True)

    variants = {
        "dense-bf16": dict(kv_dtype="bf16"),
        "dense-int8": dict(kv_dtype="int8"),
        "paged-int8": dict(kv_dtype="int8", kv_layout="paged", kv_block_size=128),
    }
    engines = {k: build(qparams, cfg, bs, max_len, **v) for k, v in variants.items()}
    print("engines warm", flush=True)

    # bare decode_step reference (bf16 dense cache at the same depth)
    cache = L.init_kv_cache(cfg, bs, max_len)
    tok = jnp.zeros((bs,), jnp.int32)

    def step(p, tok, k, v):
        logits, c2 = L.decode_step(p, tok, cfg, L.KVCache(k, v), max_len // 4)
        return jnp.argmax(logits, -1).astype(jnp.int32), c2.k, c2.v

    bare = device_loop_time(step, (tok, cache.k, cache.v), iters=10,
                            const_args=(qparams,))
    print(f"bare decode_step (bf16 dense): {bare*1e3:.2f} ms/step", flush=True)

    reps, block = 4, 4
    times = {k: [] for k in variants}
    for _ in range(reps):
        for k, eng in engines.items():
            eng.step()
            t0 = time.perf_counter()
            for _ in range(block):
                eng.step()
            times[k].append((time.perf_counter() - t0) / block)
    for k in variants:
        xs = sorted(times[k])
        med = xs[len(xs) // 2]
        print(f"{k:11s}: {med*1e3:6.1f} ms/chunk = {med/8*1e3:5.2f} ms/step "
              f"(min {min(xs)*1e3:.1f}, max {max(xs)*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
