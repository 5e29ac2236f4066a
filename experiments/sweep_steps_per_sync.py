"""Steady-state engine throughput vs steps_per_sync (RTT amortization).

One process, interleaved order (S values round-robin x repeats), so pool
drift hits all S equally.  Each engine decodes a full batch with no
admissions/retirements; tok/s = bs * S / median step wall.

Usage: python experiments/sweep_steps_per_sync.py [--kv int8] [--paged]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.serving.engine import ContinuousBatchingEngine


def build_engine(qparams, cfg, bs, max_len, S, kv, paged):
    kwargs = dict(kv_dtype=kv)
    if paged:
        kwargs.update(kv_layout="paged", kv_block_size=128)
    eng = ContinuousBatchingEngine(
        qparams, cfg, max_batch=bs, max_len=max_len, steps_per_sync=S, **kwargs
    )
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, cfg.vocab_size, size=24)) for _ in range(bs)]
    for p in prompts:
        eng.add_request(p, max_new_tokens=100_000)
    eng.step()  # admit + compile
    eng.step()  # settle the pipeline
    return eng


def main():
    kv = "int8" if "--kv" in sys.argv and "int8" in sys.argv else "bf16"
    paged = "--paged" in sys.argv
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    cfg = L.LlamaConfig.llama3_8b(num_layers=4) if on_tpu else L.LlamaConfig.tiny()
    bs, max_len = (16, 2048) if on_tpu else (4, 128)
    S_values = (4, 8, 16, 32) if on_tpu else (2, 4)

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

    engines = {S: build_engine(qparams, cfg, bs, max_len, S, kv, paged) for S in S_values}
    print("engines warm", flush=True)

    # time CONSECUTIVE steps per engine (a pipelined engine's step wall is
    # only meaningful back-to-back: with other work in between, its device
    # time hides in the gap and the wall reads as host-cost only);
    # interleave S values at block level so pool drift hits all S
    reps, block = 4, 4
    times = {S: [] for S in S_values}
    for _ in range(reps):
        for S in S_values:
            eng = engines[S]
            eng.step()  # refill the pipeline after the inter-block gap
            t0 = time.perf_counter()
            for _ in range(block):
                eng.step()
            times[S].append((time.perf_counter() - t0) / block)
    for S in S_values:
        xs = sorted(times[S])
        med = xs[len(xs) // 2]
        print(f"S={S:3d}: {med*1e3:7.1f} ms/chunk -> {bs*S/med:7.1f} tok/s "
              f"(min {min(xs)*1e3:.1f}, max {max(xs)*1e3:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
