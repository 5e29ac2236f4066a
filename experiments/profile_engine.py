"""Dissect the continuous-batching engine's wall clock on-chip.

Phases measured separately (VERDICT r2 weak #7's "unmeasured suspects"):
  1. prefill/admission cost: add_request x N wall (includes prefill
     dispatch + donated cache writes + first-token sync)
  2. steady-state decode: step() wall with a full batch and NO
     admissions/retirements mid-run (pure decode chunk + host loop)
  3. the same decode chunk through device_loop_time (device-only cost)
  => host+sync overhead = (2) - (3)

Usage: python experiments/profile_engine.py [--paged] [--kv int8]
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


def main():
    kv = "int8" if "--kv" in sys.argv and "int8" in sys.argv else "bf16"
    paged = "--paged" in sys.argv
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    cfg = L.LlamaConfig.llama3_8b(num_layers=4) if on_tpu else L.LlamaConfig.tiny()
    bs, max_len = (16, 512) if on_tpu else (4, 64)

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

    kwargs = dict(kv_dtype=kv)
    if paged:
        kwargs.update(kv_layout="paged", kv_block_size=128)
    eng = ContinuousBatchingEngine(
        qparams, cfg, max_batch=bs, max_len=max_len, steps_per_sync=8, **kwargs
    )

    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(1, cfg.vocab_size, size=int(n)))
               for n in rng.integers(8, 64, size=bs)]
    # warm: compile single + grouped prefill buckets + decode chunk with the
    # same burst shape the measurement uses (first-time XLA compiles are
    # 20-60 s on this stack and must not pollute the admission number)
    eng.add_request(list(rng.integers(1, cfg.vocab_size, size=12)), max_new_tokens=4)
    eng.add_request(list(rng.integers(1, cfg.vocab_size, size=40)), max_new_tokens=4)
    while eng.has_work():
        eng.step()
    for p in prompts:
        eng.add_request(p, max_new_tokens=2)
    while eng.has_work():
        eng.step()
    print("warm done", flush=True)

    # phase 1: admission cost, full batch (prompts span both buckets)
    t0 = time.perf_counter()
    for p in prompts:
        eng.add_request(p, max_new_tokens=10_000)  # never finishes in this run
    eng._admit()  # grouped batched prefill (normally runs inside step())
    t_admit = time.perf_counter() - t0
    print(f"admit x{bs} (grouped): {t_admit*1e3:.1f} ms total, "
          f"{t_admit/bs*1e3:.1f} ms/req", flush=True)

    # phase 2: steady-state decode steps (no admissions, no retirements)
    eng.step()  # settle
    n_steps = 12
    t0 = time.perf_counter()
    for _ in range(n_steps):
        eng.step()
    t_step = (time.perf_counter() - t0) / n_steps
    tok_per_step = bs * eng.steps_per_sync
    print(f"steady step: {t_step*1e3:.1f} ms/chunk -> {tok_per_step/t_step:.1f} tok/s",
          flush=True)

    # phase 2b: split host python vs dispatch+sync inside step()
    # time just the decode dispatch + sync with the same inputs step() uses
    from bitsandbytes_tpu.serving.engine import _decode_chunk
    active = np.zeros(bs, bool)
    for b in eng.slots:
        active[b] = True
    positions = jnp.asarray(np.where(active, eng.lengths, 0), jnp.int32)
    tokens = jnp.zeros((bs,), jnp.int32)
    key = jax.random.PRNGKey(7)
    cache = eng.cache
    t0 = time.perf_counter()
    reps = 8
    for i in range(reps):
        chunk, cache = _decode_chunk(
            eng.params, cache, tokens, positions,
            jnp.asarray(eng.temps), jnp.asarray(eng.top_ps), key,
            cfg=eng.cfg, S=eng.steps_per_sync, sampling=False,
            pool=eng.sampling_pool,
        )
        tokens = chunk[-1]
        np.asarray(chunk)  # sync like step() does
    t_chunk = (time.perf_counter() - t0) / reps
    eng.cache = cache
    print(f"dispatch+sync only: {t_chunk*1e3:.1f} ms/chunk "
          f"(host python in step(): {(t_step-t_chunk)*1e3:.1f} ms)", flush=True)

    # phase 3 (opt-in --device-only): device-only chunk cost via the
    # hoist-proof loop.  The wrapping compile intermittently hangs the
    # remote compile helper and blocks the chip for everyone — run it only
    # when explicitly asked.
    if "--device-only" not in sys.argv:
        return
    try:
        from bitsandbytes_tpu.utils.benchmark import device_loop_time
        leaves, treedef = jax.tree_util.tree_flatten(eng.cache)
        pos = positions

        def step(toks, *leaves):
            c = jax.tree_util.tree_unflatten(treedef, leaves)
            out, c2 = _decode_chunk(
                eng.params, c, toks, pos,
                jnp.zeros((bs,), jnp.float32), jnp.ones((bs,), jnp.float32),
                jax.random.PRNGKey(0),
                cfg=cfg, S=eng.steps_per_sync, sampling=False,
                pool=eng.sampling_pool,
            )
            return (out[-1],) + tuple(jax.tree_util.tree_leaves(c2))

        dev = device_loop_time(step, (jnp.zeros((bs,), jnp.int32), *leaves), iters=5)
        print(f"device-only chunk: {dev*1e3:.1f} ms "
              f"(sync/tunnel overhead {max(t_chunk-dev,0)*1e3:.1f} ms/chunk)", flush=True)
    except Exception as e:
        print("device-only timing failed:", str(e)[:160], flush=True)


if __name__ == "__main__":
    main()
