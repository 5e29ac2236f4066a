"""Continuous-batching engine throughput, pool-normalized.

The shared v5e pool swings ~2x across processes/minutes, so a raw tok/s
number is not comparable round-over-round (VERDICT r2 weak #7).  This
bench brackets the engine run with a bf16-matmul canary and reports:

  * raw tok/s (wall clock, includes the host loop),
  * normalized tok/s = raw / pool_factor, where pool_factor is the
    canary's delivered TFLOPs over its typical light-load delivery
    (CANARY_REF_TFLOPS, captured once on an idle chip),
  * device-only decode-chunk time (via the hoist-proof on-device loop) and
    the host-side overhead = wall - device, per step.

Usage: python benchmarking/serving_benchmark.py [--kv int8] [--paged]
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

# bf16 4096^3 matmul TFLOPs delivered on this pool's chip under light load
# (median of idle-chip runs; spec sheet 197, XLA typically delivers ~164).
CANARY_REF_TFLOPS = 164.0


def canary_tflops():
    # CPU smoke runs use a tiny canary (a 4096^3 loop takes minutes there)
    n = 4096 if jax.default_backend() not in ("cpu", "gpu") else 512
    a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)), jnp.bfloat16)
    sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a,), iters=10)
    return 2 * n**3 / sec / 1e12


def main():
    kv = "int8" if "--kv" in sys.argv and "int8" in sys.argv else "bf16"
    paged = "--paged" in sys.argv
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    cfg = L.LlamaConfig.llama3_8b(num_layers=4) if on_tpu else L.LlamaConfig.tiny()
    bs, max_len, n_req, new_tok = (16, 512, 48, 64) if on_tpu else (4, 64, 6, 8)
    if os.environ.get("BNB_SERVE_BS"):
        bs = int(os.environ["BNB_SERVE_BS"])
        n_req = 3 * bs

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

    c0 = canary_tflops()
    print(f"canary before: {c0:.0f} TFLOPs (pool factor {c0/CANARY_REF_TFLOPS:.2f})", flush=True)

    kwargs = dict(kv_dtype=kv)
    if paged:
        kwargs.update(kv_layout="paged", kv_block_size=128)
    eng = ContinuousBatchingEngine(
        qparams, cfg, max_batch=bs, max_len=max_len, steps_per_sync=8, **kwargs
    )

    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(1, cfg.vocab_size, size=int(n)))
               for n in rng.integers(8, 64, size=n_req)]

    # warm (compile all bucket programs — single AND grouped prefills —
    # plus the decode chunk; first-time XLA compiles are 20-60 s on this
    # stack and must not land inside the measured loop)
    eng.add_request(prompts[0], max_new_tokens=4)
    while not eng.step():
        pass
    for p in prompts:
        eng.add_request(p, max_new_tokens=2)
    while eng.has_work():
        eng.step()

    t0 = time.time()
    for p in prompts:
        eng.add_request(p, max_new_tokens=new_tok)
    done = 0
    steps = 0
    while done < n_req:
        done += len(eng.step())
        steps += 1
    wall = time.time() - t0
    total_tokens = n_req * new_tok
    raw = total_tokens / wall

    c1 = canary_tflops()
    pool = ((c0 + c1) / 2) / CANARY_REF_TFLOPS
    print(f"canary after:  {c1:.0f} TFLOPs", flush=True)
    # print the headline BEFORE the device-chunk timing below: its compile
    # can hang on the flaky remote-compile service, losing the whole run
    print(f"engine[{'paged' if paged else 'dense'},{kv}] bs={bs}: "
          f"raw {raw:.1f} tok/s, normalized {raw/pool:.1f} tok/s "
          f"(pool factor {pool:.2f}, n={total_tokens} tok, {steps} steps)",
          flush=True)

    # device-only decode chunk time at full batch (host overhead excluded).
    # Opt-in: the wrapping compile intermittently hangs the remote compile
    # helper, blocking the chip long past this process's timeout.
    dev_chunk = None
    if "--device-only" not in sys.argv:
        return
    try:
        cache = eng.cache
        toks = jnp.zeros((bs,), jnp.int32)
        pos = jnp.full((bs,), max_len // 2, jnp.int32)
        from bitsandbytes_tpu.serving.engine import _decode_chunk
        leaves, treedef = jax.tree_util.tree_flatten(cache)

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

        dev_chunk = device_loop_time(step, (toks, *leaves), iters=5)
    except Exception as e:
        print("device-chunk timing failed:", str(e)[:160])

    if dev_chunk is not None:
        per_step_wall = wall / steps
        print(f"  device decode chunk: {dev_chunk*1e3:.1f} ms/chunk "
              f"({bs*eng.steps_per_sync/dev_chunk:.1f} tok/s device-only); "
              f"host+sync overhead {per_step_wall*1e3 - dev_chunk*1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
