"""Continuous-batching engine throughput: device-phase primary metric.

The end-to-end wall clock of the engine loop on this environment is
dominated by the axon tunnel RTT (host<->chip round trips per sync), which
says nothing about the framework — so the PRIMARY metric here is the
steady-state device decode-chunk time (hoist-proof on-device loop,
medians of 3 interleaved passes with spread), and the RTT-bound
end-to-end tok/s is SECONDARY (also median-of-3 windows).  The shared
v5e pool swings ~2x across processes/minutes, so every window is
bracketed by a bf16-matmul canary and the normalized number divides by
pool_factor = canary TFLOPs / CANARY_REF_TFLOPS (captured once on an
idle chip).

Prints one JSON line (SERVING_JSON: {...}) and writes/merges
benchmarking/SERVING.json keyed by engine mode.

Usage: python benchmarking/serving_benchmark.py [--kv int8] [--paged]
                                                [--no-device-phase]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "--cpu" in sys.argv:  # smoke mode: force the host backend before jax init
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

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

    # end-to-end windows (RTT-bound secondary metric): median of 3, each
    # bracketed by a canary
    total_tokens = n_req * new_tok
    raws, walls, steps_per_window = [], [], []
    cans = [c0]
    for w in range(3):
        t0 = time.time()
        for p in prompts:
            eng.add_request(p, max_new_tokens=new_tok)
        done = 0
        steps = 0
        while done < n_req:
            done += len(eng.step())
            steps += 1
        wall = time.time() - t0
        raws.append(total_tokens / wall)
        walls.append(wall)
        steps_per_window.append(steps)
        cans.append(canary_tflops())
        print(f"window {w}: raw {raws[-1]:.1f} tok/s ({steps} steps); "
              f"canary {cans[-1]:.0f} TFLOPs", flush=True)

    pool = float(np.median(cans)) / CANARY_REF_TFLOPS
    raw_med = float(np.median(raws))
    mode = f"{'paged' if paged else 'dense'},{kv}"
    # print the e2e summary BEFORE the device-chunk timing below: its
    # compile can hang on the flaky remote-compile service
    print(f"engine[{mode}] bs={bs}: raw median {raw_med:.1f} "
          f"(min {min(raws):.1f}, max {max(raws):.1f}) tok/s, "
          f"normalized {raw_med/pool:.1f} tok/s (pool {pool:.2f})", flush=True)

    # PRIMARY: device-only decode chunk time at full batch (host/RTT
    # overhead excluded) — median of 3 repeats of the hoist-proof loop.
    dev_chunks = []
    if "--no-device-phase" not in sys.argv:
        try:
            cache = eng.cache
            toks = jnp.zeros((bs,), jnp.int32)
            pos = jnp.full((bs,), max_len // 2, jnp.int32)
            from bitsandbytes_tpu.serving.engine import _decode_chunk
            leaves, treedef = jax.tree_util.tree_flatten(cache)

            # params MUST ride through const_args (jit arguments), not
            # closure capture — a closed-over quantized tree gets baked as
            # multi-GB program constants and wedges the remote compile.
            # pool stays a closed-over Python int: it is a STATIC argument
            # of _decode_chunk (a tracer there breaks the jit-cache
            # static-equality check).
            def step(params, toks, *leaves):
                c = jax.tree_util.tree_unflatten(treedef, leaves)
                out, c2 = _decode_chunk(
                    params, c, toks, pos,
                    jnp.zeros((bs,), jnp.float32), jnp.ones((bs,), jnp.float32),
                    jax.random.PRNGKey(0),
                    cfg=cfg, S=eng.steps_per_sync, sampling=False,
                    pool=eng.sampling_pool,
                )
                return (out[-1],) + tuple(jax.tree_util.tree_leaves(c2))

            for _ in range(3):
                dev_chunks.append(device_loop_time(
                    step, (toks, *leaves), iters=5, const_args=(eng.params,),
                ))
        except Exception:
            import traceback

            print("device-chunk timing failed:")
            print(traceback.format_exc()[-2000:])

    result = {
        "mode": mode,
        "bs": bs,
        "steps_per_sync": eng.steps_per_sync,
        "e2e_tok_s": {"median": round(raw_med, 1), "min": round(min(raws), 1),
                      "max": round(max(raws), 1), "n": len(raws)},
        "e2e_tok_s_normalized": round(raw_med / pool, 1),
        "pool_factor": round(pool, 3),
        "canary_tflops": [round(c, 1) for c in cans],
        "note": "device_chunk_ms is the primary metric; e2e is tunnel-RTT-bound",
    }
    if dev_chunks:
        dmed = float(np.median(dev_chunks))
        result["device_chunk_ms"] = {
            "median": round(dmed * 1e3, 2),
            "min": round(min(dev_chunks) * 1e3, 2),
            "max": round(max(dev_chunks) * 1e3, 2),
            "n": len(dev_chunks),
        }
        result["device_tok_s"] = round(bs * eng.steps_per_sync / dmed, 1)
        # per-window wall/steps pairs, then the median — step counts can
        # differ across windows (admission timing under pool load), so
        # dividing the median wall by the LAST window's steps would mix
        # quantities from different windows
        per_step_wall = float(np.median([w / s for w, s in zip(walls, steps_per_window)]))
        result["host_rtt_overhead_ms_per_step"] = round(
            per_step_wall * 1e3 - dmed * 1e3, 1
        )
        print(f"  device decode chunk: {dmed*1e3:.1f} ms/chunk median "
              f"(min {min(dev_chunks)*1e3:.1f}, max {max(dev_chunks)*1e3:.1f}; "
              f"{result['device_tok_s']:.1f} tok/s device-only); "
              f"host+RTT overhead {result['host_rtt_overhead_ms_per_step']} ms/step",
              flush=True)

    import json
    print("SERVING_JSON: " + json.dumps(result), flush=True)
    out_path = os.path.join(os.path.dirname(__file__), "SERVING.json")
    try:
        with open(out_path) as f:
            all_results = json.load(f)
    except Exception:
        all_results = {}
    all_results[mode + f",bs{bs}"] = result
    with open(out_path, "w") as f:
        json.dump(all_results, f, indent=1)


if __name__ == "__main__":
    main()
