"""Flash-cached serving perf: VERDICT r2 item 3 done-criteria.

  (a) decode with max_len=8192 runs on-chip (previously the [B,H,T,S]
      scores + wholesale int8 dequant capped context);
  (b) int8-KV decode step FASTER than bf16-KV at S >= 2048 (previously
      slower: paid full-cache dequant on top of the read).

Times one decode_step of the 4-layer Llama-3-8B geometry at several cache
depths, bf16 vs int8 KV.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.utils.benchmark import device_loop_time

print("backend:", jax.default_backend(), flush=True)

cfg = L.LlamaConfig.llama3_8b(num_layers=4)
params = L.init_params(jax.random.PRNGKey(0), cfg)
jax.block_until_ready(params)

B = 8
rng = np.random.default_rng(0)

a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a,), iters=10)
print(f"canary 4096^3 bf16 matmul: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)")

for S in (2048, 4096, 8192):
    row = {}
    for kvd in ("bf16", "int8"):
        try:
            cache = L.init_kv_cache(cfg, B, S, kv_dtype=kvd)
            cache = jax.tree_util.tree_map(
                lambda x: x if x.dtype != jnp.int8 else jnp.ones_like(x), cache
            )
            tok = jnp.zeros((B,), jnp.int32)
            pos = S - 2  # deep in the cache: worst-case read

            def step(params, tok, *leaves):
                cache_t = jax.tree_util.tree_unflatten(treedef, leaves)
                logits, nc = L.decode_step(params, tok, cfg, cache_t, pos)
                return (jnp.argmax(logits, -1).astype(jnp.int32),) + tuple(
                    jax.tree_util.tree_leaves(nc)
                )

            leaves, treedef = jax.tree_util.tree_flatten(cache)
            sec = device_loop_time(
                step, (tok, *leaves), iters=10, const_args=(params,)
            )
            row[kvd] = sec
            print(f"S={S:5d} {kvd:5s}: {sec*1e3:7.3f} ms/step  ({B/sec:7.1f} tok/s)", flush=True)
        except Exception as e:
            print(f"S={S} {kvd} FAILED: {str(e)[:200]}", flush=True)
    if "bf16" in row and "int8" in row:
        print(f"S={S:5d} int8/bf16 speed ratio: {row['bf16']/row['int8']:.3f}x "
              f"({'int8 faster' if row['int8'] < row['bf16'] else 'int8 SLOWER'})", flush=True)
