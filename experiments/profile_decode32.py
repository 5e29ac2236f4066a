"""Decompose the full-model bs=32 NF4 decode step (VERDICT r2 item 1's
done-bar: decode_benchmark --full bs=32 >= 660 tok/s, i.e. <= 48.6 ms for
32 layers + head).

Times, all at bs=32 on the real chip, within one process:
  - one quantized layer's decode forward (cache_len 256, pos 128)
  - the layer's 4 fused matmuls alone (same weights)
  - head cost: final norm + bf16 lm_head [128256,4096] + argmax
  - embed lookup

32*layer + head + embed should reproduce the full-model step time; the
gap between layer and sum-of-matmuls is attention/norm/rotary/cache
overhead to hunt down.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.utils.benchmark import device_loop_time
import bitsandbytes_tpu as bnb

print("backend:", jax.default_backend(), flush=True)
BS = 32
CACHE_LEN = 256
POS = 128

cfg = L.LlamaConfig.llama3_8b(num_layers=1)
p1 = L.init_params(jax.random.PRNGKey(0), cfg)
qp = L.quantize_params_4bit(
    {"layers": p1["layers"], "embed": p1["embed"], "final_norm": p1["final_norm"],
     "lm_head": p1["lm_head"]},
    quant_type="nf4", blocksize=64, fuse=True,
)
jax.block_until_ready(jax.tree_util.tree_leaves(qp))

a_can = jnp.asarray(np.random.default_rng(0).standard_normal((4096, 4096)), jnp.bfloat16)
sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a_can,), iters=10)
print(f"canary: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)", flush=True)

# --- full 1-layer decode step (includes embed + head) ---
cache = L.init_kv_cache(cfg, BS, CACHE_LEN)
tok = jnp.zeros((BS,), jnp.int32)

def step(p, tok, k, v):
    logits, c = L.decode_step(p, tok, cfg, L.KVCache(k, v), POS)
    return jnp.argmax(logits, -1).astype(jnp.int32), c.k, c.v

s_step = device_loop_time(step, (tok, cache.k, cache.v), iters=10, const_args=(qp,))
print(f"1-layer decode_step (embed+layer+head): {s_step*1e3:8.3f} ms", flush=True)

# --- head alone: final_norm + lm_head + argmax on a hidden state ---
h = jnp.asarray(np.random.default_rng(1).standard_normal((BS, 1, 4096)), jnp.bfloat16)

def head(fn_w, lm_w, h):
    hn = L._rmsnorm(h, fn_w, cfg.rms_eps)
    logits = jnp.dot(hn.reshape(BS, -1), lm_w.T, preferred_element_type=jnp.float32)
    return jnp.argmax(logits, -1).astype(jnp.int32)

s_head = device_loop_time(
    head, (h,), iters=10, const_args=(qp["final_norm"], qp["lm_head"])
)
print(f"head (norm+lm_head+argmax):             {s_head*1e3:8.3f} ms", flush=True)

# --- embed lookup ---
def emb(e, tok):
    return jnp.take(e, tok, axis=0)

s_emb = device_loop_time(emb, (tok,), const_args=(qp["embed"],), iters=10)
print(f"embed lookup:                           {s_emb*1e3:8.3f} ms", flush=True)

# --- the 4 fused matmuls of one layer, M=32 ---
lyr = qp["layers"][0]
x = jnp.asarray(np.random.default_rng(2).standard_normal((BS, 4096)), jnp.bfloat16)
xg = jnp.asarray(np.random.default_rng(3).standard_normal((BS, 14336)), jnp.bfloat16)

names = [("wqkv", x), ("wo", x), ("gate_up", x), ("down", xg)]
tot = 0.0
for nm, a in names:
    qt = lyr[nm] if nm in lyr else None
    if qt is None:
        print(f"  ({nm} missing; keys={list(lyr.keys())})")
        continue
    f = lambda a, qt=qt: bnb.matmul_4bit(a, qt.data, qt.state)
    s = device_loop_time(f, (a,), iters=20)
    tot += s
    print(f"  matmul {nm:8s}: {s*1e6:8.1f} us", flush=True)
print(f"sum of 4 matmuls:                       {tot*1e3:8.3f} ms", flush=True)

layer_overhead = s_step - s_head - s_emb - tot
print(f"layer overhead (attn+norms+rotary+kv):  {layer_overhead*1e3:8.3f} ms", flush=True)
est32 = 32 * (s_step - s_head - s_emb) + s_head + s_emb
print(f"est. 32-layer step: {est32*1e3:.2f} ms -> {BS/est32:.1f} tok/s", flush=True)
