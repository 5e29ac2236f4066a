"""Chunked cross-entropy: long-context QLoRA step time + peak memory.

At Llama-3's 128k vocab the dense loss materializes [B*T, V] f32 logits
(4 GB at bs=4 x T=2048) plus log-softmax residuals; token_chunk recomputes
each chunk's lm_head in the backward instead.  Times one jitted
lora_train_step at several T, dense vs chunked, and reports device memory
stats where the runtime exposes them.  Run on the real chip.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")
from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.utils.benchmark import device_loop_time

print("backend:", jax.default_backend(), flush=True)
on_tpu = jax.default_backend() not in ("cpu", "gpu")

cfg = L.LlamaConfig.llama3_8b(num_layers=4) if on_tpu else L.LlamaConfig.tiny()
params = L.init_params(jax.random.PRNGKey(0), cfg)
qparams = L.quantize_params_4bit(params, quant_type="nf4", fuse=True)
jax.block_until_ready(jax.tree_util.tree_leaves(qparams))
del params

lora = L.add_lora(jax.random.PRNGKey(1), cfg, rank=16)
opt = optax.adam(1e-4)
ost = opt.init(lora)

CASES = [(4, 512), (2, 2048), (1, 8192)] if on_tpu else [(2, 32)]

for B, T in CASES:
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, T + 1), 0, cfg.vocab_size)
    for chunk in (None, 512):
        label = f"bs={B} T={T} chunk={chunk}"
        try:
            def step(p, lo, o, i, _chunk=chunk):
                loss, lo2, o2 = L.lora_train_step(p, lo, o, i, cfg, opt, token_chunk=_chunk)
                # single scalar depending on loss AND every updated-adapter
                # leaf: device_loop_time anchors only the first output leaf,
                # so anything not feeding it would be dead-code-eliminated
                dep = loss
                for leaf in jax.tree_util.tree_leaves(lo2):
                    dep = dep + leaf.astype(jnp.float32).sum()
                return dep

            sec = device_loop_time(step, (qparams, lora, ost, ids), iters=3)
            tok_s = B * T / sec
            print(f"{label}: {sec*1e3:.1f} ms/step, {tok_s:.0f} tok/s", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {str(e)[:200]}", flush=True)
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            print(f"  peak_bytes_in_use: {stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB", flush=True)
    except Exception:
        pass
