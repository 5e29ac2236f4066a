"""Driver-grade QLoRA train-step medians (BASELINE.json config #4 class).

The README's historical "22-28k tok/s (shared-pool load swings)" was an
ad-hoc window; this gives the train step the same treatment as the decode
and serving benchmarks: hoist-proof on-device loop timing
(`device_loop_time` — wall-clocking dispatch loops is meaningless on this
tunneled runtime), medians of 3 interleaved passes bracketed by a
bf16-matmul canary, written to ``benchmarking/TRAIN.json`` which
``bench.py`` folds into its JSON line.

Geometry: 4-layer Llama-3-8B (hidden 4096 / ffn 14336 / GQA 32:8), NF4
fused base + rank-16 LoRA + 8-bit AdamW — one full forward+backward+
optimizer-update per step at bs=4 x seq 512, lm_head/softmax chunked
(token_chunk=512) as a long-context user would run it.

Run on the chip: python benchmarking/train_benchmark.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bitsandbytes_tpu import optim
from bitsandbytes_tpu.models import llama as L
from bitsandbytes_tpu.utils.benchmark import device_loop_time

OUT_PATH = os.path.join(os.path.dirname(__file__), "TRAIN.json")
PASSES = 3


def canary_us():
    x = jnp.ones((512, 4096), jnp.bfloat16)
    w = jnp.ones((4096, 4096), jnp.bfloat16)
    return device_loop_time(lambda a, b: (a @ b).astype(jnp.bfloat16), (x, w), iters=20) * 1e6


def main():
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu:
        cfg = L.LlamaConfig.llama3_8b(num_layers=4)
        bs, seq, iters, rank = 4, 512, 5, 16
    else:  # smoke mode
        cfg = L.LlamaConfig.tiny()
        bs, seq, iters, rank = 2, 32, 2, 4

    params = L.init_params(jax.random.PRNGKey(0), cfg)
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
    del params

    lora = L.add_lora(jax.random.PRNGKey(1), cfg, rank=rank)
    optimizer = optim.adamw8bit(2e-4)
    opt_state = optimizer.init(lora)
    ids = jax.random.randint(jax.random.PRNGKey(2), (bs, seq + 1), 0, cfg.vocab_size)

    def step(qparams, lora, opt_state, ids):
        loss, new_lora, new_state = L.lora_train_step(
            qparams, lora, opt_state, ids, cfg, optimizer, token_chunk=512
        )
        # the loop harness perturbs args and reads back the first leaf;
        # returning the updated adapters keeps the whole step live
        return (loss, *jax.tree_util.tree_leaves((new_lora, new_state)))

    tok_s, canaries = [], []
    for _ in range(PASSES):
        canaries.append(canary_us())
        sec = device_loop_time(
            step,
            (lora, opt_state, ids),
            iters=iters,
            const_args=(qparams,),
        )
        tok_s.append(bs * seq / sec)
        print(f"  qlora train: {tok_s[-1]:8.0f} tok/s  ({sec*1e3:.1f} ms/step)", flush=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    result = {
        "qlora_nf4_adamw8bit": {
            "geometry": (
                f"{cfg.num_layers}-layer h{cfg.hidden_size}/f{cfg.intermediate_size}, "
                f"bs{bs} x {seq}, rank {rank}"
            ),
            "tok_s": {
                "median": round(med(tok_s), 1),
                "min": round(min(tok_s), 1),
                "max": round(max(tok_s), 1),
                "n": len(tok_s),
            },
            "canary_us": [round(c, 1) for c in canaries],
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
    }
    print("TRAIN_JSON: " + json.dumps(result), flush=True)
    out = {}
    if os.path.exists(OUT_PATH):
        try:
            out = json.load(open(OUT_PATH))
        except Exception:
            out = {}
    out.update(result)
    json.dump(out, open(OUT_PATH, "w"), indent=1)


if __name__ == "__main__":
    main()
