"""QLoRA finetuning: frozen NF4 base + LoRA adapters + 8-bit AdamW
(reference examples/cpu/cpu_training.py, BASELINE.json config #4)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import jax.numpy as jnp

from bitsandbytes_tpu import optim
from bitsandbytes_tpu.models import llama as L


def main():
    cfg = L.LlamaConfig.tiny()
    params = L.quantize_params_4bit(L.init_params(jax.random.PRNGKey(0), cfg))
    lora = L.add_lora(jax.random.PRNGKey(1), cfg, rank=8)
    optimizer = optim.paged_adamw8bit(2e-4)
    opt_state = optimizer.init(lora)

    step = jax.jit(lambda p, lo, st, ids: L.lora_train_step(p, lo, st, ids, cfg, optimizer))
    for i in range(10):
        ids = jax.random.randint(jax.random.PRNGKey(i), (4, 33), 0, cfg.vocab_size)
        loss, lora, opt_state = step(params, lora, opt_state, ids)
        print(f"step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
