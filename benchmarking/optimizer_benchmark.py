"""8-bit vs 32-bit optimizer step timing (reference
benchmarking/optimizer_benchmark.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import optax

from bitsandbytes_tpu import optim
from bitsandbytes_tpu.utils.benchmark import device_loop_time


def main():
    n = 16 * 1024 * 1024
    p = {"w": jax.random.normal(jax.random.PRNGKey(0), (n,))}
    g = {"w": 0.01 * jax.random.normal(jax.random.PRNGKey(1), (n,))}
    for name in ("adam32bit", "adam8bit", "lion8bit"):
        opt = getattr(optim, name)(1e-3)
        st = opt.init(p)

        def step(g, p, st):
            u, st2 = opt.update(g, st, p)
            return optax.apply_updates(p, u), st2

        s = device_loop_time(step, (g, p, st), iters=10)
        print(f"{name:10s}: {s*1e3:8.3f} ms / {n/1e6:.0f}M params")


if __name__ == "__main__":
    main()
