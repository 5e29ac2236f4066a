"""Phase attribution for the int8 decode path's 0.654 SoL (VERDICT r5 item 3).

Decomposes one decode-shape linear (M=16, K=4096, N=14336 — the llama3-8b
gate-proj geometry bench.py times inside the full decode step) into arms
that read the SAME int8 weight buffer:

  stream   read W int8 + trivial row-sum              -> achievable int8 BW
  dot8     int8 x int8 -> int32 dot_general            (the igemmlt analog)
  dot8ep   + f32 dequant epilogue -> bf16              (the shipped op)
  rowq     + activation row-quant from bf16            (the full shipped path)
  dotbf    SAME geometry, bf16 weights (2x bytes)      -> the bf16 reference
  dot8bf   int8 W converted to bf16 IN-graph, bf16 MXU dot + epilogue
           (numerics: products exact in f32, but f32 accumulation over
           K=4096 can round where int32 cannot — probe-only unless it wins
           big and the parity budget allows)

All arms time with the hoist-proof device loop, interleaved over 3 cycles
with a canary.  Run: python experiments/probe_int8_sol.py
"""
import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bitsandbytes_tpu.functional.int8 import (
    int8_scaled_mm,
    int8_vectorwise_quant,
)
from bitsandbytes_tpu.utils.benchmark import device_loop_time

M = int(os.environ.get("I8_M", 16))
K = int(os.environ.get("I8_K", 4096))
N = int(os.environ.get("I8_N", 14336))


@jax.jit
def arm_stream(W, SCB, A, Aq, rs):
    # touch every W byte, minimal ALU: sum int8 rows into int32
    return jnp.sum(W.astype(jnp.int32), axis=1)


@jax.jit
def arm_dot8(W, SCB, A, Aq, rs):
    return jax.lax.dot_general(
        Aq, W, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )


@jax.jit
def arm_dot8ep(W, SCB, A, Aq, rs):
    return int8_scaled_mm(Aq, W, rs, SCB, dtype=jnp.bfloat16)


@jax.jit
def arm_rowq(W, SCB, A, Aq, rs):
    q, stats, _ = int8_vectorwise_quant(A)
    return int8_scaled_mm(q, W, stats, SCB, dtype=jnp.bfloat16)


@jax.jit
def arm_dotbf(Wbf, A):
    return jax.lax.dot_general(
        A, Wbf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


@jax.jit
def arm_dot8bf(W, SCB, A, Aq, rs):
    Wb = W.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        Aq.astype(jnp.bfloat16), Wb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (out * (rs[:, None] * SCB[None, :]) * (1.0 / (127.0 * 127.0))).astype(
        jnp.bfloat16
    )


def main():
    print(f"backend: {jax.default_backend()}  M={M} K={K} N={N}", flush=True)
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
    SCB = jnp.asarray(rng.random(N) + 0.5, jnp.float32)
    A = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    Aq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    rs = jnp.asarray(rng.random(M) + 0.5, jnp.float32)
    Wbf = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)

    if os.environ.get("I8_SKIP_CANARY") != "1":
        a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
        sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a,), iters=10)
        print(f"canary: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)", flush=True)

    arms = {
        "stream": (arm_stream, (W, SCB, A, Aq, rs)),
        "dot8": (arm_dot8, (W, SCB, A, Aq, rs)),
        "dot8ep": (arm_dot8ep, (W, SCB, A, Aq, rs)),
        "rowq": (arm_rowq, (W, SCB, A, Aq, rs)),
        "dotbf": (arm_dotbf, (Wbf, A)),
        "dot8bf": (arm_dot8bf, (W, SCB, A, Aq, rs)),
    }
    res = {}
    iters = 30
    for cyc in range(3):
        for name, (fn, args) in arms.items():
            t = device_loop_time(fn, args, iters=iters)
            res.setdefault(name, []).append(t)
        print(
            f"cycle {cyc}: "
            + "  ".join(f"{k} {v[-1]*1e6:7.1f}us" for k, v in res.items()),
            flush=True,
        )

    print("\nmedians:")
    wb = N * K  # int8 weight bytes
    for k, v in res.items():
        t = float(np.median(v))
        byts = 2 * wb if k == "dotbf" else wb
        print(f"  {k:7s} {t*1e6:8.1f} us   {byts/t/1e9:6.0f} GB/s effective")


if __name__ == "__main__":
    main()
