"""Phase attribution for the int8 decode path's 0.654 SoL (VERDICT r5 item 3).

Decomposes one decode-shape linear (M=16, K=4096, N=14336 — the llama3-8b
gate-proj geometry bench.py times inside the full decode step).

RESIDENCY TRAP (first version of this probe): a single 56 MB int8 weight
fits in v5e VMEM, so a repeat-loop over ONE weight measured cache-resident
throughput (dot8 "851 GB/s" > the 819 GB/s HBM spec).  Every arm now
streams EIGHT distinct weight copies per call (458 MB int8 / 917 MB bf16 —
cannot be co-resident), and the reported per-matmul time is t_call/8.

Arms (all reading the same stacked W8):

  stream   read all W bytes + trivial row-sum          -> achievable int8 BW
  dot8     int8 x int8 -> int32 dot_general             (the igemmlt analog)
  dot8ep   + f32 dequant epilogue -> bf16               (the shipped op)
  rowq     + activation row-quant from bf16             (the full shipped path)
  dotbf    SAME geometry, bf16 weights (2x bytes)       -> the bf16 reference
  dot8bf   int8 W converted to bf16 IN-graph, bf16 MXU dot + epilogue
           (numerics: products exact in f32, but f32 accumulation over
           K=4096 can round where int32 cannot — probe-only)

Run: python experiments/probe_int8_sol.py
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
NW = 8  # distinct weight copies streamed per call


def _f32sum(outs):
    acc = outs[0].astype(jnp.float32)
    for o in outs[1:]:
        acc = acc + o.astype(jnp.float32)
    return acc


@jax.jit
def arm_stream(W8, SCB, A, Aq, rs):
    # must consume a PERTURBED arg (SCB) or the whole body is loop-invariant
    # w.r.t. the const weights and hoists out of the timing loop
    return _f32sum([
        jnp.sum(W8[k].astype(jnp.int32), axis=1).astype(jnp.float32) * SCB
        for k in range(NW)
    ])


@jax.jit
def arm_dot8(W8, SCB, A, Aq, rs):
    return _f32sum([
        jax.lax.dot_general(Aq, W8[k], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
        for k in range(NW)
    ])


@jax.jit
def arm_dot8ep(W8, SCB, A, Aq, rs):
    return _f32sum([
        int8_scaled_mm(Aq, W8[k], rs, SCB, dtype=jnp.bfloat16) for k in range(NW)
    ])


@jax.jit
def arm_rowq(W8, SCB, A, Aq, rs):
    outs = []
    for k in range(NW):
        q, stats, _ = int8_vectorwise_quant(A)
        outs.append(int8_scaled_mm(q, W8[k], stats, SCB, dtype=jnp.bfloat16))
    return _f32sum(outs)


@jax.jit
def arm_dotbf(W8bf, A):
    return _f32sum([
        jax.lax.dot_general(A, W8bf[k], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for k in range(NW)
    ])


@jax.jit
def arm_dot8bf(W8, SCB, A, Aq, rs):
    outs = []
    for k in range(NW):
        o = jax.lax.dot_general(
            Aq.astype(jnp.bfloat16), W8[k].astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        outs.append(o * (rs[:, None] * SCB[None, :]) * (1.0 / (127.0 * 127.0)))
    return _f32sum(outs)


def main():
    print(f"backend: {jax.default_backend()}  M={M} K={K} N={N} NW={NW}", flush=True)

    @jax.jit
    def gen():
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        W8 = jax.random.randint(ks[0], (NW, N, K), -127, 128, jnp.int32).astype(jnp.int8)
        SCB = jax.random.uniform(ks[1], (N,), jnp.float32) + 0.5
        A = jax.random.normal(ks[2], (M, K), jnp.bfloat16)
        Aq = jax.random.randint(ks[3], (M, K), -127, 128, jnp.int32).astype(jnp.int8)
        rs = jax.random.uniform(ks[4], (M,), jnp.float32) + 0.5
        W8bf = jax.random.normal(ks[5], (NW, N, K), jnp.bfloat16)
        return W8, SCB, A, Aq, rs, W8bf

    W8, SCB, A, Aq, rs, W8bf = jax.block_until_ready(gen())

    if os.environ.get("I8_SKIP_CANARY") != "1":
        a = jnp.asarray(np.random.default_rng(0).standard_normal((4096, 4096)), jnp.bfloat16)
        sec = device_loop_time(lambda a: jnp.tanh(a @ a), (a,), iters=10)
        print(f"canary: {sec*1e6:.0f} us ({2*4096**3/sec/1e12:.0f} TFLOPs)", flush=True)

    arms = {
        "stream": (arm_stream, (SCB, A, Aq, rs)),
        "dot8": (arm_dot8, (SCB, A, Aq, rs)),
        "dot8ep": (arm_dot8ep, (SCB, A, Aq, rs)),
        "rowq": (arm_rowq, (SCB, A, Aq, rs)),
        "dotbf": (arm_dotbf, (A,)),
        "dot8bf": (arm_dot8bf, (SCB, A, Aq, rs)),
    }
    res = {}
    iters = 10
    for cyc in range(3):
        for name, (fn, args) in arms.items():
            wt = W8bf if name == "dotbf" else W8
            t = device_loop_time(fn, args, iters=iters, const_args=(wt,)) / NW
            res.setdefault(name, []).append(t)
        print(
            f"cycle {cyc}: "
            + "  ".join(f"{k} {v[-1]*1e6:7.1f}us" for k, v in res.items()),
            flush=True,
        )

    print("\nmedians (per matmul):")
    wb = N * K  # int8 weight bytes
    for k, v in res.items():
        t = float(np.median(v))
        byts = 2 * wb if k == "dotbf" else wb
        print(f"  {k:7s} {t*1e6:8.1f} us   {byts/t/1e9:6.0f} GB/s effective")


if __name__ == "__main__":
    main()
