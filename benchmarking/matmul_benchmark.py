"""Fused dequant+GEMM vs dequantize-then-matmul (reference
benchmarking/matmul_benchmark.py), with %SoL reporting."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import jax.numpy as jnp

from bitsandbytes_tpu.functional.fourbit import dequantize_4bit, quantize_4bit
from bitsandbytes_tpu.functional.gemm import gemm_4bit
from bitsandbytes_tpu.utils.benchmark import device_loop_time, sol_fraction


def main():
    for M in (1, 16, 256):
        N, K, bs = 14336, 4096, 64
        A = jax.random.normal(jax.random.PRNGKey(0), (M, K)).astype(jnp.bfloat16)
        W = jax.random.normal(jax.random.PRNGKey(1), (N, K), jnp.float32) * 0.02
        packed, qs = quantize_4bit(W, blocksize=bs, layout="2d")
        nbytes = M * K * 2 + N * K // 2 + N * (K // bs) * 4 + M * N * 4

        fused = lambda a: gemm_4bit(a, packed, qs)
        s1 = device_loop_time(fused, (A,), iters=50)

        def dq_mm(a):
            Wd = dequantize_4bit(packed, quant_state=qs).astype(a.dtype)
            return jax.lax.dot_general(a, Wd, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        s2 = device_loop_time(dq_mm, (A,), iters=50)
        print(
            f"M={M:4d}: fused {s1*1e3:7.3f} ms ({100*sol_fraction(s1, nbytes):3.0f}% SoL)"
            f"  dequant+mm {s2*1e3:7.3f} ms  speedup {s2/s1:.2f}x"
        )


if __name__ == "__main__":
    main()
